"""Tests for models/ivf.py — IVF layout, k-means, recall vs exact oracle."""

import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.models.ivf import (
    IVFIndex,
    balanced_layout,
    train_kmeans,
)
from photo_search_engine_tpu.ops import exact_search_oracle


class KmeansTest(unittest.TestCase):
    def test_centroids_recover_blobs(self):
        rng = np.random.default_rng(0)
        blobs = np.concatenate(
            [rng.normal(loc=c, scale=0.3, size=(200, 8)) for c in (-4.0, 0.0, 4.0)]
        ).astype(np.float32)
        centroids = train_kmeans(blobs, nlist=3, iters=15, seed=1)
        means = np.sort(centroids.mean(axis=1))
        np.testing.assert_allclose(means, [-4.0, 0.0, 4.0], atol=0.3)

    def test_nlist_clamped_to_n(self):
        data = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
        centroids = train_kmeans(data, nlist=100, iters=2)
        self.assertEqual(centroids.shape[0], 5)


class LayoutTest(unittest.TestCase):
    def test_balanced_layout_respects_capacity(self):
        rng = np.random.default_rng(1)
        # all rows prefer cluster 0 -> must spill
        ranked = np.zeros((100, 3), np.int64)
        ranked[:, 1] = 1
        ranked[:, 2] = 2
        cluster_of_row, perm, capacity = balanced_layout(ranked, nlist=4, slack=1.2)
        self.assertEqual((perm >= 0).sum(), 100)
        fills = [
            (cluster_of_row == c).sum() for c in range(4)
        ]
        self.assertTrue(all(f <= capacity for f in fills))
        # every original row appears exactly once
        live = perm[perm >= 0]
        self.assertEqual(len(set(live.tolist())), 100)
        del rng


class IVFSearchTest(unittest.TestCase):
    def setUp(self):
        rng = np.random.default_rng(2)
        self.corpus = rng.normal(size=(2000, 64)).astype(np.float32)
        self.corpus /= np.linalg.norm(self.corpus, axis=1, keepdims=True)
        self.queries = self.corpus[rng.choice(2000, size=8, replace=False)] + \
            rng.normal(scale=0.05, size=(8, 64)).astype(np.float32)
        self.queries /= np.linalg.norm(self.queries, axis=1, keepdims=True)
        self.index = IVFIndex.build(self.corpus, nlist=32, seed=0)

    def _recall(self, found, k):
        exact_v, exact_i = exact_search_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), k
        )
        exact_i = np.asarray(exact_i)
        hits = sum(
            len(set(found[q].tolist()) & set(exact_i[q].tolist()))
            for q in range(found.shape[0])
        )
        return hits / (found.shape[0] * k)

    def test_full_probe_matches_exact(self):
        """nprobe = nlist -> identical result set to exact search."""
        vals, idx = self.index.search(self.queries, 10, nprobe=32, impl="lax")
        self.assertEqual(self._recall(idx, 10), 1.0)

    def test_partial_probe_recall_uniform_data(self):
        # uniform random vectors are the worst case for IVF; half the lists
        # must still recover most of the exact top-10
        vals, idx = self.index.search(self.queries, 10, nprobe=16, impl="lax")
        self.assertGreaterEqual(self._recall(idx, 10), 0.8)

    def test_partial_probe_recall_clustered_data(self):
        rng = np.random.default_rng(5)
        centers = rng.normal(size=(20, 64)).astype(np.float32) * 3
        corpus = np.concatenate(
            [c + rng.normal(scale=0.2, size=(100, 64)).astype(np.float32) for c in centers]
        )
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = corpus[rng.choice(2000, 8, replace=False)]
        index = IVFIndex.build(corpus, nlist=32, seed=0)
        vals, idx = index.search(queries, 10, nprobe=4, impl="lax")
        exact_v, exact_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(queries), 10
        )
        exact_i = np.asarray(exact_i)
        hits = sum(
            len(set(idx[q].tolist()) & set(exact_i[q].tolist())) for q in range(8)
        )
        # clustered data: 4/32 lists recover nearly everything
        self.assertGreaterEqual(hits / 80.0, 0.9)

    def test_pallas_matches_lax_path(self):
        v_lax, i_lax = self.index.search(self.queries, 10, nprobe=8, impl="lax")
        v_pl, i_pl = self.index.search(self.queries, 10, nprobe=8, impl="pallas")
        np.testing.assert_array_equal(np.sort(i_lax, 1), np.sort(i_pl, 1))
        np.testing.assert_allclose(
            np.sort(v_lax, 1), np.sort(v_pl, 1), rtol=1e-4, atol=1e-4
        )

    def test_returns_original_row_ids(self):
        vals, idx = self.index.search(self.corpus[42], 1, nprobe=8, impl="lax")
        self.assertEqual(int(idx[0][0]), 42)

    def test_k_clamped_to_live_rows(self):
        tiny = IVFIndex.build(self.corpus[:6], nlist=2, seed=0)
        vals, idx = tiny.search(self.queries[:1], 50, nprobe=2, impl="lax")
        self.assertEqual(idx.shape[1], 6)

    def test_l2_pallas_matches_lax_unnormalized(self):
        # regression: the pallas path merged raw inner products for l2 —
        # wrong order once row norms differ (3% id agreement observed)
        rng = np.random.default_rng(9)
        corpus = (
            rng.normal(size=(4000, 64)).astype(np.float32)
            * rng.uniform(0.5, 3.0, size=(4000, 1)).astype(np.float32)
        )
        queries = corpus[rng.choice(4000, 6, replace=False)] + 0.01 * rng.normal(
            size=(6, 64)
        ).astype(np.float32)
        index = IVFIndex.build(corpus, nlist=16, metric="l2", seed=0)
        v_lax, i_lax = index.search(queries, 5, nprobe=16, impl="lax")
        v_pl, i_pl = index.search(queries, 5, nprobe=16, impl="pallas")
        np.testing.assert_array_equal(np.sort(i_lax, 1), np.sort(i_pl, 1))
        np.testing.assert_allclose(
            np.sort(v_lax, 1), np.sort(v_pl, 1), rtol=1e-4, atol=1e-4
        )

    def test_l2_metric(self):
        index = IVFIndex.build(self.corpus, nlist=16, metric="l2", seed=0)
        vals, idx = index.search(self.queries, 5, nprobe=16, impl="lax")
        exact_v, exact_i = exact_search_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 5, metric="l2"
        )
        np.testing.assert_array_equal(idx, np.asarray(exact_i))
        # l2 distances ascending
        self.assertTrue((np.diff(vals, axis=1) >= -1e-5).all())


class IVFQuantizedTest(unittest.TestCase):
    """int8 list scan + exact rescore inside the IVF stage-2 path."""

    def setUp(self):
        rng = np.random.default_rng(6)
        self.corpus = rng.normal(size=(2000, 64)).astype(np.float32)
        self.corpus /= np.linalg.norm(self.corpus, axis=1, keepdims=True)
        self.queries = self.corpus[rng.choice(2000, 8, replace=False)]
        self.index = IVFIndex.build(self.corpus, nlist=32, seed=0, quantized=True)

    def test_full_probe_matches_plain_lax(self):
        # full probe: the only approximation left is int8 nomination; the
        # rescored top-10 matches the full-precision path on self-queries
        v_lax, i_lax = self.index.search(self.queries, 10, nprobe=32, impl="lax")
        v_q, i_q = self.index.search(self.queries, 10, nprobe=32, impl="pallas")
        overlap = np.mean(
            [len(set(i_q[r].tolist()) & set(i_lax[r].tolist())) / 10
             for r in range(8)]
        )
        self.assertGreaterEqual(overlap, 0.9)
        # the self-hit survives quantized nomination exactly
        np.testing.assert_array_equal(i_q[:, 0], i_lax[:, 0])
        # rescored values are full-precision (match lax where ids agree)
        for r in range(8):
            if i_q[r, 0] == i_lax[r, 0]:
                self.assertAlmostEqual(float(v_q[r, 0]), float(v_lax[r, 0]), places=4)

    def test_l2_quantized(self):
        rng = np.random.default_rng(7)
        corpus = self.corpus * rng.uniform(0.5, 2.0, size=(2000, 1)).astype(np.float32)
        index = IVFIndex.build(corpus, nlist=16, metric="l2", seed=0, quantized=True)
        queries = corpus[:4]
        v_lax, i_lax = index.search(queries, 5, nprobe=16, impl="lax")
        v_q, i_q = index.search(queries, 5, nprobe=16, impl="pallas")
        np.testing.assert_array_equal(i_q[:, 0], i_lax[:, 0])
        self.assertTrue((np.diff(v_q, axis=1) >= -1e-5).all())  # ascending

    def test_large_k_routes_to_lax(self):
        v, i = self.index.search(self.queries[:2], 80, nprobe=32, impl="pallas")
        v_lax, i_lax = self.index.search(self.queries[:2], 80, nprobe=32, impl="lax")
        np.testing.assert_array_equal(i, i_lax)

    def test_feed_pinned_at_construction(self):
        # round-5 review finding: the kernel used to read INT8_FEED at
        # trace time, so env toggles after the first compile were
        # silently ignored.  The feed is now pinned at __init__ and
        # threaded as a jit-static arg — an env flip after construction
        # must neither change the pin nor the results.
        import os

        self.assertIn(self.index.int8_feed, ("int8", "bf16"))
        pinned = self.index.int8_feed
        v0, i0 = self.index.search(self.queries[:4], 5, nprobe=32, impl="pallas")
        other = "bf16" if pinned == "int8" else "int8"
        saved = os.environ.get("INT8_FEED")
        os.environ["INT8_FEED"] = other
        try:
            self.assertEqual(self.index.int8_feed, pinned)
            v1, i1 = self.index.search(
                self.queries[:4], 5, nprobe=32, impl="pallas"
            )
            np.testing.assert_array_equal(i0, i1)
            # a NEW index constructed under the flipped env picks it up
            fresh = IVFIndex.build(
                self.corpus, nlist=32, seed=0, quantized=True
            )
            self.assertEqual(fresh.int8_feed, other)
            # both feeds dequantize the same int8 values: rescored top-1
            # agrees on self-queries
            _, i_fresh = fresh.search(
                self.queries[:4], 5, nprobe=32, impl="pallas"
            )
            np.testing.assert_array_equal(i_fresh[:, 0], i0[:, 0])
        finally:
            if saved is None:
                os.environ.pop("INT8_FEED", None)
            else:
                os.environ["INT8_FEED"] = saved

    def test_append_invalidates_shadow(self):
        self.index.search(self.queries[:2], 5, nprobe=32, impl="pallas")
        self.assertIsNotNone(self.index._corpus_i8)
        rng = np.random.default_rng(8)
        new = rng.normal(size=(10, 64)).astype(np.float32)
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        self.assertTrue(self.index.append(new, np.arange(2000, 2010)))
        self.assertIsNone(self.index._corpus_i8)
        v, i = self.index.search(new[:4], 1, nprobe=32, impl="pallas")
        np.testing.assert_array_equal(i[:, 0], np.arange(2000, 2004))


class BuildOnDeviceTest(unittest.TestCase):
    """build_on_device constructs via cls.__new__ (bypassing __init__),
    so every attribute __init__ pins must be pinned there too — a missed
    one (round-5 review: int8_feed) breaks bench.py's IVF branch and
    recall_eval with an AttributeError the constructor-path tests never
    see."""

    def setUp(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        corpus = rng.normal(size=(1024, 64)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        self.corpus = corpus
        self.index = IVFIndex.build_on_device(jnp.asarray(corpus), nlist=8, seed=0)

    def test_has_constructor_pinned_attributes(self):
        self.assertIn(self.index.int8_feed, ("int8", "bf16"))
        self.assertFalse(self.index.quantized)

    def test_device_search_fn_runs_and_matches_exact(self):
        import jax.numpy as jnp

        fn = self.index.device_search_fn(k=5, nprobe=8, batch=4)
        queries = self.corpus[:4]
        vals, slots = fn(jnp.asarray(queries))
        # full probe: slot ids map through perm to the exact neighbors
        rows = self.index.perm[np.asarray(slots)]
        oracle = np.argsort(-(queries @ self.corpus.T), axis=1)[:, :5]
        np.testing.assert_array_equal(np.sort(rows, 1), np.sort(oracle, 1))

    def test_quantized_device_build_searches(self):
        import jax.numpy as jnp

        index = IVFIndex.build_on_device(
            jnp.asarray(self.corpus), nlist=8, seed=0, quantized=True
        )
        v, i = index.search(self.corpus[:4], 5, nprobe=8, impl="pallas")
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(4))
        # the exact bench path: quantized device_search_fn end-to-end
        fn = index.device_search_fn(k=5, nprobe=8, batch=4)
        vals, slots = fn(jnp.asarray(self.corpus[:4]))
        rows = index.perm[np.asarray(slots)]
        np.testing.assert_array_equal(rows[:, 0], np.arange(4))


class IVFAppendTest(unittest.TestCase):
    """Incremental appends (FAISS IndexIVF.add analogue)."""

    def setUp(self):
        rng = np.random.default_rng(3)
        self.corpus = rng.normal(size=(1000, 64)).astype(np.float32)
        self.corpus /= np.linalg.norm(self.corpus, axis=1, keepdims=True)
        self.index = IVFIndex.build(self.corpus, nlist=16, seed=0)
        self.rng = rng

    def test_appended_rows_are_found(self):
        new = self.rng.normal(size=(50, 64)).astype(np.float32)
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        ok = self.index.append(new, np.arange(1000, 1050))
        self.assertTrue(ok)
        # full probe: every appended row is its own nearest neighbor
        vals, idx = self.index.search(new, 1, nprobe=16, impl="lax")
        np.testing.assert_array_equal(idx[:, 0], np.arange(1000, 1050))

    def test_old_rows_survive_append(self):
        new = self.rng.normal(size=(20, 64)).astype(np.float32)
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        self.index.append(new, np.arange(1000, 1020))
        vals, idx = self.index.search(self.corpus[:8], 1, nprobe=16, impl="lax")
        np.testing.assert_array_equal(idx[:, 0], np.arange(8))

    def test_append_respects_capacity_and_signals_full(self):
        free = int(self.index.nlist * self.index.capacity - self.index._fill.sum())
        too_many = self.rng.normal(size=(free + 1, 64)).astype(np.float32)
        self.assertFalse(self.index.append(too_many, np.arange(free + 1)))
        # a batch that fits succeeds and never overfills any list
        fits = self.rng.normal(size=(free, 64)).astype(np.float32)
        self.assertTrue(self.index.append(fits, np.arange(2000, 2000 + free)))
        self.assertTrue((self.index._fill <= self.index.capacity).all())

    def test_empty_append_is_noop(self):
        self.assertTrue(self.index.append(np.zeros((0, 64), np.float32), np.zeros(0)))

    def test_pallas_matches_lax_after_append(self):
        new = self.rng.normal(size=(30, 64)).astype(np.float32)
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        self.index.append(new, np.arange(1000, 1030))
        queries = np.concatenate([self.corpus[:4], new[:4]])
        v_lax, i_lax = self.index.search(queries, 10, nprobe=8, impl="lax")
        v_pl, i_pl = self.index.search(queries, 10, nprobe=8, impl="pallas")
        np.testing.assert_array_equal(np.sort(i_lax, 1), np.sort(i_pl, 1))


if __name__ == "__main__":
    unittest.main()


class TuneNprobeTest(unittest.TestCase):
    def _clustered(self, rng, n=2000, d=64, centers=20):
        c = rng.normal(size=(centers, d)).astype(np.float32) * 3
        corpus = np.concatenate(
            [x + rng.normal(scale=0.2, size=(n // centers, d)).astype(np.float32)
             for x in c]
        )
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        return corpus

    def test_reaches_target_on_clustered_data(self):
        rng = np.random.default_rng(7)
        corpus = self._clustered(rng)
        queries = corpus[rng.choice(2000, 16, replace=False)]
        index = IVFIndex.build(corpus, nlist=32, seed=0)
        nprobe, achieved = index.tune_nprobe(queries, k=10, target_recall=0.98)
        self.assertGreaterEqual(achieved, 0.98)
        self.assertLess(nprobe, 32)  # clustered data: well under full probe
        # the tuned nprobe reproduces the measured recall
        _, oracle = index.search(queries, 10, nprobe=32)
        _, got = index.search(queries, 10, nprobe=nprobe)
        hits = sum(
            len(set(got[q].tolist()) & set(oracle[q].tolist()))
            for q in range(len(queries))
        )
        self.assertGreaterEqual(hits / (len(queries) * 10.0), 0.98)

    def test_caps_at_nlist_when_target_unreachable(self):
        rng = np.random.default_rng(8)
        corpus = rng.normal(size=(1000, 64)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = corpus[:8]
        index = IVFIndex.build(corpus, nlist=16, seed=0)
        nprobe, achieved = index.tune_nprobe(
            queries, k=10, target_recall=1.01  # unreachable on purpose
        )
        self.assertEqual(nprobe, 16)  # walked all the way to full probe
        self.assertGreaterEqual(achieved, 0.99)  # full probe == exact

    def test_respects_max_nprobe(self):
        rng = np.random.default_rng(9)
        corpus = rng.normal(size=(1000, 64)).astype(np.float32)
        queries = corpus[:4]
        index = IVFIndex.build(corpus, nlist=16, seed=0)
        nprobe, _ = index.tune_nprobe(
            queries, k=5, target_recall=1.01, max_nprobe=4
        )
        self.assertLessEqual(nprobe, 4)
