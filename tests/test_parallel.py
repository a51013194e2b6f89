"""Tests for parallel/sharded.py on the 8-virtual-device CPU mesh
(SURVEY.md §4 TPU test strategy: multi-chip logic without a pod)."""

import unittest

import numpy as np

import jax
import jax.numpy as jnp

from photo_search_engine_tpu.ops.quantized import quantize_rows
from photo_search_engine_tpu.parallel import (
    ShardedEmbeddingStore,
    make_mesh,
    sharded_exact_search,
    sharded_int8_search,
    sharded_kmeans_step,
)


def _plant(corpus, query, slots, alphas, rng):
    """Rows at controlled similarity to ``query`` (descending, separated)."""
    d = corpus.shape[1]
    for slot, alpha in zip(slots, alphas):
        r = rng.normal(size=d)
        r -= (r @ query) * query
        r /= np.linalg.norm(r)
        corpus[slot] = alpha * query + np.sqrt(1.0 - alpha * alpha) * r


class ShardedSearchTest(unittest.TestCase):
    def setUp(self):
        self.mesh = make_mesh()
        self.n_dev = len(jax.devices())
        self.assertEqual(self.n_dev, 8)  # conftest forces 8 CPU devices
        rng = np.random.default_rng(0)
        self.rows = 8 * 64
        self.dim = 32
        self.corpus = rng.normal(size=(self.rows, self.dim)).astype(np.float32)
        self.queries = rng.normal(size=(5, self.dim)).astype(np.float32)

    def _oracle(self, k, counts=None, metric="ip"):
        corpus = self.corpus.copy()
        if counts is not None:
            shard_rows = self.rows // self.n_dev
            mask = np.zeros(self.rows, bool)
            for shard, count in enumerate(counts):
                mask[shard * shard_rows : shard * shard_rows + count] = True
        else:
            mask = np.ones(self.rows, bool)
        scores = self.queries @ corpus.T
        if metric == "l2":
            qn = (self.queries**2).sum(1, keepdims=True)
            cn = (corpus**2).sum(1)[None, :]
            scores = -(qn + cn - 2 * scores)
        scores = np.where(mask[None, :], scores, -np.inf)
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(scores, idx, axis=1)
        if metric == "l2":
            vals = -vals
        return vals, idx

    def test_matches_global_oracle(self):
        vals, idx = sharded_exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 10, self.mesh
        )
        ref_vals, ref_idx = self._oracle(10)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-4)

    def test_per_shard_counts_mask_tails(self):
        counts = np.array([64, 30, 64, 0, 10, 64, 5, 64], np.int32)
        vals, idx = sharded_exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 10, self.mesh,
            counts=counts,
        )
        ref_vals, ref_idx = self._oracle(10, counts=counts)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_l2_metric(self):
        vals, idx = sharded_exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 5, self.mesh,
            metric="l2",
        )
        ref_vals, ref_idx = self._oracle(5, metric="l2")
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-4)

    def test_uneven_rows_rejected(self):
        with self.assertRaises(ValueError):
            sharded_exact_search(
                jnp.asarray(self.corpus[:100]), jnp.asarray(self.queries), 5, self.mesh
            )


class ShardedInt8Test(unittest.TestCase):
    """int8-scan + exact-rescore over the mesh (planted gaps → exact)."""

    K = 10

    def setUp(self):
        self.mesh = make_mesh()
        rng = np.random.default_rng(1)
        self.rows, self.dim = 8 * 64, 32
        corpus = rng.normal(size=(self.rows, self.dim)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        self.queries = rng.normal(size=(4, self.dim)).astype(np.float32)
        self.queries /= np.linalg.norm(self.queries, axis=1, keepdims=True)
        alphas = 0.95 - 0.03 * np.arange(self.K)
        free = rng.permutation(self.rows)
        for qi, q in enumerate(self.queries):
            _plant(corpus, q, free[qi * self.K : (qi + 1) * self.K], alphas, rng)
        self.corpus = corpus
        self.q8, self.scales = quantize_rows(jnp.asarray(corpus))

    def test_matches_sharded_exact(self):
        ref_v, ref_i = sharded_exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), self.K, self.mesh
        )
        vals, idx = sharded_int8_search(
            self.q8, self.scales, jnp.asarray(self.corpus),
            jnp.asarray(self.queries), self.K, self.mesh,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_v), rtol=1e-4, atol=1e-4
        )

    def test_l2_metric(self):
        ref_v, ref_i = sharded_exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 5, self.mesh,
            metric="l2",
        )
        vals, idx = sharded_int8_search(
            self.q8, self.scales, jnp.asarray(self.corpus),
            jnp.asarray(self.queries), 5, self.mesh, metric="l2",
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_v), rtol=1e-3, atol=1e-4
        )

    def test_counts_mask_shard_tails(self):
        counts = np.array([64, 64, 64, 64, 64, 64, 64, 0], np.int32)
        vals, idx = sharded_int8_search(
            self.q8, self.scales, jnp.asarray(self.corpus),
            jnp.asarray(self.queries), 5, self.mesh, counts=counts,
        )
        idx = np.asarray(idx)
        self.assertTrue((idx[idx >= 0] < 7 * 64).all())

    def test_store_quantized_roundtrip(self):
        store = ShardedEmbeddingStore(self.dim, self.mesh, quantized=True)
        store.append(self.corpus)
        d_ref, i_ref = store.search(self.queries, self.K)
        d_q, i_q = store.search(self.queries, self.K, impl="int8")
        np.testing.assert_array_equal(i_q, i_ref)
        np.testing.assert_allclose(d_q, d_ref, rtol=1e-4, atol=1e-4)

    def test_int8_requires_quantized_store(self):
        store = ShardedEmbeddingStore(self.dim, self.mesh)
        store.append(self.corpus[:16])
        with self.assertRaises(ValueError):
            store.search(self.queries, 3, impl="int8")


class ShardedKmeansTest(unittest.TestCase):
    def test_one_step_moves_centroids_toward_clusters(self):
        mesh = make_mesh()
        rng = np.random.default_rng(1)
        # two well-separated blobs, 8-shardable row count
        blob_a = rng.normal(loc=+5.0, size=(128, 16)).astype(np.float32)
        blob_b = rng.normal(loc=-5.0, size=(128, 16)).astype(np.float32)
        corpus = np.concatenate([blob_a, blob_b])
        rng.shuffle(corpus)
        centroids = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
        for _ in range(5):
            centroids, counts = sharded_kmeans_step(
                jnp.asarray(corpus), centroids, mesh
            )
        counts = np.asarray(counts)
        self.assertEqual(counts.sum(), 256)
        centers = np.sort(np.asarray(centroids).mean(axis=1))
        np.testing.assert_allclose(centers, [-5.0, 5.0], atol=0.5)

    def test_empty_centroid_keeps_position(self):
        mesh = make_mesh()
        corpus = np.ones((64, 8), np.float32)
        centroids = jnp.asarray(
            np.stack([np.ones(8, np.float32), np.full(8, 100.0, np.float32)])
        )
        new_cents, counts = sharded_kmeans_step(jnp.asarray(corpus), centroids, mesh)
        self.assertEqual(int(np.asarray(counts)[1]), 0)
        np.testing.assert_allclose(np.asarray(new_cents)[1], 100.0)


class ShardedStoreTest(unittest.TestCase):
    def test_append_and_search_roundtrip(self):
        store = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
        rng = np.random.default_rng(2)
        vectors = rng.normal(size=(20, 16)).astype(np.float32)
        ids = store.append(vectors)
        self.assertEqual(store.count, 20)
        self.assertEqual(len(set(ids.tolist())), 20)
        dists, found = store.search(vectors[3], 1)
        np.testing.assert_allclose(
            store.reconstruct(int(found[0][0])), vectors[3], rtol=1e-5
        )

    def test_vectorized_append_matches_greedy_reference(self):
        # the water-fill + lexsort placement must equal the per-row greedy
        # (argmin count, ties to lowest shard id) it replaced
        store = ShardedEmbeddingStore(4, make_mesh(), metric="ip", shard_block=8)
        rng = np.random.default_rng(11)
        # uneven starting counts via staggered appends
        for batch in (3, 1, 13, 6):
            vectors = rng.normal(size=(batch, 4)).astype(np.float32)
            counts = store.counts.astype(np.int64).copy()
            expect = []
            for _ in range(batch):
                target = int(np.argmin(counts))
                expect.append(target * store._ID_STRIDE + int(counts[target]))
                counts[target] += 1
            ids = store.append(vectors)
            self.assertEqual(ids.tolist(), expect)
        # reconstruct must return the exact row appended under each id
        probe = rng.normal(size=(5, 4)).astype(np.float32)
        ids = store.append(probe)
        for row, gid in zip(probe, ids):
            np.testing.assert_allclose(store.reconstruct(int(gid)), row, rtol=1e-6)

    def test_append_syncs_incrementally_without_full_reupload(self):
        from photo_search_engine_tpu.parallel import sharded as sharded_mod

        store = ShardedEmbeddingStore(
            8, make_mesh(), metric="ip", shard_block=8, quantized=True
        )
        rng = np.random.default_rng(12)
        first = rng.normal(size=(16, 8)).astype(np.float32)
        store.append(first)
        store.search(first[0], 1)  # full first sync
        self.assertIsNotNone(store._synced_counts)
        calls = []
        real_updater = sharded_mod._row_updater

        def spy(mesh, ndim):
            fn = real_updater(mesh, ndim)

            def wrapped(*args):
                calls.append(ndim)
                return fn(*args)

            return wrapped

        orig_put = jax.device_put
        put_rows = []

        def counting_put(x, *a, **kw):
            if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
                put_rows.append(int(np.asarray(x.shape)[0]))
            return orig_put(x, *a, **kw)

        second = rng.normal(size=(8, 8)).astype(np.float32)
        store.append(second)
        try:
            sharded_mod._row_updater = spy
            jax.device_put = counting_put
            _, idx = store.search(second[2], 1)
        finally:
            sharded_mod._row_updater = real_updater
            jax.device_put = orig_put
        # the donated per-shard updater ran (f32 + int8 + scales)...
        self.assertIn(2, calls)
        self.assertIn(1, calls)
        # ...and nothing the size of the full 64-row capacity was uploaded
        capacity_rows = store.n_shards * store._shard_capacity_hint()
        self.assertTrue(all(r < capacity_rows for r in put_rows), put_rows)
        np.testing.assert_allclose(
            store.reconstruct(int(idx[0][0])), second[2], rtol=1e-5
        )
        # int8 path stays consistent after the incremental sync
        d8, i8 = store.search(second[:3], 2, impl="int8")
        np.testing.assert_allclose(
            store.reconstruct(int(i8[0][0])), second[0], rtol=1e-5
        )

    def test_incremental_appends_keep_searchable(self):
        store = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
        rng = np.random.default_rng(3)
        first = rng.normal(size=(10, 16)).astype(np.float32)
        store.append(first)
        _, idx1 = store.search(first[0], 1)
        second = rng.normal(size=(30, 16)).astype(np.float32)
        store.append(second)
        self.assertEqual(store.count, 40)
        _, idx2 = store.search(second[7], 1)
        np.testing.assert_allclose(
            store.reconstruct(int(idx2[0][0])), second[7], rtol=1e-5
        )


if __name__ == "__main__":
    unittest.main()


class ShardedCheckpointTest(unittest.TestCase):
    def test_save_load_roundtrip(self):
        import tempfile

        rng = np.random.default_rng(4)
        store = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
        vectors = rng.normal(size=(20, 16)).astype(np.float32)
        store.append(vectors)
        with tempfile.TemporaryDirectory() as tmp:
            store.save(tmp)
            fresh = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
            self.assertTrue(fresh.load(tmp))
            self.assertEqual(fresh.count, 20)
            _, idx = fresh.search(vectors[5], 1)
            np.testing.assert_allclose(
                fresh.reconstruct(int(idx[0][0])), vectors[5], rtol=1e-5
            )

    def test_load_missing_returns_false(self):
        import tempfile

        store = ShardedEmbeddingStore(16, make_mesh())
        with tempfile.TemporaryDirectory() as tmp:
            self.assertFalse(store.load(tmp))

    def test_orbax_roundtrip(self):
        import tempfile

        rng = np.random.default_rng(6)
        store = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
        vectors = rng.normal(size=(20, 16)).astype(np.float32)
        store.append(vectors)
        with tempfile.TemporaryDirectory() as tmp:
            store.save(tmp, format="orbax")
            fresh = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
            self.assertTrue(fresh.load(tmp))
            self.assertEqual(fresh.count, 20)
            _, idx = fresh.search(vectors[5], 1)
            np.testing.assert_allclose(
                fresh.reconstruct(int(idx[0][0])), vectors[5], rtol=1e-5
            )

    def test_orbax_reshard_on_mesh_change(self):
        import tempfile

        rng = np.random.default_rng(7)
        store = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
        vectors = rng.normal(size=(24, 16)).astype(np.float32)
        store.append(vectors)
        with tempfile.TemporaryDirectory() as tmp:
            store.save(tmp, format="orbax")
            smaller = ShardedEmbeddingStore(16, make_mesh(4), metric="ip", shard_block=8)
            with self.assertRaises(ValueError):
                smaller.load(tmp)  # silent re-shard would invalidate ids
            self.assertTrue(smaller.load(tmp, allow_reshard=True))
            self.assertEqual(smaller.count, 24)
            _, idx = smaller.search(vectors[3], 1)
            np.testing.assert_allclose(
                smaller.reconstruct(int(idx[0][0])), vectors[3], rtol=1e-5
            )

    def test_quantized_store_survives_save_load(self):
        import tempfile

        rng = np.random.default_rng(8)
        store = ShardedEmbeddingStore(
            16, make_mesh(), metric="ip", shard_block=8, quantized=True
        )
        vectors = rng.normal(size=(20, 16)).astype(np.float32)
        store.append(vectors)
        d_ref, i_ref = store.search(vectors[:3], 3, impl="int8")
        with tempfile.TemporaryDirectory() as tmp:
            store.save(tmp)
            fresh = ShardedEmbeddingStore(
                16, make_mesh(), metric="ip", shard_block=8, quantized=True
            )
            self.assertTrue(fresh.load(tmp))
            d2, i2 = fresh.search(vectors[:3], 3, impl="int8")
            np.testing.assert_array_equal(i2, i_ref)

    def test_unknown_format_rejected(self):
        import tempfile

        store = ShardedEmbeddingStore(16, make_mesh())
        store.append(np.eye(16, dtype=np.float32))
        with tempfile.TemporaryDirectory() as tmp:
            with self.assertRaises(ValueError):
                store.save(tmp, format="pickle")

    def test_reshard_on_mesh_change(self):
        import tempfile

        rng = np.random.default_rng(5)
        store = ShardedEmbeddingStore(16, make_mesh(), metric="ip", shard_block=8)
        vectors = rng.normal(size=(24, 16)).astype(np.float32)
        store.append(vectors)
        with tempfile.TemporaryDirectory() as tmp:
            store.save(tmp)
            smaller = ShardedEmbeddingStore(
                16, make_mesh(4), metric="ip", shard_block=8
            )
            with self.assertRaises(ValueError):
                smaller.load(tmp)  # silent re-shard would invalidate ids
            self.assertTrue(smaller.load(tmp, allow_reshard=True))
            self.assertEqual(smaller.count, 24)
            _, idx = smaller.search(vectors[3], 1)
            np.testing.assert_allclose(
                smaller.reconstruct(int(idx[0][0])), vectors[3], rtol=1e-5
            )


class ShardedApproxLargeKTest(unittest.TestCase):
    """The sharded mirror of the store-level ApproxTopK large-candidate
    route (round 4): off-TPU approx_max_k computes exactly, so every
    CPU-mesh result must match the exact oracle."""

    def test_impl_approx_matches_oracle(self):
        from photo_search_engine_tpu.ops.topk import exact_search_oracle

        rng = np.random.default_rng(11)
        mesh = make_mesh(8)
        corpus = rng.normal(size=(8 * 256, 32)).astype(np.float32)
        queries = rng.normal(size=(4, 32)).astype(np.float32)
        counts = np.full(8, 250, np.int32)  # 6 padding rows per shard
        flat_count_mask = np.concatenate(
            [np.arange(256) < 250 for _ in range(8)]
        )
        for metric in ("ip", "l2"):
            va, ia = sharded_exact_search(
                jnp.asarray(corpus), jnp.asarray(queries), 200, mesh,
                counts=counts, metric=metric, impl="approx",
            )
            # oracle over the live rows only (order within the flat corpus)
            vo, io = exact_search_oracle(
                jnp.asarray(corpus), jnp.asarray(queries), 200,
                mask=jnp.asarray(flat_count_mask.astype(np.int32)),
                metric=metric,
            )
            for row in range(queries.shape[0]):
                self.assertEqual(
                    set(np.asarray(ia)[row].tolist()),
                    set(np.asarray(io)[row].tolist()),
                    metric,
                )
            np.testing.assert_allclose(
                np.sort(np.asarray(va), 1), np.sort(np.asarray(vo), 1),
                rtol=1e-5, atol=1e-5,
            )

    def test_store_routes_and_fails_soft(self):
        from photo_search_engine_tpu.ops import topk as topk_ops

        rng = np.random.default_rng(12)
        store = ShardedEmbeddingStore(24, make_mesh(8), metric="ip",
                                      shard_block=8)
        rows = rng.normal(size=(600, 24)).astype(np.float32)
        store.append(rows)
        query = rows[17]
        v_exact, i_exact = store.search(query, 100)

        calls = []
        orig_gate = topk_ops._use_approx_large_k
        orig_approx = topk_ops.approx_search_large_k

        def wrapped(*args, **kwargs):
            calls.append(1)
            return orig_approx(*args, **kwargs)

        topk_ops._use_approx_large_k = lambda n: True
        topk_ops.approx_search_large_k = wrapped
        try:
            v_apx, i_apx = store.search(query, 100)
        finally:
            topk_ops.approx_search_large_k = orig_approx
        self.assertTrue(calls, "the approx route was never taken")
        np.testing.assert_array_equal(np.asarray(i_apx), np.asarray(i_exact))

        # fail-soft: a broken approx path degrades to the exact sort and
        # latches off for subsequent searches
        def boom(*args, **kwargs):
            raise RuntimeError("approx unavailable")

        topk_ops.approx_search_large_k = boom
        try:
            v_fb, i_fb = store.search(query, 100)
        finally:
            topk_ops.approx_search_large_k = orig_approx
            topk_ops._use_approx_large_k = orig_gate
        np.testing.assert_array_equal(np.asarray(i_fb), np.asarray(i_exact))
        self.assertTrue(store._approx_large_k_broken)
