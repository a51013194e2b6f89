"""Tests for ops/quantized.py — int8 scan + exact rescore path.

Exact index equality with the oracle is only guaranteed when the gap
between the k-th and (k+1)-th true scores exceeds the int8 dot error
(the candidate pool is chosen by QUANTIZED ordering; the rescore makes
values/order exact but cannot recover a neighbor the pool missed).  So
exact-match tests PLANT neighbors at controlled, well-separated
similarities; distribution-shaped data (clustered / iid noise) gets
recall-threshold tests instead.
"""

import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.core.embedding_store import EmbeddingStore
from photo_search_engine_tpu.ops.quantized import (
    int8_search,
    quantize_rows,
)
from photo_search_engine_tpu.ops.topk import exact_search, exact_search_oracle


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _make_clustered(rng, n, d, n_centers=32, noise=0.05):
    centers = _normalize(rng.normal(size=(n_centers, d)))
    assign = rng.integers(0, n_centers, size=n)
    pts = centers[assign] + noise * rng.normal(size=(n, d))
    return _normalize(pts).astype(np.float32)


def _plant(corpus, query, slots, alphas, rng):
    """Overwrite ``corpus[slots]`` with rows of controlled similarity
    ``alphas`` to ``query`` (descending, well separated)."""
    d = corpus.shape[1]
    for slot, alpha in zip(slots, alphas):
        r = rng.normal(size=d)
        r -= (r @ query) * query
        r /= np.linalg.norm(r)
        corpus[slot] = alpha * query + np.sqrt(1.0 - alpha * alpha) * r


class QuantizeRowsTest(unittest.TestCase):
    def test_round_trip_error_bound(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 96)).astype(np.float32)
        q, scales = quantize_rows(jnp.asarray(x))
        recon = np.asarray(q, np.float32) * np.asarray(scales)[:, None]
        err = np.abs(recon - x)
        # symmetric absmax: per-element error <= scale/2 = absmax/254
        bound = np.abs(x).max(axis=1, keepdims=True) / 254.0 + 1e-7
        self.assertTrue((err <= bound).all())

    def test_zero_rows(self):
        x = np.zeros((4, 32), np.float32)
        q, scales = quantize_rows(jnp.asarray(x))
        self.assertTrue((np.asarray(q) == 0).all())
        self.assertTrue((np.asarray(scales) == 0).all())

    def test_extremes_hit_full_range(self):
        x = np.array([[1.0, -1.0, 0.5, 0.0]], np.float32)
        q, scales = quantize_rows(jnp.asarray(x))
        self.assertEqual(int(np.asarray(q)[0, 0]), 127)
        self.assertEqual(int(np.asarray(q)[0, 1]), -127)


class Int8SearchPlantedTest(unittest.TestCase):
    """Exact parity on controlled-gap data."""

    K = 10

    def setUp(self):
        self.rng = np.random.default_rng(1)
        n, d = 5000, 64
        self.corpus = _normalize(self.rng.normal(size=(n, d))).astype(np.float32)
        self.queries = _normalize(self.rng.normal(size=(4, d))).astype(np.float32)
        # similarities 0.95, 0.92, ... 0.68 — gaps 0.03 >> int8 dot error;
        # random background tops out well below 0.68 at this n/d
        alphas = 0.95 - 0.03 * np.arange(self.K)
        self.slots = {}
        free = self.rng.permutation(n)
        for qi, q in enumerate(self.queries):
            slots = free[qi * self.K : (qi + 1) * self.K]
            _plant(self.corpus, q, slots, alphas, self.rng)
            self.slots[qi] = slots
        self.q8, self.scales = quantize_rows(jnp.asarray(self.corpus))

    def _run(self, k=None, **kw):
        return int8_search(
            self.q8,
            self.scales,
            jnp.asarray(self.corpus),
            jnp.asarray(self.queries),
            self.K if k is None else k,
            **kw,
        )

    def test_matches_oracle_ip(self):
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), self.K, metric="ip"
        )
        vals, idx = self._run(metric="ip")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_v), rtol=1e-5, atol=1e-5
        )
        # and the planted rows are what both returned, in alpha order
        for qi in range(len(self.queries)):
            np.testing.assert_array_equal(np.asarray(idx)[qi], self.slots[qi])

    def test_matches_oracle_l2(self):
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), self.K, metric="l2"
        )
        vals, idx = self._run(metric="l2")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_v), rtol=1e-4, atol=1e-4
        )

    def test_count_excludes_tail(self):
        # fresh corpus planted only inside the count window
        count = 3000
        corpus = _normalize(self.rng.normal(size=(5000, 64))).astype(np.float32)
        alphas = 0.95 - 0.03 * np.arange(self.K)
        slots = {}
        free = self.rng.permutation(count)
        for qi, q in enumerate(self.queries):
            s = free[qi * self.K : (qi + 1) * self.K]
            _plant(corpus, q, s, alphas, self.rng)
            slots[qi] = s
        q8, scales = quantize_rows(jnp.asarray(corpus))
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(self.queries), self.K,
            metric="ip", count=count,
        )
        vals, idx = int8_search(
            q8, scales, jnp.asarray(corpus), jnp.asarray(self.queries),
            self.K, metric="ip", count=count,
        )
        idx = np.asarray(idx)
        self.assertTrue((idx < count).all())
        np.testing.assert_array_equal(idx, np.asarray(ref_i))

    def test_mask_excludes_rows(self):
        # fresh corpus, planted only on masked-in slots (multiples of 3)
        corpus = _normalize(self.rng.normal(size=(5000, 64))).astype(np.float32)
        mask = np.zeros(5000, np.int32)
        mask[::3] = 1
        alphas = 0.95 - 0.03 * np.arange(self.K)
        admissible = self.rng.permutation(np.arange(0, 5000, 3))
        for qi, q in enumerate(self.queries):
            _plant(corpus, q, admissible[qi * self.K : (qi + 1) * self.K],
                   alphas, self.rng)
        q8, scales = quantize_rows(jnp.asarray(corpus))
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(self.queries), self.K,
            metric="ip", mask=jnp.asarray(mask),
        )
        vals, idx = int8_search(
            q8, scales, jnp.asarray(corpus), jnp.asarray(self.queries),
            self.K, metric="ip", mask=jnp.asarray(mask),
        )
        idx = np.asarray(idx)
        self.assertTrue((idx[idx >= 0] % 3 == 0).all())
        np.testing.assert_array_equal(idx, np.asarray(ref_i))

    def test_empty_mask_yields_empty_slots(self):
        mask = np.zeros(5000, np.int32)
        vals, idx = self._run(metric="ip", mask=jnp.asarray(mask))
        self.assertTrue((np.asarray(idx) == -1).all())

    def test_large_k_falls_back_to_exact(self):
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 100, metric="ip"
        )
        vals, idx = self._run(k=100, metric="ip")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_small_corpus_explicit_kloc_pool_guard(self):
        # one 2048-row block with an EXPLICIT kloc=8 and k=60: the
        # nomination pool (1 block x 8) cannot cover k and the path must
        # fall back to exact
        rng = np.random.default_rng(31)
        corpus = _normalize(rng.normal(size=(1000, 64))).astype(np.float32)
        q8, scales = quantize_rows(jnp.asarray(corpus))
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(corpus[:2]), 60, metric="ip"
        )
        vals, idx = int8_search(
            q8, scales, jnp.asarray(corpus), jnp.asarray(corpus[:2]), 60,
            kloc=8,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_single_block_burst_k_above_16(self):
        # Regression (advisor round 1): a burst of 60 near-duplicates
        # inserted CONTIGUOUSLY — all inside one 2048-row corpus block —
        # with k=60.  The old kloc cap of 16 let each block nominate only
        # 16 rows, silently dropping 44 true neighbors; kloc now tracks k
        # up to 64 so the int8 path matches the oracle exactly.
        rng = np.random.default_rng(57)
        k = 60
        n, d = 5000, 64
        corpus = _normalize(rng.normal(size=(n, d))).astype(np.float32)
        query = _normalize(rng.normal(size=(1, d))).astype(np.float32)
        # well-separated alphas 0.98 .. 0.744, all in block 0 (rows 100-159)
        alphas = 0.98 - 0.004 * np.arange(k)
        slots = np.arange(100, 100 + k)
        _plant(corpus, query[0], slots, alphas, rng)
        q8, scales = quantize_rows(jnp.asarray(corpus))
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(query), k, metric="ip"
        )
        vals, idx = int8_search(
            q8, scales, jnp.asarray(corpus), jnp.asarray(query), k
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(idx)[0], slots)

    def test_single_query_vector(self):
        vals, idx = int8_search(
            self.q8,
            self.scales,
            jnp.asarray(self.corpus),
            jnp.asarray(self.queries[0]),
            5,
        )
        self.assertEqual(idx.shape, (1, 5))

    def test_empty_corpus(self):
        q8, scales = quantize_rows(jnp.zeros((0, 64), jnp.float32))
        vals, idx = int8_search(
            q8, scales, jnp.zeros((0, 64), jnp.float32),
            jnp.asarray(self.queries), 5,
        )
        self.assertEqual(idx.shape, (4, 0))


class Int8SearchRecallTest(unittest.TestCase):
    """Distribution-shaped data: recall thresholds, not exact equality."""

    def _recall(self, corpus, queries, k=10):
        q8, scales = quantize_rows(jnp.asarray(corpus))
        _, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(queries), k, metric="ip"
        )
        _, idx = int8_search(
            q8, scales, jnp.asarray(corpus), jnp.asarray(queries), k, metric="ip"
        )
        ref_i, idx = np.asarray(ref_i), np.asarray(idx)
        return np.mean(
            [len(set(idx[q]) & set(ref_i[q])) / k for q in range(len(idx))]
        )

    def test_iid_noise_recall(self):
        rng = np.random.default_rng(11)
        corpus = _normalize(rng.normal(size=(8000, 64))).astype(np.float32)
        queries = _normalize(rng.normal(size=(8, 64))).astype(np.float32)
        self.assertGreaterEqual(self._recall(corpus, queries), 0.9)

    def test_clustered_recall(self):
        rng = np.random.default_rng(12)
        corpus = _make_clustered(rng, 5000, 64)
        queries = _normalize(
            corpus[rng.choice(5000, 8, replace=False)]
            + 0.02 * rng.normal(size=(8, 64))
        ).astype(np.float32)
        self.assertGreaterEqual(self._recall(corpus, queries), 0.9)


class GroupedInt8Test(unittest.TestCase):
    """Per-query filtered int8 scan + exact rescore."""

    K = 8

    def setUp(self):
        rng = np.random.default_rng(21)
        n, d = 4000, 64
        self.corpus = _normalize(rng.normal(size=(n, d))).astype(np.float32)
        self.queries = _normalize(rng.normal(size=(6, d))).astype(np.float32)
        # predicates: all rows / even rows / rows 1000..1999
        table = np.zeros((3, n), np.int8)
        table[0, :] = 1
        table[1, ::2] = 1
        table[2, 1000:2000] = 1
        self.table = table
        self.ids = np.array([0, 1, 2, 0, 1, 2], np.int32)
        # plant separated neighbors per query at slots its predicate admits
        alphas = 0.95 - 0.03 * np.arange(self.K)
        admissible = {
            0: rng.permutation(n),
            1: rng.permutation(np.arange(0, n, 2)),
            2: rng.permutation(np.arange(1000, 2000)),
        }
        cursor = {0: 0, 1: 0, 2: 0}
        for qi, q in enumerate(self.queries):
            m = int(self.ids[qi])
            start = cursor[m]
            _plant(self.corpus, q, admissible[m][start : start + self.K],
                   alphas, rng)
            cursor[m] = start + self.K
        self.q8, self.scales = quantize_rows(jnp.asarray(self.corpus))

    def test_matches_grouped_oracle(self):
        from photo_search_engine_tpu.ops import grouped_int8_search
        from photo_search_engine_tpu.ops.grouped_mask import grouped_mask_oracle

        ref_v, ref_i = grouped_mask_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries),
            jnp.asarray(self.table), jnp.asarray(self.ids), self.K,
        )
        vals, idx = grouped_int8_search(
            self.q8, self.scales, jnp.asarray(self.corpus),
            jnp.asarray(self.queries), jnp.asarray(self.table),
            jnp.asarray(self.ids), self.K,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_v), rtol=1e-5, atol=1e-5
        )

    def test_each_query_respects_its_predicate(self):
        from photo_search_engine_tpu.ops import grouped_int8_search

        _, idx = grouped_int8_search(
            self.q8, self.scales, jnp.asarray(self.corpus),
            jnp.asarray(self.queries), jnp.asarray(self.table),
            jnp.asarray(self.ids), self.K,
        )
        idx = np.asarray(idx)
        for qi, mask_id in enumerate(self.ids):
            hits = idx[qi][idx[qi] >= 0]
            if mask_id == 1:
                self.assertTrue((hits % 2 == 0).all())
            elif mask_id == 2:
                self.assertTrue(((hits >= 1000) & (hits < 2000)).all())

    def test_empty_predicate_and_count(self):
        from photo_search_engine_tpu.ops import grouped_int8_search

        table = np.zeros((2, 4000), np.int8)
        table[0, :] = 1  # predicate 1 matches nothing
        ids = np.array([0, 1], np.int32)
        vals, idx = grouped_int8_search(
            self.q8, self.scales, jnp.asarray(self.corpus),
            jnp.asarray(self.queries[:2]), jnp.asarray(table),
            jnp.asarray(ids), 5, count=2000,
        )
        idx = np.asarray(idx)
        self.assertTrue((idx[0][idx[0] >= 0] < 2000).all())
        self.assertTrue((idx[1] == -1).all())

    def test_large_k_routes_to_oracle(self):
        from photo_search_engine_tpu.ops import grouped_int8_search
        from photo_search_engine_tpu.ops.grouped_mask import grouped_mask_oracle

        # k=100 exceeds the int8 cap; k=40 exceeds the nomination pool
        # (2 blocks × kloc 16 = 32) — both must fall back to the oracle
        for k in (100, 40):
            ref_v, ref_i = grouped_mask_oracle(
                jnp.asarray(self.corpus), jnp.asarray(self.queries),
                jnp.asarray(self.table), jnp.asarray(self.ids), k,
            )
            vals, idx = grouped_int8_search(
                self.q8, self.scales, jnp.asarray(self.corpus),
                jnp.asarray(self.queries), jnp.asarray(self.table),
                jnp.asarray(self.ids), k,
            )
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


class WideLaneFastPathTest(unittest.TestCase):
    """The packed-key extraction now carries 11 lane bits for bn=2048."""

    def test_pallas_fast_block2048(self):
        rng = np.random.default_rng(2)
        corpus = _normalize(rng.normal(size=(5000, 64))).astype(np.float32)
        queries = _normalize(rng.normal(size=(8, 64))).astype(np.float32)
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(queries), 10, metric="ip"
        )
        vals, idx = exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 10,
            metric="ip", impl="pallas_fast", block_n=2048,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_pallas_fast_non_pow2_block(self):
        # bn between 1024 and 2048 needs 11 lane bits but isn't a power
        # of two; the mask must still cover every lane id
        rng = np.random.default_rng(3)
        corpus = _normalize(rng.normal(size=(4000, 64))).astype(np.float32)
        queries = _normalize(rng.normal(size=(8, 64))).astype(np.float32)
        ref_v, ref_i = exact_search_oracle(
            jnp.asarray(corpus), jnp.asarray(queries), 10, metric="ip"
        )
        vals, idx = exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 10,
            metric="ip", impl="pallas_fast", block_n=1536,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))

    def test_oversized_block_rejected(self):
        from photo_search_engine_tpu.ops.topk import _extract_block_topk_fast

        with self.assertRaises(ValueError):
            _extract_block_topk_fast(
                jnp.zeros((8, 4096), jnp.float32), 0, 4, 128, 8, 4096
            )


class QuantizedEmbeddingStoreTest(unittest.TestCase):
    def test_int8_search_parity_and_incremental_append(self):
        rng = np.random.default_rng(3)
        data = _normalize(rng.normal(size=(700, 48))).astype(np.float32)
        # plant well-separated neighbors so exact parity is guaranteed
        queries = _normalize(rng.normal(size=(6, 48))).astype(np.float32)
        alphas = 0.95 - 0.03 * np.arange(10)
        free = rng.permutation(700)
        for qi, q in enumerate(queries):
            _plant(data, q, free[qi * 10 : (qi + 1) * 10], alphas, rng)
        store = EmbeddingStore(48, metric="cosine", quantized=True)
        store.append(data[:300])
        store.append(data[300:])  # crosses a growth boundary
        d_ref, i_ref = store.search(queries, 10, impl="lax")
        d_q, i_q = store.search(queries, 10, impl="int8")
        np.testing.assert_array_equal(i_q, i_ref)
        np.testing.assert_allclose(d_q, d_ref, rtol=1e-4, atol=1e-4)

    def test_int8_requires_quantized_store(self):
        store = EmbeddingStore(48)
        store.append(np.eye(48, dtype=np.float32)[:8])
        with self.assertRaises(ValueError):
            store.search(np.ones((1, 48), np.float32), 3, impl="int8")

    def test_masked_int8_search(self):
        rng = np.random.default_rng(4)
        data = _normalize(rng.normal(size=(400, 32))).astype(np.float32)
        store = EmbeddingStore(32, quantized=True)
        store.append(data)
        mask = np.zeros(400, np.int32)
        mask[:200] = 1
        _, idx = store.search(data[:4], 5, mask=mask, impl="int8")
        self.assertTrue((idx[idx >= 0] < 200).all())

    def test_clear_drops_shadow(self):
        store = EmbeddingStore(32, quantized=True)
        store.append(np.eye(32, dtype=np.float32))
        store.clear()
        self.assertIsNone(store._device_i8)
        store.append(np.eye(32, dtype=np.float32))
        _, idx = store.search(np.eye(32, dtype=np.float32)[:2], 1, impl="int8")
        np.testing.assert_array_equal(idx[:, 0], [0, 1])

    def test_bf16_store_with_int8_shadow(self):
        rng = np.random.default_rng(5)
        data = _normalize(rng.normal(size=(300, 32))).astype(np.float32)
        store = EmbeddingStore(32, store_dtype="bfloat16", quantized=True)
        store.append(data)
        d_ref, i_ref = store.search(data[:4], 5, impl="lax")
        d_q, i_q = store.search(data[:4], 5, impl="int8")
        np.testing.assert_array_equal(i_q, i_ref)


if __name__ == "__main__":
    unittest.main()


class CapacityAlignmentTest(unittest.TestCase):
    def test_quantized_capacity_divides_both_blocks(self):
        # review regression: alignment must be the LCM of the two kernel
        # block sizes, not the max — otherwise the exact path re-pads (a
        # whole-corpus copy) whenever block_rows does not divide _i8_block
        import numpy as np

        from photo_search_engine_tpu.core.embedding_store import EmbeddingStore

        for dim in (1536, 3072, 768):
            store = EmbeddingStore(dim, quantized=True)
            store.append(np.random.default_rng(0).normal(size=(10, dim)))
            self.assertEqual(store.capacity % store.block_rows, 0, dim)
            self.assertEqual(store.capacity % store._i8_block, 0, dim)


class ResolveStoreQuantizedTest(unittest.TestCase):
    """STORE_QUANTIZED=auto: the serving default resolves per backend
    (mirrors resolve_store_dtype — verdict r4 item 1a)."""

    def test_auto_follows_backend(self):
        from photo_search_engine_tpu.ops import quantized as quant_ops

        orig = quant_ops._on_tpu
        try:
            quant_ops._on_tpu = lambda: True
            self.assertTrue(quant_ops.resolve_store_quantized("auto"))
            quant_ops._on_tpu = lambda: False
            self.assertFalse(quant_ops.resolve_store_quantized("auto"))
        finally:
            quant_ops._on_tpu = orig

    def test_explicit_values_pin(self):
        from photo_search_engine_tpu.ops.quantized import resolve_store_quantized

        self.assertTrue(resolve_store_quantized(True))
        self.assertFalse(resolve_store_quantized(False))
        for text in ("1", "true", "YES", "on"):
            self.assertTrue(resolve_store_quantized(text), text)
        for text in ("0", "false", "No", "off", "", None):
            self.assertFalse(resolve_store_quantized(text), repr(text))
        with self.assertRaises(ValueError):
            resolve_store_quantized("fastest")

    def test_config_default_is_auto(self):
        import os

        from photo_search_engine_tpu.config import load_config

        saved = os.environ.pop("STORE_QUANTIZED", None)
        try:
            self.assertEqual(load_config()["STORE_QUANTIZED"], "auto")
        finally:
            if saved is not None:
                os.environ["STORE_QUANTIZED"] = saved

    def test_vector_index_accepts_auto(self):
        import tempfile

        from photo_search_engine_tpu.core.vector_index import VectorIndex

        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=16,
                index_path=f"{tmp}/i.npy",
                metadata_path=f"{tmp}/m.json",
                quantized="auto",
            )
            # pytest runs on the forced-CPU backend, so auto resolves False
            self.assertFalse(vi.quantized)
            vi2 = VectorIndex(
                dimension=16,
                index_path=f"{tmp}/i2.npy",
                metadata_path=f"{tmp}/m2.json",
                quantized="1",
            )
            self.assertTrue(vi2.quantized)


class Int8LargeKRoutingTest(unittest.TestCase):
    """The serving over-fetch (candidate_k up to 500) on a quantized store
    must ride the SAME ApproxTopK large-candidate route as the bf16
    default — not the full exact sort int8_search would fall back to
    (verdict r4 item 1a: the 47.5k path must not regress the 7.5 ms
    large-k device path to 51 ms)."""

    def setUp(self):
        self.rng = np.random.default_rng(77)
        self.corpus = _normalize(
            self.rng.normal(size=(600, 24)).astype(np.float32)
        )
        self.queries = _normalize(
            self.rng.normal(size=(4, 24)).astype(np.float32)
        )

    def test_plain_large_k_takes_approx_route(self):
        from photo_search_engine_tpu.ops import topk as topk_ops

        store = EmbeddingStore(24, metric="ip", quantized=True)
        store.append(self.corpus)
        k = 100
        v_exact, i_exact = store.search(self.queries, k, impl="auto")

        calls = []
        orig_gate = topk_ops._use_approx_large_k
        orig_fn = topk_ops.approx_search_large_k

        def wrapped(*args, **kwargs):
            calls.append(1)
            return orig_fn(*args, **kwargs)

        topk_ops._use_approx_large_k = lambda n: True
        topk_ops.approx_search_large_k = wrapped
        try:
            v_int8, i_int8 = store.search(self.queries, k, impl="int8")
        finally:
            topk_ops.approx_search_large_k = orig_fn
            topk_ops._use_approx_large_k = orig_gate
        self.assertTrue(calls, "int8 large-k never took the approx route")
        np.testing.assert_array_equal(i_int8, i_exact)

    def test_small_k_still_uses_int8_kernel(self):
        from photo_search_engine_tpu.ops import quantized as quant_ops
        from photo_search_engine_tpu.ops import topk as topk_ops

        store = EmbeddingStore(24, metric="ip", quantized=True)
        store.append(self.corpus)
        calls = []
        orig = quant_ops.int8_search

        def wrapped(*args, **kwargs):
            calls.append(1)
            return orig(*args, **kwargs)

        orig_gate = topk_ops._use_approx_large_k
        topk_ops._use_approx_large_k = lambda n: True  # gate open either way
        quant_ops.int8_search = wrapped
        try:
            store.search(self.queries, 10, impl="int8")
        finally:
            quant_ops.int8_search = orig
            topk_ops._use_approx_large_k = orig_gate
        self.assertTrue(calls, "small-k int8 search bypassed the int8 kernel")

    def test_grouped_large_k_takes_approx_route(self):
        from photo_search_engine_tpu.ops import grouped_mask as grouped_ops
        from photo_search_engine_tpu.ops import topk as topk_ops

        store = EmbeddingStore(24, metric="ip", quantized=True)
        store.append(self.corpus)
        table = (self.rng.random((3, 600)) < 0.7).astype(np.int8)
        ids = self.rng.integers(0, 3, size=4).astype(np.int32)
        k = 100
        v_exact, i_exact = store.grouped_search(
            self.queries, k, table, ids, impl="auto"
        )

        calls = []
        orig_gate = topk_ops._use_approx_large_k
        orig_fn = grouped_ops.grouped_approx_large_k

        def wrapped(*args, **kwargs):
            calls.append(1)
            return orig_fn(*args, **kwargs)

        topk_ops._use_approx_large_k = lambda n: True
        grouped_ops.grouped_approx_large_k = wrapped
        try:
            v_int8, i_int8 = store.grouped_search(
                self.queries, k, table, ids, impl="int8"
            )
        finally:
            grouped_ops.grouped_approx_large_k = orig_fn
            topk_ops._use_approx_large_k = orig_gate
        self.assertTrue(calls, "grouped int8 large-k never took approx")
        np.testing.assert_array_equal(i_int8, i_exact)

    def test_sharded_large_k_takes_approx_route(self):
        from photo_search_engine_tpu.ops import topk as topk_ops
        from photo_search_engine_tpu.parallel.sharded import (
            ShardedEmbeddingStore,
            make_mesh,
        )

        store = ShardedEmbeddingStore(
            24, make_mesh(8), metric="ip", shard_block=8, quantized=True
        )
        store.append(self.corpus)
        k = 100
        v_exact, i_exact = store.search(self.queries, k, impl="auto")

        calls = []
        orig_gate = topk_ops._use_approx_large_k
        orig_fn = topk_ops.approx_search_large_k

        def wrapped(*args, **kwargs):
            calls.append(1)
            return orig_fn(*args, **kwargs)

        topk_ops._use_approx_large_k = lambda n: True
        topk_ops.approx_search_large_k = wrapped
        try:
            v_int8, i_int8 = store.search(self.queries, k, impl="int8")
        finally:
            topk_ops.approx_search_large_k = orig_fn
            topk_ops._use_approx_large_k = orig_gate
        self.assertTrue(calls, "sharded int8 large-k never took approx")
        np.testing.assert_array_equal(np.asarray(i_int8), np.asarray(i_exact))


class RescoreDepthGateTest(unittest.TestCase):
    """The recall gate on the quantized tier: the exact-rescore pool is
    never shallower than the requested k (cand = max(cand, k); default
    max(32, 2k)), so the rescore re-orders AT LEAST a full result set at
    reference precision."""

    def test_explicit_shallow_cand_is_clamped(self):
        rng = np.random.default_rng(3)
        corpus = _normalize(rng.normal(size=(512, 32)).astype(np.float32))
        query = _normalize(rng.normal(size=(1, 32)).astype(np.float32))
        _plant(corpus, query[0], range(24), np.linspace(0.95, 0.3, 24), rng)
        qd, sc = quantize_rows(jnp.asarray(corpus))
        # cand=1 < k=16 must clamp to >= k, not truncate the result set
        vals, idx = int8_search(
            qd, sc, jnp.asarray(corpus), jnp.asarray(query), 16, cand=1
        )
        self.assertEqual(idx.shape, (1, 16))
        ref_v, ref_i = exact_search_oracle(corpus, query, 16, metric="ip")
        np.testing.assert_array_equal(np.asarray(idx), ref_i)

    def test_default_pool_depth(self):
        # default cand = max(32, 2k): k + margin for every k the int8
        # kernel serves (k <= 64)
        for k in (1, 10, 32, 64):
            cand = max(32, 2 * k)
            self.assertGreaterEqual(cand, k + min(k, 32))


class Int8FeedTest(unittest.TestCase):
    """The restructured-kernel knob (verdict r4 item 1b): the int8 scan's
    MXU feed — native int8×int8→int32 vs dequantize-in-VMEM bf16 — must
    be rank-identical on planted (well-separated) neighbors; exactness
    comes from the rescore either way."""

    def setUp(self):
        self.rng = np.random.default_rng(41)
        self.corpus = _normalize(
            self.rng.normal(size=(700, 64)).astype(np.float32)
        )
        self.queries = _normalize(
            self.rng.normal(size=(5, 64)).astype(np.float32)
        )
        for qi in range(5):
            _plant(
                self.corpus, self.queries[qi],
                range(qi * 20, qi * 20 + 12),
                np.linspace(0.95, 0.35, 12), self.rng,
            )
        self.q8, self.sc = quantize_rows(jnp.asarray(self.corpus))

    def test_both_feeds_match_oracle(self):
        ref_v, ref_i = exact_search_oracle(
            self.corpus, self.queries, 8, metric="ip"
        )
        for feed in ("int8", "bf16"):
            vals, idx = int8_search(
                self.q8, self.sc, jnp.asarray(self.corpus),
                jnp.asarray(self.queries), 8, feed=feed,
            )
            np.testing.assert_array_equal(np.asarray(idx), ref_i, feed)
            np.testing.assert_allclose(
                np.asarray(vals), ref_v, rtol=1e-5, err_msg=feed
            )

    def test_grouped_both_feeds_match_oracle(self):
        from photo_search_engine_tpu.ops.grouped_mask import grouped_mask_oracle
        from photo_search_engine_tpu.ops.quantized import grouped_int8_search

        table = np.ones((2, 700), np.int8)
        table[1, ::3] = 0
        ids = np.array([0, 1, 0, 1, 0], np.int32)
        ref_v, ref_i = grouped_mask_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries),
            jnp.asarray(table), jnp.asarray(ids), 8,
        )
        for feed in ("int8", "bf16"):
            vals, idx = grouped_int8_search(
                self.q8, self.sc, jnp.asarray(self.corpus),
                jnp.asarray(self.queries), jnp.asarray(table),
                jnp.asarray(ids), 8, feed=feed,
            )
            np.testing.assert_array_equal(
                np.asarray(idx), np.asarray(ref_i), feed
            )

    def test_resolver(self):
        import os

        from photo_search_engine_tpu.ops.quantized import (
            default_block_n_int8,
            resolve_int8_feed,
        )

        self.assertEqual(resolve_int8_feed("int8"), "int8")
        self.assertEqual(resolve_int8_feed("BF16"), "bf16")
        self.assertEqual(resolve_int8_feed("auto"), "int8")
        saved = os.environ.pop("INT8_FEED", None)
        try:
            self.assertEqual(resolve_int8_feed(None), "int8")
            os.environ["INT8_FEED"] = "bf16"
            self.assertEqual(resolve_int8_feed(None), "bf16")
        finally:
            if saved is None:
                os.environ.pop("INT8_FEED", None)
            else:
                os.environ["INT8_FEED"] = saved
        with self.assertRaises(ValueError):
            resolve_int8_feed("int4x")
        # the bf16 feed budgets VMEM for its dequantized block copy
        self.assertEqual(default_block_n_int8(1536, "int8"), 2048)
        self.assertEqual(default_block_n_int8(1536, "bf16"), 1024)
