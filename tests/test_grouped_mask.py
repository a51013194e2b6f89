"""Tests for ops/grouped_mask.py — per-query filtered batched search."""

import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.ops.grouped_mask import (
    grouped_mask_oracle,
    grouped_mask_search,
)


class GroupedMaskTest(unittest.TestCase):
    def setUp(self):
        rng = np.random.default_rng(0)
        self.corpus = rng.normal(size=(300, 64)).astype(np.float32)
        self.queries = rng.normal(size=(9, 64)).astype(np.float32)
        # 3 predicates: all rows; even rows; rows 100..199
        table = np.zeros((3, 300), np.int8)
        table[0, :] = 1
        table[1, ::2] = 1
        table[2, 100:200] = 1
        self.table = table
        self.ids = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2], np.int32)

    def _numpy_ref(self, k, count=None):
        scores = self.queries @ self.corpus.T
        mask = self.table[self.ids] > 0
        n = self.corpus.shape[0]
        valid = np.arange(n)[None, :] < (n if count is None else count)
        scores = np.where(mask & valid, scores, -np.inf)
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(scores, idx, axis=1)
        idx = np.where(np.isneginf(vals), -1, idx)
        return vals, idx

    def test_pallas_matches_numpy(self):
        ref_v, ref_i = self._numpy_ref(7)
        for impl in ("lax", "pallas", "pallas_fast"):
            vals, idx = grouped_mask_search(
                jnp.asarray(self.corpus),
                jnp.asarray(self.queries),
                jnp.asarray(self.table),
                jnp.asarray(self.ids),
                7,
                impl=impl,
                block_n=128,
                block_q=8,
            )
            np.testing.assert_array_equal(np.asarray(idx), ref_i, err_msg=impl)
            np.testing.assert_allclose(
                np.asarray(vals), ref_v, rtol=1e-5, atol=1e-5, err_msg=impl
            )

    def test_each_query_respects_its_predicate(self):
        _, idx = grouped_mask_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries),
            jnp.asarray(self.table), jnp.asarray(self.ids), 10,
            impl="pallas", block_n=128, block_q=8,
        )
        idx = np.asarray(idx)
        for q, mask_id in enumerate(self.ids):
            hits = idx[q][idx[q] >= 0]
            if mask_id == 1:
                self.assertTrue((hits % 2 == 0).all())
            elif mask_id == 2:
                self.assertTrue(((hits >= 100) & (hits < 200)).all())

    def test_count_limit(self):
        ref_v, ref_i = self._numpy_ref(5, count=150)
        vals, idx = grouped_mask_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries),
            jnp.asarray(self.table), jnp.asarray(self.ids), 5,
            count=150, impl="pallas", block_n=128, block_q=8,
        )
        np.testing.assert_array_equal(np.asarray(idx), ref_i)

    def test_empty_predicate_yields_empty_slots(self):
        table = np.zeros((2, 300), np.int8)
        table[0, :] = 1  # predicate 1 matches nothing
        ids = np.array([0, 1], np.int32)
        vals, idx = grouped_mask_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries[:2]),
            jnp.asarray(table), jnp.asarray(ids), 5,
            impl="pallas", block_n=128, block_q=8,
        )
        idx = np.asarray(idx)
        self.assertTrue((idx[0] >= 0).all())
        self.assertTrue((idx[1] == -1).all())

    def test_large_k_routes_to_oracle(self):
        ref_v, ref_i = self._numpy_ref(200)
        vals, idx = grouped_mask_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries),
            jnp.asarray(self.table), jnp.asarray(self.ids), 200,
            impl="pallas",
        )
        np.testing.assert_array_equal(np.asarray(idx), ref_i)

    def test_oracle_shapes(self):
        vals, idx = grouped_mask_oracle(
            jnp.asarray(self.corpus), jnp.asarray(self.queries),
            jnp.asarray(self.table), jnp.asarray(self.ids), 3,
        )
        self.assertEqual(idx.shape, (9, 3))

    def test_approx_large_k_matches_oracle_on_cpu(self):
        # the grouped mirror of topk.approx_search_large_k (round 4):
        # off-TPU approx_max_k computes exactly, so the CPU result must
        # match the oracle, including count-capping and empty slots
        from photo_search_engine_tpu.ops.grouped_mask import (
            grouped_approx_large_k,
        )

        for count in (None, 150):
            vo, io = grouped_mask_oracle(
                jnp.asarray(self.corpus), jnp.asarray(self.queries),
                jnp.asarray(self.table), jnp.asarray(self.ids), 120,
                count=count,
            )
            va, ia = grouped_approx_large_k(
                jnp.asarray(self.corpus), jnp.asarray(self.queries),
                jnp.asarray(self.table), jnp.asarray(self.ids), 120,
                count=count,
            )
            for row in range(9):
                self.assertEqual(
                    set(np.asarray(ia)[row].tolist()),
                    set(np.asarray(io)[row].tolist()),
                    f"count={count} row={row}",
                )

    def test_approx_large_k_buckets_query_axis(self):
        # grouped mirror of test_topk.test_approx_large_k_buckets_query_axis:
        # organic micro-batch sizes must share one compiled executable per
        # power-of-two query bucket (padded rows point at mask row 0 and
        # are sliced off), and padding must not change real-row results
        from photo_search_engine_tpu.ops import grouped_mask as grouped_ops
        from photo_search_engine_tpu.ops.grouped_mask import (
            grouped_approx_large_k,
        )
        from photo_search_engine_tpu.ops.topk import bucket_queries

        seen_shapes = []
        orig = grouped_ops._grouped_approx_impl

        def spy(corpus, queries, table, ids, count, k):
            self.assertEqual(queries.shape[0], ids.shape[0])
            seen_shapes.append(queries.shape[0])
            return orig(corpus, queries, table, ids, count, k)

        sizes = (1, 3, 9)
        grouped_ops._grouped_approx_impl = spy
        try:
            for b in sizes:
                q = jnp.asarray(self.queries[:b])
                ids = jnp.asarray(self.ids[:b])
                va, ia = grouped_approx_large_k(
                    jnp.asarray(self.corpus), q,
                    jnp.asarray(self.table), ids, 120,
                )
                self.assertEqual(va.shape, (b, 120))
                vo, io = grouped_mask_oracle(
                    jnp.asarray(self.corpus), q,
                    jnp.asarray(self.table), ids, 120,
                )
                for row in range(b):
                    self.assertEqual(
                        set(np.asarray(ia)[row].tolist()),
                        set(np.asarray(io)[row].tolist()),
                        f"b={b} row={row}",
                    )
        finally:
            grouped_ops._grouped_approx_impl = orig
        self.assertEqual(seen_shapes, [bucket_queries(b) for b in sizes])
        self.assertEqual(set(seen_shapes), {8, 16})

    def test_store_grouped_routing_and_fail_soft(self):
        from photo_search_engine_tpu.core.embedding_store import EmbeddingStore
        from photo_search_engine_tpu.ops import grouped_mask as grouped_ops
        from photo_search_engine_tpu.ops import topk as topk_ops

        store = EmbeddingStore(64, metric="ip")
        store.append(self.corpus)
        k = 120
        v_exact, i_exact = store.grouped_search(
            self.queries, k, self.table[:, :300], self.ids
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
            v_apx, i_apx = store.grouped_search(
                self.queries, k, self.table[:, :300], self.ids
            )
        finally:
            grouped_ops.grouped_approx_large_k = orig_fn
        self.assertTrue(calls, "grouped approx route was never taken")
        np.testing.assert_array_equal(i_apx, i_exact)

        def boom(*args, **kwargs):
            raise RuntimeError("approx unavailable")

        grouped_ops.grouped_approx_large_k = boom
        try:
            v_fb, i_fb = store.grouped_search(
                self.queries, k, self.table[:, :300], self.ids
            )
        finally:
            grouped_ops.grouped_approx_large_k = orig_fn
            topk_ops._use_approx_large_k = orig_gate
        np.testing.assert_array_equal(i_fb, i_exact)
        self.assertTrue(store._approx_large_k_broken)

    def test_sharded_grouped_approx_matches_oracle(self):
        from photo_search_engine_tpu.parallel.sharded import (
            make_mesh,
            sharded_grouped_search,
        )

        rng = np.random.default_rng(5)
        mesh = make_mesh(4)
        corpus = rng.normal(size=(4 * 128, 32)).astype(np.float32)
        queries = rng.normal(size=(6, 32)).astype(np.float32)
        table = np.zeros((2, 512), np.int8)
        table[0, :] = 1
        table[1, ::3] = 1
        ids = np.array([0, 1, 0, 1, 0, 1], np.int32)
        va, ia = sharded_grouped_search(
            jnp.asarray(corpus), queries, table, ids, 100, mesh,
            impl="approx",
        )
        vo, io = grouped_mask_oracle(
            jnp.asarray(corpus), jnp.asarray(queries),
            jnp.asarray(table), jnp.asarray(ids), 100,
        )
        for row in range(6):
            self.assertEqual(
                set(np.asarray(ia)[row].tolist()),
                set(np.asarray(io)[row].tolist()),
            )


if __name__ == "__main__":
    unittest.main()
