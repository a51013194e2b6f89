"""Numerical parity tests: Pallas fused top-k vs lax oracle vs NumPy
(SURVEY.md §4 TPU test strategy — kernel parity against a NumPy /
jax.lax.top_k oracle; runs in Pallas interpreter mode on the CPU backend)."""

import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.ops import exact_search, exact_search_oracle, l2_normalize


def _numpy_topk(corpus, queries, k, metric="ip", count=None, mask=None):
    corpus = np.asarray(corpus, np.float32)
    queries = np.atleast_2d(np.asarray(queries, np.float32))
    n = corpus.shape[0]
    scores = queries @ corpus.T
    if metric == "l2":
        qn = (queries**2).sum(1, keepdims=True)
        cn = (corpus**2).sum(1)[None, :]
        scores = -(qn + cn - 2 * scores)
    valid = np.arange(n)[None, :] < (n if count is None else count)
    if mask is not None:
        valid = valid & (np.asarray(mask)[None, :] > 0)
    scores = np.where(valid, scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    idx = np.where(np.isneginf(vals), -1, idx)
    if metric == "l2":
        vals = np.where(np.isneginf(vals), np.inf, -vals)
    return vals, idx


class TopkParityTest(unittest.TestCase):
    def setUp(self):
        rng = np.random.default_rng(0)
        self.corpus = rng.normal(size=(300, 96)).astype(np.float32)
        self.queries = rng.normal(size=(5, 96)).astype(np.float32)

    def _check(self, metric, k=10, count=None, mask=None, corpus=None, queries=None):
        corpus = self.corpus if corpus is None else corpus
        queries = self.queries if queries is None else queries
        ref_v, ref_i = _numpy_topk(corpus, queries, k, metric, count, mask)
        for impl in ("lax", "pallas", "pallas_fused", "pallas_fast"):
            vals, idx = exact_search(
                jnp.asarray(corpus),
                jnp.asarray(queries),
                k,
                count=count,
                mask=None if mask is None else jnp.asarray(mask),
                metric=metric,
                impl=impl,
                block_n=128,
                block_q=8,
            )
            np.testing.assert_array_equal(
                np.asarray(idx), ref_i, err_msg=f"indices mismatch impl={impl}"
            )
            np.testing.assert_allclose(
                np.asarray(vals), ref_v, rtol=1e-5, atol=1e-5,
                err_msg=f"values mismatch impl={impl}",
            )

    def test_ip_parity(self):
        self._check("ip")

    def test_l2_parity(self):
        self._check("l2")

    def test_count_limits_rows(self):
        self._check("ip", count=123)

    def test_mask_filters_rows(self):
        rng = np.random.default_rng(1)
        mask = (rng.random(300) > 0.5).astype(np.int32)
        self._check("ip", mask=mask)

    def test_mask_and_count_combined(self):
        mask = np.ones(300, np.int32)
        mask[::3] = 0
        self._check("l2", count=200, mask=mask)

    def test_highly_selective_mask_fewer_than_k(self):
        mask = np.zeros(300, np.int32)
        mask[[7, 42, 99]] = 1
        vals, idx = exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries), 10,
            mask=jnp.asarray(mask), impl="pallas", block_n=128, block_q=8,
        )
        idx = np.asarray(idx)
        # exactly 3 real hits per row, rest -1
        self.assertTrue(((idx >= 0).sum(axis=1) == 3).all())
        self.assertTrue(set(idx[0][idx[0] >= 0]).issubset({7, 42, 99}))

    def test_duplicate_rows_tie_break_smallest_index(self):
        corpus = np.tile(self.corpus[:30], (3, 1))  # rows i, i+30, i+60 identical
        self._check("ip", corpus=corpus, queries=self.queries[:2], k=5)

    def test_k_larger_than_corpus_clamps(self):
        vals, idx = exact_search(
            jnp.asarray(self.corpus[:4]), jnp.asarray(self.queries[:1]), 10,
            impl="pallas", block_n=128, block_q=8,
        )
        self.assertEqual(idx.shape, (1, 4))

    def test_single_query_vector_promoted(self):
        vals, idx = exact_search(
            jnp.asarray(self.corpus), jnp.asarray(self.queries[0]), 3,
            impl="lax",
        )
        self.assertEqual(idx.shape, (1, 3))

    def test_non_aligned_dim_padding(self):
        rng = np.random.default_rng(2)
        corpus = rng.normal(size=(77, 130)).astype(np.float32)
        queries = rng.normal(size=(3, 130)).astype(np.float32)
        self._check("ip", corpus=corpus, queries=queries, k=7)

    def test_empty_corpus(self):
        vals, idx = exact_search(
            jnp.zeros((0, 16), jnp.float32), jnp.ones((2, 16), jnp.float32), 5
        )
        self.assertEqual(idx.shape, (2, 0))

    def test_cosine_normalized_scores_bounded(self):
        corpus = np.asarray(l2_normalize(jnp.asarray(self.corpus)))
        queries = np.asarray(l2_normalize(jnp.asarray(self.queries)))
        vals, _ = exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 5,
            metric="cosine", impl="pallas", block_n=128, block_q=8,
        )
        self.assertLessEqual(float(np.max(np.asarray(vals))), 1.0 + 1e-4)

    def test_approx_large_k_matches_oracle_on_cpu(self):
        # the serving path's candidate_k>64 scans use ApproxTopK on large
        # TPU corpora; off-TPU approx_max_k computes exactly, so the
        # wrapper must match the oracle bit-for-bit here — incl. count
        # clamping, masks, and the l2 sign convention
        from photo_search_engine_tpu.ops.topk import approx_search_large_k

        rng = np.random.default_rng(11)
        corpus = rng.normal(size=(400, 32)).astype(np.float32)
        queries = rng.normal(size=(3, 32)).astype(np.float32)
        mask = (np.arange(400) % 3 == 0).astype(np.int32)
        for metric in ("ip", "l2"):
            for m in (None, jnp.asarray(mask)):
                v_ref, i_ref = exact_search(
                    jnp.asarray(corpus), jnp.asarray(queries), 100,
                    count=380, mask=m, metric=metric, impl="lax",
                )
                v_apx, i_apx = approx_search_large_k(
                    jnp.asarray(corpus), jnp.asarray(queries), 100,
                    count=380, mask=m, metric=metric,
                )
                np.testing.assert_array_equal(
                    np.asarray(i_ref), np.asarray(i_apx)
                )
                np.testing.assert_allclose(
                    np.asarray(v_ref), np.asarray(v_apx), rtol=1e-6
                )

    def test_approx_large_k_buckets_query_axis(self):
        # the micro-batcher produces organic batch sizes (1, 2, 3, ...);
        # each distinct query shape is a fresh XLA compile — multi-second
        # on remote-attached runtimes, the round-5 load tests' p99 8-13s
        # tail (docs/CHIP_SESSION_r05.log).  The wrapper must pad the
        # query axis to the power-of-two buckets every other serving
        # kernel uses, and padding must not change real-row results.
        from photo_search_engine_tpu.ops import topk as topk_ops
        from photo_search_engine_tpu.ops.topk import (
            approx_search_large_k,
            bucket_queries,
        )

        rng = np.random.default_rng(5)
        corpus = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
        seen_shapes = []
        orig = topk_ops._approx_large_k_impl

        def spy(corpus, queries, count, mask, k, metric):
            seen_shapes.append(queries.shape[0])
            return orig(corpus, queries, count, mask, k, metric)

        sizes = (1, 2, 3, 5, 8, 9)
        topk_ops._approx_large_k_impl = spy
        try:
            for b in sizes:
                q = jnp.asarray(rng.normal(size=(b, 16)).astype(np.float32))
                vals, idx = approx_search_large_k(corpus, q, 70)
                self.assertEqual(vals.shape, (b, 70))
                v_ref, i_ref = exact_search(corpus, q, 70, impl="lax")
                np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))
                np.testing.assert_allclose(
                    np.asarray(vals), np.asarray(v_ref), rtol=1e-6
                )
        finally:
            topk_ops._approx_large_k_impl = orig
        self.assertEqual(seen_shapes, [bucket_queries(b) for b in sizes])
        # the whole organic range shares two compiled shapes, not six
        self.assertEqual(set(seen_shapes), {8, 16})

    def test_approx_large_k_gate(self):
        # the store's auto-route sends k>64 scans to ApproxTopK only on
        # TPU at large counts; off-TPU (this suite) the gate must be
        # closed so every CPU test keeps exercising the exact oracle
        import os

        from photo_search_engine_tpu.ops.topk import _use_approx_large_k

        self.assertFalse(_use_approx_large_k(1_000_000))  # CPU backend
        # the env override documents the operator escape hatch
        os.environ["TOPK_EXACT_LARGE_K"] = "1"
        try:
            self.assertFalse(_use_approx_large_k(1_000_000))
        finally:
            os.environ.pop("TOPK_EXACT_LARGE_K")

    def test_oracle_matches_numpy_bf16_ranks(self):
        corpus = jnp.asarray(self.corpus, jnp.bfloat16)
        queries = jnp.asarray(self.queries, jnp.bfloat16)
        v_lax, i_lax = exact_search(corpus, queries, 10, impl="lax")
        v_pl, i_pl = exact_search(
            corpus, queries, 10, impl="pallas", block_n=128, block_q=8
        )
        np.testing.assert_array_equal(np.asarray(i_lax), np.asarray(i_pl))
        np.testing.assert_allclose(np.asarray(v_lax), np.asarray(v_pl), rtol=1e-2)


if __name__ == "__main__":
    unittest.main()
