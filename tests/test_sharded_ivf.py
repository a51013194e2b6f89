"""Sharded IVF (parallel/sharded_ivf.py) on the 8-virtual-device CPU mesh.

Contract: full probe == sharded exact search (same ids); partial probe
keeps high recall on clustered data; stable ids resolve through the
store's reconstruct().
"""

from __future__ import annotations

import unittest

import numpy as np

from photo_search_engine_tpu.parallel.sharded import (
    ShardedEmbeddingStore,
    make_mesh,
    sharded_exact_search,
)
from photo_search_engine_tpu.parallel.sharded_ivf import ShardedIVFIndex


def _clustered(n, dim, intrinsic, rng):
    basis = rng.normal(size=(intrinsic, dim)).astype(np.float32) / np.sqrt(
        intrinsic
    )
    x = rng.normal(size=(n, intrinsic)).astype(np.float32) @ basis
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


class ShardedIVFTest(unittest.TestCase):
    def setUp(self):
        self.rng = np.random.default_rng(0)
        self.mesh = make_mesh(8)
        self.dim = 64
        self.store = ShardedEmbeddingStore(
            self.dim, self.mesh, metric="cosine"
        )
        self.rows = _clustered(4096, self.dim, 8, self.rng)
        self.ids = self.store.append(self.rows)

    def test_full_probe_matches_sharded_exact(self):
        index = ShardedIVFIndex.build(self.store, nlist=32, seed=1)
        queries = self.rows[self.rng.choice(4096, 16, replace=False)]
        vals, got = index.search(queries, k=5, nprobe=32)
        # oracle: the sharded exact path over the same store
        evals, eids = self.store.search(queries, 5)
        for row in range(queries.shape[0]):
            self.assertEqual(set(got[row].tolist()), set(np.asarray(eids)[row].tolist()))

    def test_partial_probe_recall(self):
        index = ShardedIVFIndex.build(self.store, nlist=32, seed=1)
        picks = self.rng.choice(4096, 32, replace=False)
        queries = self.rows[picks] + 0.05 * self.rng.normal(
            size=(32, self.dim)
        ).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        _, eids = self.store.search(queries, 10)
        _, got = index.search(queries, k=10, nprobe=8)
        hits = sum(
            len(set(g.tolist()) & set(np.asarray(e).tolist())) / 10
            for g, e in zip(got, eids)
        ) / 32
        self.assertGreaterEqual(hits, 0.9)

    def test_stable_ids_reconstruct(self):
        index = ShardedIVFIndex.build(self.store, nlist=16, seed=2)
        query = self.rows[123]
        _, got = index.search(query, k=1, nprobe=16)
        top = int(got[0, 0])
        rec = self.store.reconstruct(top)
        self.assertGreaterEqual(float(rec @ query), 0.999)

    def test_incremental_append(self):
        index = ShardedIVFIndex.build(self.store, nlist=16, seed=4)
        new_rows = _clustered(64, self.dim, 8, self.rng)
        new_ids = self.store.append(new_rows)
        self.assertTrue(index.append(new_rows, new_ids))
        # an appended row must be findable at full probe
        _, got = index.search(new_rows[7], k=1, nprobe=16)
        self.assertEqual(int(got[0, 0]), int(new_ids[7]))
        # and full probe still equals sharded exact over the grown store
        queries = new_rows[:8]
        _, eids = self.store.search(queries, 5)
        _, gids = index.search(queries, k=5, nprobe=16)
        for row in range(8):
            self.assertEqual(
                set(gids[row].tolist()), set(np.asarray(eids)[row].tolist())
            )

    def test_append_full_cluster_declines(self):
        from photo_search_engine_tpu.parallel.sharded_ivf import (
            _host_assign_top3,
        )

        index = ShardedIVFIndex.build(self.store, nlist=16, seed=5)
        row = self.rows[0:1]
        new_id = self.store.append(row)
        # fill every slot of the row's top-3 candidate clusters in its
        # shard so the scatter has nowhere to go
        shard = int(new_id[0] >> 40)
        top = _host_assign_top3(row, index.centroids[:, : index.dim])[0]
        for c in top:
            base = int(c) * index.lrows
            index.perms[shard][base : base + index.lrows] = 0
        self.assertFalse(index.append(row, new_id))

    def test_k_exceeding_shard_span(self):
        # review regression: k larger than one shard's span (nlist*lrows)
        # crashed the per-shard top_k; the local k must clamp to the span
        # while the merge still returns the exact global top-k
        store = ShardedEmbeddingStore(16, self.mesh, metric="cosine")
        rows = _clustered(4096, 16, 8, self.rng)
        store.append(rows)
        index = ShardedIVFIndex.build(store, nlist=1, train_iters=1)
        span = index.nlist * index.lrows
        k = span + 64  # > per-shard span, < total
        queries = rows[:2]
        vals, got = index.search(queries, k=k, nprobe=1)
        _, eids = store.search(queries, k)
        for row in range(2):
            self.assertEqual(
                set(got[row].tolist()), set(np.asarray(eids)[row].tolist())
            )

    def test_append_normalizes_for_cosine(self):
        # review regression: an unnormalized appended row must not carry
        # an inflated IP score in the layout
        index = ShardedIVFIndex.build(self.store, nlist=16, seed=6)
        raw = 10.0 * _clustered(1, self.dim, 8, self.rng)  # norm 10
        ids = self.store.append(raw)
        self.assertTrue(index.append(raw, ids))
        # an unrelated query must rank identically to sharded exact
        query = self.rows[50]
        _, eids = self.store.search(query, 5)
        _, gids = index.search(query, k=5, nprobe=16)
        self.assertEqual(
            set(gids[0].tolist()), set(np.asarray(eids)[0].tolist())
        )

    def _slot_mask_from_insertion_bits(self, index, keep):
        """Insertion-order keep bits → [n_shards * span] slot-layout bits
        (test-side mirror of MeshIVFAdapter._slot_bits, but keyed by the
        store append's stable ids directly)."""
        shard = (self.ids // (1 << 40)).astype(np.int64)
        local = (self.ids % (1 << 40)).astype(np.int64)
        slot_bits = np.zeros(index.perms.shape, np.int32)
        for s in range(index.perms.shape[0]):
            sel = shard == s
            if not sel.any():
                continue
            local_bits = np.zeros(int(local[sel].max()) + 1, np.int32)
            local_bits[local[sel]] = keep[sel]
            live = index.perms[s] >= 0
            src = index.perms[s][live]
            inb = src < local_bits.shape[0]
            bits_row = np.zeros(int(live.sum()), np.int32)
            bits_row[inb] = local_bits[src[inb]]
            slot_bits[s, live] = bits_row
        return slot_bits.reshape(-1)

    def test_masked_full_probe_matches_exact_masked(self):
        # the round-3 contract: filters keep cluster pruning on the mesh —
        # at full probe the masked sharded IVF must agree with the sharded
        # exact-masked oracle exactly
        index = ShardedIVFIndex.build(self.store, nlist=32, seed=7)
        keep = (self.rng.random(4096) < 0.25).astype(np.int32)
        slot_mask = self._slot_mask_from_insertion_bits(index, keep)
        queries = self.rows[self.rng.choice(4096, 12, replace=False)]
        _, got = index.search(
            queries, k=8, nprobe=32, slot_mask=slot_mask,
            mask_ratio=float(keep.mean()),
        )
        layout = self.store.layout_mask(self.ids, keep)
        _, eids = self.store.search(queries, 8, mask=layout)
        for row in range(queries.shape[0]):
            self.assertEqual(
                set(got[row].tolist()), set(np.asarray(eids)[row].tolist())
            )
        # every hit satisfies the filter
        keep_by_stable = {int(i): int(b) for i, b in zip(self.ids, keep)}
        for row in got:
            for sid in row.tolist():
                if sid >= 0:
                    self.assertEqual(keep_by_stable[sid], 1)

    def test_masked_partial_probe_recall_with_inflation(self):
        # selective filters inflate the probe width (~1/selectivity); the
        # masked probed search must hold high recall vs exact-masked
        index = ShardedIVFIndex.build(self.store, nlist=32, seed=8)
        keep = (self.rng.random(4096) < 0.5).astype(np.int32)
        slot_mask = self._slot_mask_from_insertion_bits(index, keep)
        picks = self.rng.choice(4096, 24, replace=False)
        queries = self.rows[picks] + 0.05 * self.rng.normal(
            size=(24, self.dim)
        ).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        layout = self.store.layout_mask(self.ids, keep)
        _, eids = self.store.search(queries, 10, mask=layout)
        _, got = index.search(
            queries, k=10, nprobe=8, slot_mask=slot_mask,
            mask_ratio=float(keep.mean()),
        )
        hits = sum(
            len(set(g.tolist()) & set(np.asarray(e).tolist())) / 10
            for g, e in zip(got, eids)
        ) / 24
        self.assertGreaterEqual(hits, 0.9)

    def test_masked_empty_filter_returns_padding(self):
        index = ShardedIVFIndex.build(self.store, nlist=16, seed=9)
        slot_mask = np.zeros(
            index.perms.shape[0] * index.nlist * index.lrows, np.int32
        )
        _, got = index.search(
            self.rows[:3], k=5, nprobe=16, slot_mask=slot_mask, mask_ratio=0.0
        )
        self.assertTrue((got == -1).all())

    def test_l2_full_probe_matches_sharded_exact(self):
        # l2 on the mesh: scores merge in 2<q,c>-|c|² space across shards;
        # full probe must agree with the sharded exact l2 oracle
        store = ShardedEmbeddingStore(self.dim, self.mesh, metric="l2")
        rows = _clustered(2048, self.dim, 8, self.rng) * self.rng.uniform(
            0.5, 3.0, size=(2048, 1)
        ).astype(np.float32)
        ids = store.append(rows)
        index = ShardedIVFIndex.build(store, nlist=16, seed=6)
        self.assertEqual(index.metric, "l2")
        queries = rows[self.rng.choice(2048, 12, replace=False)]
        vals, got = index.search(queries, k=6, nprobe=16)
        evals, eids = store.search(queries, 6)
        for row in range(queries.shape[0]):
            self.assertEqual(
                set(got[row].tolist()), set(np.asarray(eids)[row].tolist())
            )
        # distances are ascending positive squared l2 (exact convention)
        finite = vals[np.isfinite(vals)]
        self.assertTrue((finite >= -1e-4).all())
        np.testing.assert_allclose(
            np.sort(vals, axis=1), vals, rtol=0, atol=1e-5
        )
        self.assertAlmostEqual(float(vals[0, 0]), 0.0, places=4)

    def test_l2_masked_full_probe(self):
        store = ShardedEmbeddingStore(self.dim, self.mesh, metric="l2")
        rows = _clustered(2048, self.dim, 8, self.rng) * 2.0
        ids = store.append(rows)
        index = ShardedIVFIndex.build(store, nlist=16, seed=7)
        keep = (self.rng.random(2048) < 0.4).astype(np.int32)
        shard = (ids // (1 << 40)).astype(np.int64)
        local = (ids % (1 << 40)).astype(np.int64)
        slot_bits = np.zeros(index.perms.shape, np.int32)
        for s in range(index.perms.shape[0]):
            sel = shard == s
            if not sel.any():
                continue
            local_bits = np.zeros(int(local[sel].max()) + 1, np.int32)
            local_bits[local[sel]] = keep[sel]
            live = index.perms[s] >= 0
            src = index.perms[s][live]
            inb = src < local_bits.shape[0]
            bits_row = np.zeros(int(live.sum()), np.int32)
            bits_row[inb] = local_bits[src[inb]]
            slot_bits[s, live] = bits_row
        queries = rows[self.rng.choice(2048, 8, replace=False)]
        _, got = index.search(
            queries, k=6, nprobe=16, slot_mask=slot_bits.reshape(-1),
            mask_ratio=float(keep.mean()),
        )
        layout = store.layout_mask(ids, keep)
        _, eids = store.search(queries, 6, mask=layout)
        for row in range(queries.shape[0]):
            self.assertEqual(
                set(got[row].tolist()), set(np.asarray(eids)[row].tolist())
            )

    def test_l2_state_roundtrip(self):
        store = ShardedEmbeddingStore(self.dim, self.mesh, metric="l2")
        rows = _clustered(1024, self.dim, 8, self.rng) * 1.7
        store.append(rows)
        index = ShardedIVFIndex.build(store, nlist=8, seed=8)
        restored = ShardedIVFIndex.from_state(store, index.state())
        queries = rows[:5]
        vals_a, ids_a = index.search(queries, 4, nprobe=8)
        vals_b, ids_b = restored.search(queries, 4, nprobe=8)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_allclose(vals_a, vals_b, rtol=1e-5)

    def test_uneven_shards(self):
        # 4097 rows: one shard has one extra row; padding slots must never
        # surface as hits
        store = ShardedEmbeddingStore(self.dim, self.mesh, metric="cosine")
        rows = _clustered(4097, self.dim, 8, self.rng)
        store.append(rows)
        index = ShardedIVFIndex.build(store, nlist=16, seed=3)
        queries = rows[:8]
        vals, got = index.search(queries, k=5, nprobe=16)
        self.assertTrue((got >= 0).all())
        _, eids = store.search(queries, 5)
        for row in range(8):
            self.assertEqual(set(got[row].tolist()), set(np.asarray(eids)[row].tolist()))


class StoreDtypeResolutionTest(unittest.TestCase):
    """STORE_DTYPE=auto plumbing down to the raw stores (round 4).

    The first round-4 chip capture measured the sharded IVF program at
    +140.8% vs unsharded — root-caused (scripts/sivf_probe.py) to the
    raw ShardedEmbeddingStore float32 default doubling HBM bytes on the
    bandwidth-bound cluster scan while the unsharded baseline corpus was
    bf16.  "auto" now resolves at the store level exactly like
    VectorIndex's serving default."""

    def test_auto_resolves_to_platform_dtype(self):
        import jax

        from photo_search_engine_tpu.ops.topk import resolve_store_dtype

        expect = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        self.assertEqual(resolve_store_dtype("auto"), expect)
        self.assertEqual(resolve_store_dtype("float32"), "float32")
        self.assertEqual(resolve_store_dtype("bfloat16"), "bfloat16")
        self.assertEqual(resolve_store_dtype(None), "float32")

    def test_stores_accept_auto(self):
        import jax.numpy as jnp

        from photo_search_engine_tpu.core.embedding_store import EmbeddingStore

        # conftest pins the CPU platform, so auto must land on float32 here
        self.assertEqual(
            ShardedEmbeddingStore(16, make_mesh(), store_dtype="auto").store_dtype,
            jnp.dtype("float32"),
        )
        self.assertEqual(
            EmbeddingStore(16, store_dtype="auto").store_dtype,
            jnp.dtype("float32"),
        )

    def test_bf16_store_ivf_layout_inherits_and_recalls(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        mesh = make_mesh(8)
        store = ShardedEmbeddingStore(
            32, mesh, metric="cosine", store_dtype="bfloat16"
        )
        rows = _clustered(2048, 32, 8, rng)
        store.append(rows)
        index = ShardedIVFIndex.build(store, nlist=16, seed=9)
        # the layout must inherit the store dtype (the perf contract)
        self.assertEqual(index._layout.dtype, jnp.dtype("bfloat16"))
        queries = rows[rng.choice(2048, 16, replace=False)]
        vals, got = index.search(queries, k=10, nprobe=16)
        # exact corpus rows stay top-1 through bf16 rounding
        f32_oracle = ShardedEmbeddingStore(32, mesh, metric="cosine")
        f32_oracle.append(rows)
        _, eids = f32_oracle.search(queries, 10)
        top1 = np.asarray(eids)[:, 0]
        self.assertTrue((got[:, 0] == top1).all())
        # and the tail keeps high agreement with the f32 exact oracle
        hits = sum(
            len(set(g.tolist()) & set(np.asarray(e).tolist())) / 10
            for g, e in zip(got, np.asarray(eids))
        ) / 16
        self.assertGreaterEqual(hits, 0.8)


if __name__ == "__main__":
    unittest.main()
