"""Regression tests for the round-1 code-review findings (each was a
repro-confirmed defect)."""

import os
import tempfile
import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.parallel import (
    ShardedEmbeddingStore,
    make_mesh,
    sharded_exact_search,
)


class ShardedPallasCountTest(unittest.TestCase):
    """Padding rows must be masked inside the scan, not post-hoc."""

    def test_negative_similarity_with_padding(self):
        rng = np.random.default_rng(0)
        mesh = make_mesh()
        # live rows all strongly negative similarity to the query;
        # padding rows (zeros) would score 0 and win without in-scan masks
        corpus = np.full((8 * 128, 16), -1.0, np.float32)
        counts = np.full(8, 100, np.int32)
        query = np.ones((1, 16), np.float32)
        for impl in ("lax", "pallas"):
            vals, idx = sharded_exact_search(
                jnp.asarray(corpus), jnp.asarray(query), 5, mesh,
                counts=counts, impl=impl,
            )
            idx = np.asarray(idx)
            self.assertTrue((idx >= 0).all(), f"impl={impl} returned empty slots")
            # every hit is a live row (local index < 100 within its shard)
            self.assertTrue(((idx % 128) < 100).all())
            self.assertTrue(np.allclose(np.asarray(vals), -16.0), impl)
        del rng

    def test_l2_pallas_matches_lax(self):
        rng = np.random.default_rng(1)
        mesh = make_mesh()
        corpus = rng.normal(size=(8 * 64, 16)).astype(np.float32)
        queries = rng.normal(size=(3, 16)).astype(np.float32)
        v_lax, i_lax = sharded_exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 5, mesh,
            metric="l2", impl="lax",
        )
        v_pl, i_pl = sharded_exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 5, mesh,
            metric="l2", impl="pallas",
        )
        np.testing.assert_array_equal(np.asarray(i_lax), np.asarray(i_pl))
        np.testing.assert_allclose(np.asarray(v_lax), np.asarray(v_pl),
                                   rtol=1e-4, atol=1e-4)

    def test_k_larger_than_shard_rows(self):
        rng = np.random.default_rng(2)
        mesh = make_mesh()
        corpus = rng.normal(size=(8 * 16, 8)).astype(np.float32)
        queries = rng.normal(size=(2, 8)).astype(np.float32)
        vals, idx = sharded_exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 50, mesh
        )
        self.assertEqual(np.asarray(idx).shape, (2, 50))
        scores = queries @ corpus.T
        ref = np.argsort(-scores, axis=1, kind="stable")[:, :50]
        np.testing.assert_array_equal(np.asarray(idx), ref)


class StableIdTest(unittest.TestCase):
    """Returned ids must survive capacity growth."""

    def test_ids_stable_across_growth(self):
        store = ShardedEmbeddingStore(8, make_mesh(), metric="ip", shard_block=8)
        rng = np.random.default_rng(3)
        first = rng.normal(size=(64, 8)).astype(np.float32)
        ids_first = store.append(first)
        # grow capacity well past the original hint
        store.append(rng.normal(size=(200, 8)).astype(np.float32))
        for row, stable_id in zip(first[:10], ids_first[:10]):
            np.testing.assert_allclose(store.reconstruct(int(stable_id)), row,
                                       rtol=1e-6)

    def test_search_ids_decode_after_growth(self):
        # cosine so the query's own row is always the nearest hit
        store = ShardedEmbeddingStore(8, make_mesh(), metric="cosine", shard_block=8)
        rng = np.random.default_rng(4)
        vectors = rng.normal(size=(30, 8)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        store.append(vectors)
        store.append(rng.normal(size=(100, 8)).astype(np.float32))
        _, idx = store.search(vectors[7], 1)
        np.testing.assert_allclose(
            store.reconstruct(int(idx[0][0])), vectors[7], rtol=1e-5
        )


class StaleIvfReloadTest(unittest.TestCase):
    """A reload with the same row count must rebuild the IVF layout."""

    def test_reload_invalidates_ivf(self):
        rng = np.random.default_rng(5)
        with tempfile.TemporaryDirectory() as tmp:
            def make():
                return VectorIndex(
                    dimension=16,
                    index_path=os.path.join(tmp, "ps.index"),
                    metadata_path=os.path.join(tmp, "m.json"),
                    index_type="ivf",
                    ivf_nlist=4,
                    ivf_nprobe=4,
                )

            a_vectors = rng.normal(size=(16, 16)).astype(np.float32)
            vi = make()
            vi.add_batch(a_vectors, [{"photo_path": f"/a/{i}.jpg"} for i in range(16)])
            vi.search(a_vectors[0].tolist(), 1)  # builds IVF for corpus A
            # full rebuild with DIFFERENT vectors but the same count
            b_vectors = rng.normal(size=(16, 16)).astype(np.float32)
            vi.clear()
            vi.add_batch(b_vectors, [{"photo_path": f"/b/{i}.jpg"} for i in range(16)])
            vi.save()
            vi.load()
            hits = vi.search(b_vectors[5].tolist(), 1)
            self.assertEqual(hits[0]["metadata"]["photo_path"], "/b/5.jpg")


class LargeKRoutingTest(unittest.TestCase):
    """k beyond the pallas unroll budget routes to the XLA path and stays
    correct (the searcher passes candidate_k up to ~1000)."""

    def test_large_k_exact(self):
        from photo_search_engine_tpu.ops import exact_search

        rng = np.random.default_rng(6)
        corpus = rng.normal(size=(600, 16)).astype(np.float32)
        queries = rng.normal(size=(2, 16)).astype(np.float32)
        vals, idx = exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 500, impl="pallas"
        )
        scores = queries @ corpus.T
        ref = np.argsort(-scores, axis=1, kind="stable")[:, :500]
        np.testing.assert_array_equal(np.asarray(idx), ref)


if __name__ == "__main__":
    unittest.main()
