"""Tests for core/vector_index.py + core/embedding_store.py
(reference tests/test_vector_store.py: save/load round-trips, meta
validation, mismatch errors, reconstruct-by-path)."""

import os
import tempfile
import unittest

import numpy as np

from photo_search_engine_tpu.core.embedding_store import EmbeddingStore
from photo_search_engine_tpu.core.vector_index import VectorIndex


def _mk(tmp, metric="cosine", index_type="flat", dimension=32, **kw):
    return VectorIndex(
        dimension=dimension,
        index_path=os.path.join(tmp, "photo_search.index"),
        metadata_path=os.path.join(tmp, "metadata.json"),
        metric=metric,
        index_type=index_type,
        **kw,
    )


class EmbeddingStoreTest(unittest.TestCase):
    def test_append_grow_and_search(self):
        rng = np.random.default_rng(0)
        store = EmbeddingStore(16, metric="ip", block_rows=128)
        all_rows = []
        for _ in range(5):
            batch = rng.normal(size=(7, 16)).astype(np.float32)
            store.append(batch)
            all_rows.append(batch)
        corpus = np.concatenate(all_rows)
        self.assertEqual(store.count, 35)
        self.assertGreaterEqual(store.capacity, 35)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        dists, idx = store.search(q, 5)
        expect = np.argsort(-(q @ corpus.T), axis=1, kind="stable")[:, :5]
        np.testing.assert_array_equal(idx, expect)

    def test_cosine_normalizes_on_append(self):
        store = EmbeddingStore(4, metric="cosine")
        store.append(np.array([[2.0, 0, 0, 0], [0, 3.0, 0, 0]], np.float32))
        dists, idx = store.search(np.array([1.0, 0, 0, 0], np.float32), 2)
        self.assertAlmostEqual(float(dists[0][0]), 1.0, places=5)
        self.assertEqual(int(idx[0][0]), 0)

    def test_reconstruct_and_snapshot(self):
        store = EmbeddingStore(8, metric="ip")
        rows = np.arange(24, dtype=np.float32).reshape(3, 8)
        store.append(rows)
        np.testing.assert_allclose(store.reconstruct(1), rows[1])
        np.testing.assert_allclose(store.snapshot(), rows)

    def test_masked_search(self):
        store = EmbeddingStore(8, metric="ip")
        rng = np.random.default_rng(1)
        corpus = rng.normal(size=(50, 8)).astype(np.float32)
        store.append(corpus)
        mask = np.zeros(50, bool)
        mask[10:20] = True
        _, idx = store.search(corpus[0], 5, mask=mask)
        self.assertTrue(set(idx[0]).issubset(set(range(10, 20))))

    def test_device_mask_cache(self):
        store = EmbeddingStore(8, metric="ip")
        rng = np.random.default_rng(2)
        corpus = rng.normal(size=(40, 8)).astype(np.float32)
        store.append(corpus)
        mask = np.zeros(40, bool)
        mask[:15] = True
        store.search(corpus[0], 3, mask=mask)
        self.assertEqual(len(store._mask_lru), 1)
        cached = next(iter(store._mask_lru.values()))
        # an equal-content mask (different array object) reuses the entry
        store.search(corpus[1], 3, mask=mask.copy())
        self.assertEqual(len(store._mask_lru), 1)
        self.assertIs(next(iter(store._mask_lru.values())), cached)
        # a different mask gets its own entry and correct results
        other = ~mask
        _, idx = store.search(corpus[20], 3, mask=other)
        self.assertEqual(len(store._mask_lru), 2)
        self.assertTrue((idx[0] >= 15).all())
        # growth changes the padded content: appends must not serve a
        # stale device mask that still zeroes the new rows
        store.append(corpus)  # rows 40..79 duplicate 0..39
        _, idx = store.search(corpus[0], 2, mask=np.ones(80, bool))
        self.assertEqual(set(idx[0].tolist()), {0, 40})
        store.clear()
        self.assertEqual(len(store._mask_lru), 0)

    def test_load_device_rows_matches_append(self):
        # the ingest bypass (device-synthesized corpora: bench/load-test
        # path) must serve identical searches to an append-built store
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        corpus = rng.normal(size=(70, 16)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        ref = EmbeddingStore(16, metric="cosine")
        ref.append(corpus)
        store = EmbeddingStore(16, metric="cosine")
        store.load_device_rows(jnp.asarray(corpus))
        self.assertEqual(store.count, 70)
        self.assertEqual(store.capacity % store.block_rows, 0)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        d_ref, i_ref = ref.search(q, 5)
        d_new, i_new = store.search(q, 5)
        np.testing.assert_array_equal(i_new, i_ref)
        np.testing.assert_allclose(d_new, d_ref, rtol=1e-6)
        # lazy host mirror: snapshot/reconstruct download from device
        np.testing.assert_allclose(store.snapshot(), corpus, rtol=1e-6)
        np.testing.assert_allclose(store.reconstruct(7), corpus[7], rtol=1e-6)
        # appends keep working after the bypass
        extra = rng.normal(size=(5, 16)).astype(np.float32)
        store.append(extra)
        self.assertEqual(store.count, 75)
        self.assertEqual(store.snapshot().shape, (75, 16))
        with self.assertRaises(RuntimeError):
            store.load_device_rows(jnp.asarray(corpus))  # non-empty store

    def test_load_device_rows_quantized(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(4)
        corpus = rng.normal(size=(64, 16)).astype(np.float32)
        ref = EmbeddingStore(16, metric="ip", quantized=True)
        ref.append(corpus)
        store = EmbeddingStore(16, metric="ip", quantized=True)
        store.load_device_rows(jnp.asarray(corpus))
        q = rng.normal(size=(2, 16)).astype(np.float32)
        d_ref, i_ref = ref.search(q, 5, impl="int8")
        d_new, i_new = store.search(q, 5, impl="int8")
        np.testing.assert_array_equal(i_new, i_ref)
        np.testing.assert_allclose(d_new, d_ref, rtol=1e-6)


class VectorIndexTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()

    def tearDown(self):
        self.tmp.cleanup()

    def test_add_and_search_shapes(self):
        vi = _mk(self.tmp.name, metric="cosine", dimension=8)
        rng = np.random.default_rng(0)
        for i in range(6):
            vi.add_item(rng.normal(size=8).tolist(), {"photo_path": f"/p/{i}.jpg"})
        results = vi.search(rng.normal(size=8).tolist(), 3)
        self.assertEqual(len(results), 3)
        self.assertIn("metadata", results[0])
        self.assertIn("distance", results[0])

    def test_early_fetch_guard_retries_out_of_range_indices(self):
        # remote-attached runtimes can fetch a result buffer before the
        # computation lands (garbage indices — observed ~0.2% of 1M scans
        # under load); _validated_fetch must re-run once and succeed, and
        # raise if the second fetch is ALSO garbage
        vi = _mk(self.tmp.name, metric="cosine", dimension=8)
        rng = np.random.default_rng(7)
        vi.add_batch(
            rng.normal(size=(20, 8)).astype(np.float32),
            [{"photo_path": f"/p/{i}.jpg"} for i in range(20)],
        )
        real = vi._store.search
        calls = {"n": 0, "bad": 1}

        def flaky(queries, k, mask=None, impl="auto"):
            calls["n"] += 1
            dists, idx = real(queries, k, mask=mask, impl=impl)
            if calls["n"] <= calls["bad"]:
                idx = np.asarray(idx) + 1_000_000  # garbage fetch
            return dists, idx

        vi._store.search = flaky
        vi._FETCH_BACKOFF_S = (0.0, 0.0, 0.0)  # keep the test fast
        hits = vi.search(rng.normal(size=8).tolist(), 3)
        self.assertEqual(len(hits), 3)
        self.assertEqual(calls["n"], 2)  # cleared on the first retry
        for hit in hits:
            self.assertIn("metadata", hit)

        # garbage on EVERY attempt → loud failure, never out-of-range rows
        calls["n"], calls["bad"] = 0, vi._FETCH_ATTEMPTS
        with self.assertRaises(RuntimeError):
            vi.search(rng.normal(size=8).tolist(), 3)
        self.assertEqual(calls["n"], vi._FETCH_ATTEMPTS)

    def test_dimension_mismatch_raises(self):
        vi = _mk(self.tmp.name, dimension=8)
        with self.assertRaises(ValueError):
            vi.add_item([1.0] * 4, {"photo_path": "/x.jpg"})
        vi.add_item([1.0] * 8, {"photo_path": "/x.jpg"})
        with self.assertRaises(ValueError):
            vi.search([1.0] * 4, 3)

    def test_save_load_roundtrip(self):
        vi = _mk(self.tmp.name, dimension=8)
        rng = np.random.default_rng(0)
        vectors = [rng.normal(size=8).tolist() for _ in range(5)]
        for i, vec in enumerate(vectors):
            vi.add_item(vec, {"photo_path": f"/p/{i}.jpg", "description": f"d{i}"})
        expected = vi.search(vectors[0], 3)
        vi.save()

        vi2 = _mk(self.tmp.name, dimension=8)
        self.assertTrue(vi2.load())
        self.assertEqual(vi2.get_total_items(), 5)
        got = vi2.search(vectors[0], 3)
        self.assertEqual(
            [r["metadata"]["photo_path"] for r in got],
            [r["metadata"]["photo_path"] for r in expected],
        )
        # reconstruct-by-path survives reload
        emb = vi2.get_embedding_by_photo_path("/p/2.jpg")
        self.assertEqual(len(emb), 8)

    def test_load_missing_returns_false(self):
        vi = _mk(self.tmp.name)
        self.assertFalse(vi.load())

    def test_quantized_index_matches_plain(self):
        rng = np.random.default_rng(7)
        plain = _mk(self.tmp.name, dimension=32)
        quant = _mk(self.tmp.name, dimension=32, quantized=True)
        # well-separated descriptions: random unit vectors at tiny n have
        # large top-k gaps, so int8 nomination is lossless here
        vectors = rng.normal(size=(40, 32)).astype(np.float32)
        metas = [{"photo_path": f"/p/{i}.jpg"} for i in range(40)]
        plain.add_batch(vectors, list(metas))
        quant.add_batch(vectors, list(metas))
        for q in vectors[:3]:
            expected = plain.search(q.tolist(), 5)
            got = quant.search(q.tolist(), 5)
            self.assertEqual(
                [r["metadata"]["photo_path"] for r in got],
                [r["metadata"]["photo_path"] for r in expected],
            )

    def test_quantized_survives_save_load(self):
        rng = np.random.default_rng(8)
        vi = _mk(self.tmp.name, dimension=16, quantized=True)
        vectors = rng.normal(size=(20, 16)).astype(np.float32)
        vi.add_batch(vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(20)])
        expected = vi.search(vectors[0].tolist(), 3)
        vi.save()
        vi2 = _mk(self.tmp.name, dimension=16, quantized=True)
        self.assertTrue(vi2.load())
        got = vi2.search(vectors[0].tolist(), 3)
        self.assertEqual(
            [r["metadata"]["photo_path"] for r in got],
            [r["metadata"]["photo_path"] for r in expected],
        )
        # the int8 shadow is live after reload
        self.assertIsNotNone(vi2._store._device_i8)

    def test_quantized_masked_search(self):
        rng = np.random.default_rng(9)
        vi = _mk(self.tmp.name, dimension=16, quantized=True)
        vectors = rng.normal(size=(30, 16)).astype(np.float32)
        vi.add_batch(vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(30)])
        mask = np.zeros(30, np.int32)
        mask[:10] = 1
        hits = vi.search_masked(vectors[0].tolist(), 5, mask)
        self.assertTrue(
            all(int(h["metadata"]["photo_path"].split("/")[-1][:-4]) < 10 for h in hits)
        )

    def test_metric_mismatch_raises_on_load(self):
        vi = _mk(self.tmp.name, metric="cosine", dimension=8)
        vi.add_item([1.0] * 8, {"photo_path": "/a.jpg"})
        vi.save()
        vi2 = _mk(self.tmp.name, metric="l2", dimension=8)
        with self.assertRaises(ValueError):
            vi2.load()

    def test_index_type_mismatch_raises_on_load(self):
        vi = _mk(self.tmp.name, index_type="flat", dimension=8)
        vi.add_item([1.0] * 8, {"photo_path": "/a.jpg"})
        vi.save()
        vi2 = _mk(self.tmp.name, index_type="ivf", dimension=8)
        with self.assertRaises(ValueError):
            vi2.load()

    def test_hnsw_maps_to_ivf(self):
        # reference configs use VECTOR_INDEX_TYPE=hnsw (its committed data
        # dir is HNSW); the TPU framework maps it onto the IVF path so a
        # migrated .env works unchanged
        vi = _mk(self.tmp.name, index_type="hnsw", dimension=8)
        self.assertEqual(vi.index_type, "ivf")
        vi.add_item([1.0] * 8, {"photo_path": "/a.jpg"})
        vi.save()
        vi2 = _mk(self.tmp.name, index_type="hnsw", dimension=8)
        self.assertTrue(vi2.load())

    def test_count_mismatch_raises_on_load(self):
        vi = _mk(self.tmp.name, dimension=8)
        vi.add_item([1.0] * 8, {"photo_path": "/a.jpg"})
        vi.add_item([2.0] * 8, {"photo_path": "/b.jpg"})
        vi.save()
        import json

        with open(vi.metadata_path, "w") as f:
            json.dump([{"photo_path": "/a.jpg"}], f)
        vi2 = _mk(self.tmp.name, dimension=8)
        with self.assertRaises(ValueError):
            vi2.load()

    def test_missing_meta_sidecar_raises(self):
        vi = _mk(self.tmp.name, dimension=8)
        vi.add_item([1.0] * 8, {"photo_path": "/a.jpg"})
        vi.save()
        os.remove(vi.meta_path)
        vi2 = _mk(self.tmp.name, dimension=8)
        with self.assertRaises(ValueError):
            vi2.load()

    def test_clear(self):
        vi = _mk(self.tmp.name, dimension=8)
        vi.add_item([1.0] * 8, {"photo_path": "/a.jpg"})
        vi.clear()
        self.assertEqual(vi.get_total_items(), 0)
        self.assertEqual(vi.search([1.0] * 8, 3), [])

    def test_l2_distances_ascending(self):
        vi = _mk(self.tmp.name, metric="l2", dimension=4)
        vi.add_item([0.0, 0, 0, 0], {"photo_path": "/a.jpg"})
        vi.add_item([1.0, 0, 0, 0], {"photo_path": "/b.jpg"})
        vi.add_item([5.0, 0, 0, 0], {"photo_path": "/c.jpg"})
        results = vi.search([0.9, 0, 0, 0], 3)
        paths = [r["metadata"]["photo_path"] for r in results]
        self.assertEqual(paths, ["/b.jpg", "/a.jpg", "/c.jpg"])
        dists = [r["distance"] for r in results]
        self.assertEqual(dists, sorted(dists))

    def test_masked_search_excludes(self):
        vi = _mk(self.tmp.name, metric="cosine", dimension=4)
        rng = np.random.default_rng(3)
        for i in range(10):
            vi.add_item(rng.normal(size=4).tolist(), {"photo_path": f"/p/{i}.jpg"})
        mask = np.zeros(10, bool)
        mask[[2, 5]] = True
        results = vi.search_masked(rng.normal(size=4).tolist(), 5, mask)
        got = {r["metadata"]["photo_path"] for r in results}
        self.assertTrue(got.issubset({"/p/2.jpg", "/p/5.jpg"}))
        self.assertEqual(len(results), 2)


if __name__ == "__main__":
    unittest.main()


class StoreDtypeAutoTest(unittest.TestCase):
    def test_auto_resolves_to_backend_default(self):
        import jax

        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=8,
                index_path=os.path.join(tmp, "i.npy"),
                metadata_path=os.path.join(tmp, "m.json"),
                store_dtype="auto",
            )
            expected = (
                "bfloat16" if jax.default_backend() == "tpu" else "float32"
            )
            self.assertEqual(vi.store_dtype, expected)

    def test_explicit_dtype_passes_through(self):
        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=8,
                index_path=os.path.join(tmp, "i.npy"),
                metadata_path=os.path.join(tmp, "m.json"),
                store_dtype="bfloat16",
            )
            self.assertEqual(vi.store_dtype, "bfloat16")
            vi.add_batch(
                np.ones((4, 8), np.float32),
                [{"photo_path": f"/p/{i}.jpg"} for i in range(4)],
            )
            # persistence stays exact float32 regardless of device dtype
            self.assertEqual(vi._store.snapshot().dtype, np.float32)
