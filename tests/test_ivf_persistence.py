"""IVF index persistence: restart must restore the trained index from the
``.ivf.npz`` sidecar without re-running k-means (the faiss.read_index
analogue — reference utils/vector_store.py:239-249 loads the ANN binary in
one call; round-2 verdict missing #2)."""

import os
import tempfile
import unittest
from unittest import mock

import numpy as np

from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.models.ivf import IVFIndex


def _mk(tmp, name="photo_search", **kw):
    return VectorIndex(
        dimension=kw.pop("dimension", 16),
        index_path=os.path.join(tmp, f"{name}.index"),
        metadata_path=os.path.join(tmp, f"{name}-meta.json"),
        metric=kw.pop("metric", "cosine"),
        index_type="ivf",
        **kw,
    )


class IVFStateRoundtripTest(unittest.TestCase):
    """IVFIndex.state()/from_state() restore the exact trained index."""

    def setUp(self):
        rng = np.random.default_rng(0)
        self.corpus = rng.normal(size=(600, 24)).astype(np.float32)
        self.corpus /= np.linalg.norm(self.corpus, axis=1, keepdims=True)
        self.queries = self.corpus[rng.choice(600, 6, replace=False)]

    def test_state_roundtrip_matches_original(self):
        index = IVFIndex.build(self.corpus, nlist=16, seed=3)
        restored = IVFIndex.from_state(self.corpus, index.state())
        for nprobe in (16, 4):
            _, want = index.search(self.queries, 8, nprobe=nprobe)
            _, got = restored.search(self.queries, 8, nprobe=nprobe)
            np.testing.assert_array_equal(got, want)

    def test_restored_index_accepts_appends(self):
        index = IVFIndex.build(self.corpus[:500], nlist=16, seed=3)
        restored = IVFIndex.from_state(self.corpus[:500], index.state())
        delta = self.corpus[500:]
        ids = np.arange(500, 600, dtype=np.int64)
        self.assertTrue(restored.append(delta, ids))
        _, got = restored.search(delta[7], 1, nprobe=16)
        self.assertEqual(int(got[0][0]), 507)

    def test_from_state_rejects_foreign_corpus(self):
        index = IVFIndex.build(self.corpus, nlist=16, seed=3)
        with self.assertRaises(ValueError):
            IVFIndex.from_state(self.corpus[:100], index.state())

    def test_l2_state_roundtrip(self):
        rng = np.random.default_rng(1)
        corpus = rng.normal(size=(400, 16)).astype(np.float32)
        index = IVFIndex.build(corpus, nlist=8, metric="l2", seed=5)
        restored = IVFIndex.from_state(corpus, index.state())
        self.assertEqual(restored.metric, "l2")
        _, want = index.search(corpus[:5], 6, nprobe=8)
        _, got = restored.search(corpus[:5], 6, nprobe=8)
        np.testing.assert_array_equal(got, want)


class SidecarPersistenceTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        rng = np.random.default_rng(2)
        self.vecs = rng.normal(size=(300, 16)).astype(np.float32)

    def tearDown(self):
        self.tmp.cleanup()

    def _fill(self, vi, n=None):
        n = n or self.vecs.shape[0]
        vi.add_batch(
            self.vecs[:n], [{"photo_path": f"/p/{i}.jpg"} for i in range(n)]
        )

    def test_load_restores_without_retraining(self):
        vi = _mk(self.tmp.name, ivf_nlist=8, ivf_nprobe=0)
        self._fill(vi)
        vi.save()
        expected = vi.search(self.vecs[11].tolist(), 5)  # builds + autotunes
        self.assertTrue(os.path.exists(vi.ivf_sidecar_path))
        tuned = vi._ivf_nprobe_auto

        vi2 = _mk(self.tmp.name, ivf_nlist=8, ivf_nprobe=0)
        # restoring must never call the trainers — a restart answers its
        # first query from the persisted index (round-2 verdict: 15-27 s
        # k-means per restart at 1M rows)
        with mock.patch.object(
            IVFIndex, "build", side_effect=AssertionError("retrained!")
        ):
            self.assertTrue(vi2.load())
            self.assertIsNotNone(vi2._ivf)
            self.assertEqual(vi2._ivf_built_at, 300)
            self.assertEqual(vi2._ivf_nprobe_auto, tuned)
            got = vi2.search(self.vecs[11].tolist(), 5)
        self.assertEqual(
            [h["metadata"]["photo_path"] for h in got],
            [h["metadata"]["photo_path"] for h in expected],
        )

    def test_sidecar_written_on_lazy_build_after_save(self):
        # the indexer saves BEFORE any search builds the IVF; the first
        # routed search persists the trained index opportunistically
        vi = _mk(self.tmp.name, ivf_nlist=8)
        self._fill(vi)
        vi.save()
        self.assertFalse(os.path.exists(vi.ivf_sidecar_path))
        vi.search(self.vecs[0].tolist(), 3)
        self.assertTrue(os.path.exists(vi.ivf_sidecar_path))

    def test_stale_sidecar_is_removed_on_save(self):
        vi = _mk(self.tmp.name, ivf_nlist=8)
        self._fill(vi, 200)
        vi.save()
        vi.search(self.vecs[0].tolist(), 3)
        self.assertTrue(os.path.exists(vi.ivf_sidecar_path))
        # grow the corpus past the built point WITHOUT searching, then
        # save: the sidecar no longer matches and must not survive
        vi.add_batch(
            self.vecs[200:], [{"photo_path": f"/p/{i}.jpg"} for i in range(200, 300)]
        )
        vi.save()
        self.assertFalse(os.path.exists(vi.ivf_sidecar_path))
        vi2 = _mk(self.tmp.name, ivf_nlist=8)
        self.assertTrue(vi2.load())
        self.assertIsNone(vi2._ivf)

    def test_corrupt_sidecar_falls_back_to_rebuild(self):
        vi = _mk(self.tmp.name, ivf_nlist=8)
        self._fill(vi)
        vi.save()
        vi.search(self.vecs[0].tolist(), 3)
        with open(vi.ivf_sidecar_path, "wb") as f:
            f.write(b"not an npz")
        vi2 = _mk(self.tmp.name, ivf_nlist=8)
        self.assertTrue(vi2.load())
        self.assertIsNone(vi2._ivf)  # ignored, rebuilds lazily
        hits = vi2.search(self.vecs[11].tolist(), 1)
        self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/11.jpg")

    def test_quantized_flag_consistent_across_restart(self):
        # regression: the lazy build ignored ``quantized`` while the sidecar
        # restore honored it, so an int8+ivf deployment served f32 list
        # scans until its first restart — probing dtype must not depend on
        # process history
        vi = _mk(self.tmp.name, ivf_nlist=8, quantized=True)
        self._fill(vi)
        vi.save()
        expected = vi.search(self.vecs[11].tolist(), 5)
        self.assertTrue(vi._ivf.quantized)

        vi2 = _mk(self.tmp.name, ivf_nlist=8, quantized=True)
        self.assertTrue(vi2.load())
        self.assertIsNotNone(vi2._ivf)
        self.assertTrue(vi2._ivf.quantized)
        got = vi2.search(self.vecs[11].tolist(), 5)
        self.assertEqual(
            [h["metadata"]["photo_path"] for h in got],
            [h["metadata"]["photo_path"] for h in expected],
        )

    def test_incremental_append_refreshes_sidecar(self):
        vi = _mk(self.tmp.name, ivf_nlist=8)
        self._fill(vi, 280)
        vi.save()
        vi.search(self.vecs[0].tolist(), 3)  # build at 280
        vi.add_batch(
            self.vecs[280:], [{"photo_path": f"/p/{i}.jpg"} for i in range(280, 300)]
        )
        vi.save()
        vi.search(self.vecs[285].tolist(), 3)  # extends in place to 300
        vi2 = _mk(self.tmp.name, ivf_nlist=8)
        self.assertTrue(vi2.load())
        self.assertIsNotNone(vi2._ivf)
        self.assertEqual(vi2._ivf_built_at, 300)
        hits = vi2.search(self.vecs[285].tolist(), 1)
        self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/285.jpg")


class MeshSidecarPersistenceTest(unittest.TestCase):
    def test_mesh_restore_without_retraining(self):
        from photo_search_engine_tpu.core.mesh_store import MeshIVFAdapter
        from photo_search_engine_tpu.parallel.sharded_ivf import ShardedIVFIndex

        rng = np.random.default_rng(4)
        vecs = rng.normal(size=(96, 16)).astype(np.float32)
        with tempfile.TemporaryDirectory() as tmp:
            vi = _mk(tmp, mesh_devices=8, ivf_nlist=4, ivf_nprobe=4)
            vi.add_batch(
                vecs, [{"photo_path": f"/p/{i}.jpg"} for i in range(96)]
            )
            vi.save()
            expected = vi.search(vecs[17].tolist(), 3)
            self.assertIsInstance(vi._ivf, MeshIVFAdapter)
            self.assertTrue(os.path.exists(vi.ivf_sidecar_path))

            vi2 = _mk(tmp, mesh_devices=8, ivf_nlist=4, ivf_nprobe=4)
            with mock.patch.object(
                ShardedIVFIndex, "build", side_effect=AssertionError("retrained!")
            ):
                self.assertTrue(vi2.load())
                self.assertIsInstance(vi2._ivf, MeshIVFAdapter)
                got = vi2.search(vecs[17].tolist(), 3)
                # masked probing works on the restored index too
                mask = np.zeros(96, bool)
                mask[40:60] = True
                masked = vi2.search_masked(vecs[45].tolist(), 3, mask)
            self.assertEqual(
                [h["metadata"]["photo_path"] for h in got],
                [h["metadata"]["photo_path"] for h in expected],
            )
            self.assertEqual(vi2.last_route["impl"], "ivf_masked")
            self.assertEqual(
                masked[0]["metadata"]["photo_path"], "/p/45.jpg"
            )

    def test_mesh_sidecar_ignored_by_single_device_load(self):
        # the .npy checkpoint is topology-free; the IVF sidecar is NOT —
        # a mesh-built sidecar must not poison a single-device load
        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(96, 16)).astype(np.float32)
        with tempfile.TemporaryDirectory() as tmp:
            vi = _mk(tmp, mesh_devices=8, ivf_nlist=4, ivf_nprobe=4)
            vi.add_batch(
                vecs, [{"photo_path": f"/p/{i}.jpg"} for i in range(96)]
            )
            vi.save()
            vi.search(vecs[0].tolist(), 1)
            vi2 = _mk(tmp, mesh_devices=0, ivf_nlist=4, ivf_nprobe=4)
            self.assertTrue(vi2.load())
            self.assertIsNone(vi2._ivf)  # rebuilds single-device lazily
            hits = vi2.search(vecs[17].tolist(), 1)
            self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/17.jpg")


if __name__ == "__main__":
    unittest.main()
