"""Segmented durable saves: per-batch durability at O(batch) cost
(SURVEY §7 hard-part 3 — segment flush + metadata commit ordering; the
reference rewrites everything per batch, core/indexer.py:942-956, which is
~6 GB/batch at 1M rows)."""

import json
import os
import tempfile
import unittest

import numpy as np

from photo_search_engine_tpu.core.vector_index import VectorIndex


def _mk(tmp, name="photo_search", **kw):
    return VectorIndex(
        dimension=kw.pop("dimension", 16),
        index_path=os.path.join(tmp, f"{name}.index"),
        metadata_path=os.path.join(tmp, f"{name}-meta.json"),
        metric=kw.pop("metric", "cosine"),
        **kw,
    )


def _metas(lo, hi):
    return [{"photo_path": f"/p/{i}.jpg", "description": f"d{i}"} for i in range(lo, hi)]


class SegmentedSaveTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        rng = np.random.default_rng(0)
        self.vecs = rng.normal(size=(400, 16)).astype(np.float32)

    def tearDown(self):
        self.tmp.cleanup()

    def test_incremental_flush_is_o_batch_not_o_corpus(self):
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:200], _metas(0, 200))
        vi.save_incremental()  # first flush: full save (writes the base)
        base_bytes = os.path.getsize(vi.index_path)
        base_mtime = os.path.getmtime(vi.index_path)
        meta_mtime = os.path.getmtime(vi.metadata_path)
        for lo in range(200, 400, 50):
            vi.add_batch(self.vecs[lo : lo + 50], _metas(lo, lo + 50))
            vi.save_incremental()
        # the base snapshot was NOT rewritten by any of the four flushes
        self.assertEqual(os.path.getsize(vi.index_path), base_bytes)
        self.assertEqual(os.path.getmtime(vi.index_path), base_mtime)
        self.assertEqual(os.path.getmtime(vi.metadata_path), meta_mtime)
        # each segment holds exactly its batch (O(batch) bytes, not O(N))
        seg_sizes = sorted(
            os.path.getsize(os.path.join(vi.segments_dir, n))
            for n in os.listdir(vi.segments_dir)
            if n.endswith(".npy")
        )
        self.assertEqual(len(seg_sizes), 4)
        # 50 rows × 16 dims × 4 bytes (+ npy header) per segment
        self.assertLess(seg_sizes[-1], 50 * 16 * 4 + 512)
        manifest = json.load(open(vi._manifest_path))
        self.assertEqual(manifest["base_count"], 200)
        self.assertEqual(manifest["segments"][-1]["count_after"], 400)

    def test_load_replays_committed_segments(self):
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:100], _metas(0, 100))
        vi.save_incremental()
        for lo in (100, 250):
            hi = lo + 150
            vi.add_batch(self.vecs[lo:hi], _metas(lo, hi))
            vi.save_incremental()

        vi2 = _mk(self.tmp.name)
        self.assertTrue(vi2.load())
        self.assertEqual(vi2.get_total_items(), 400)
        self.assertEqual(len(vi2.metadata), 400)
        self.assertEqual(vi2._durable_count, 400)
        hits = vi2.search(self.vecs[333].tolist(), 1)
        self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/333.jpg")
        # reconstruct-by-path works for segment rows too
        self.assertIsNotNone(vi2.get_embedding_by_photo_path("/p/399.jpg"))
        # a subsequent incremental flush continues the segment chain
        extra = np.random.default_rng(1).normal(size=(10, 16)).astype(np.float32)
        vi2.add_batch(extra, _metas(400, 410))
        vi2.save_incremental()
        manifest = json.load(open(vi2._manifest_path))
        self.assertEqual(manifest["segments"][-1]["count_after"], 410)
        vi3 = _mk(self.tmp.name)
        self.assertTrue(vi3.load())
        self.assertEqual(vi3.get_total_items(), 410)

    def test_full_save_compacts_segments(self):
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:100], _metas(0, 100))
        vi.save_incremental()
        vi.add_batch(self.vecs[100:200], _metas(100, 200))
        vi.save_incremental()
        self.assertTrue(os.path.isdir(vi.segments_dir))
        vi.save()  # compaction: base now holds everything
        self.assertFalse(os.path.isdir(vi.segments_dir))
        vi2 = _mk(self.tmp.name)
        self.assertTrue(vi2.load())
        self.assertEqual(vi2.get_total_items(), 200)

    def test_uncommitted_segment_files_are_invisible(self):
        # crash-mid-flush: segment files exist but the manifest replace
        # never happened — load() must not see the partial rows
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:100], _metas(0, 100))
        vi.save_incremental()
        vi.add_batch(self.vecs[100:150], _metas(100, 150))
        vi.save_incremental()
        manifest = json.load(open(vi._manifest_path))
        # roll the manifest back one commit (as if the replace never ran)
        manifest["segments"].pop()
        with open(vi._manifest_path, "w") as f:
            json.dump(manifest, f)
        vi2 = _mk(self.tmp.name)
        self.assertTrue(vi2.load())
        self.assertEqual(vi2.get_total_items(), 100)

    def test_stale_manifest_over_rewritten_base_is_ignored(self):
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:100], _metas(0, 100))
        vi.save_incremental()
        vi.add_batch(self.vecs[100:150], _metas(100, 150))
        vi.save_incremental()
        manifest_before = json.load(open(vi._manifest_path))
        # a different process rewrites the base (count changes) but leaves
        # the old segment dir behind
        vi.save()
        os.makedirs(vi.segments_dir, exist_ok=True)
        with open(vi._manifest_path, "w") as f:
            json.dump(manifest_before, f)
        vi2 = _mk(self.tmp.name)
        self.assertTrue(vi2.load())
        self.assertEqual(vi2.get_total_items(), 150)  # base only, no replay

    def test_rebuild_over_stale_disk_compacts(self):
        # a fresh process that never load()ed must not append segments onto
        # a base it does not continue
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:300], _metas(0, 300))
        vi.save()
        vi2 = _mk(self.tmp.name)  # fresh rebuild, no load()
        vi2.add_batch(self.vecs[:40], _metas(0, 40))
        vi2.save_incremental()
        self.assertFalse(os.path.isdir(vi2.segments_dir))  # full save ran
        vi3 = _mk(self.tmp.name)
        self.assertTrue(vi3.load())
        self.assertEqual(vi3.get_total_items(), 40)

    def test_corrupt_segment_raises(self):
        vi = _mk(self.tmp.name)
        vi.add_batch(self.vecs[:100], _metas(0, 100))
        vi.save_incremental()
        vi.add_batch(self.vecs[100:150], _metas(100, 150))
        vi.save_incremental()
        seg = json.load(open(vi._manifest_path))["segments"][0]["name"]
        with open(os.path.join(vi.segments_dir, f"{seg}.jsonl"), "w") as f:
            f.write("{\"photo_path\": \"/only/one.jpg\"}\n")
        vi2 = _mk(self.tmp.name)
        with self.assertRaises(ValueError):
            vi2.load()

    def test_segments_on_mesh_store(self):
        vi = _mk(self.tmp.name, mesh_devices=8)
        vi.add_batch(self.vecs[:100], _metas(0, 100))
        vi.save_incremental()
        vi.add_batch(self.vecs[100:160], _metas(100, 160))
        vi.save_incremental()
        vi2 = _mk(self.tmp.name, mesh_devices=8)
        self.assertTrue(vi2.load())
        self.assertEqual(vi2.get_total_items(), 160)
        hits = vi2.search(self.vecs[140].tolist(), 1)
        self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/140.jpg")


class SegmentedIndexerTest(unittest.TestCase):
    """The indexer's per-batch durability goes through save_incremental:
    base written once, segments per batch, compacted by the final save."""

    def test_indexer_batches_flush_segments_then_compact(self):
        from unittest import mock

        with tempfile.TemporaryDirectory() as tmp:
            vi = _mk(tmp)
            rng = np.random.default_rng(3)
            vecs = rng.normal(size=(64, 16)).astype(np.float32)
            base_rewrites = []
            orig_save = VectorIndex.save

            def counting_save(self):
                base_rewrites.append(self.get_total_items())
                return orig_save(self)

            with mock.patch.object(VectorIndex, "save", counting_save):
                # simulate the indexer loop: add batch → save_incremental
                for lo in range(0, 64, 8):
                    vi.add_batch(vecs[lo : lo + 8], _metas(lo, lo + 8))
                    vi.save_incremental()
                vi.save()  # final compaction
            # exactly two full rewrites: the first flush (writes the base)
            # and the final compaction — batches 2..8 were O(batch) segments
            self.assertEqual(base_rewrites, [8, 64])
            vi2 = _mk(tmp)
            self.assertTrue(vi2.load())
            self.assertEqual(vi2.get_total_items(), 64)


if __name__ == "__main__":
    unittest.main()
