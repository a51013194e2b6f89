"""Tests for core/indexer.py (reference tests/test_indexer.py: scan/sort,
build gates, schema auto-rebuild, incremental add-only-new, background
modes, stale-lock recovery, EXIF-only time tags, timing log)."""

import json
import os
import tempfile
import time
import unittest

from PIL import Image

from photo_search_engine_tpu.core.indexer import Indexer, extract_time_info
from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.services.analysis import INDEX_TEXT_VERSION
from tests.helpers import FakeEmbeddingService, FakeVisionService


def _make_photo(directory, name, exif_dt=None, size=(32, 24)):
    path = os.path.join(directory, name)
    img = Image.new("RGB", size, (10, 200, 120))
    if exif_dt:
        exif = Image.Exif()
        exif[306] = exif_dt
        img.save(path, exif=exif)
    else:
        img.save(path)
    return path


class TimeInfoTest(unittest.TestCase):
    def test_full_bands(self):
        cases = [
            ("2023-07-15T18:30:00", "夏天", "傍晚"),
            ("2023-01-05T03:00:00", "冬天", "凌晨"),
            ("2023-04-01T09:30:00", "春天", "上午"),
            ("2023-10-10T13:00:00", "秋天", "中午"),
            ("2023-12-31T21:00:00", "冬天", "夜晚"),
            ("2023-06-01T06:00:00", "夏天", "早晨"),
            ("2023-09-09T15:00:00", "秋天", "下午"),
        ]
        for dt, season, period in cases:
            info = extract_time_info({"datetime": dt})
            self.assertEqual(info["season"], season, dt)
            self.assertEqual(info["time_period"], period, dt)
            self.assertIsNotNone(info["weekday"])

    def test_no_exif_no_tags_even_with_file_time(self):
        info = extract_time_info(None, "2023-07-15T18:30:00")
        self.assertIsNone(info["year"])
        self.assertIsNone(info["season"])
        info2 = extract_time_info({"datetime": None}, "2023-07-15T18:30:00")
        self.assertIsNone(info2["season"])


class IndexerTestBase(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        self.photo_dir = os.path.join(self.tmp.name, "photos")
        self.data_dir = os.path.join(self.tmp.name, "data")
        os.makedirs(self.photo_dir)
        os.makedirs(self.data_dir)

    def tearDown(self):
        self.tmp.cleanup()

    def _indexer(self, vision=None, keyword=True, batch_size=3, **kw):
        vector_index = VectorIndex(
            dimension=32,
            index_path=os.path.join(self.data_dir, "photo_search.index"),
            metadata_path=os.path.join(self.data_dir, "metadata.json"),
        )
        keyword_index = (
            KeywordIndex(os.path.join(self.data_dir, "kw.json")) if keyword else None
        )
        indexer = Indexer(
            photo_dir=self.photo_dir,
            vector_index=vector_index,
            vision_service=vision or FakeVisionService(),
            embedding_service=FakeEmbeddingService(dimension=32),
            keyword_index=keyword_index,
            batch_size=batch_size,
            max_retries=1,
            data_dir=self.data_dir,
        )
        return indexer


class ScanTest(IndexerTestBase):
    def test_scan_sorted_by_mtime_and_filters_invalid(self):
        a = _make_photo(self.photo_dir, "b_second.jpg")
        time.sleep(0.02)
        b = _make_photo(self.photo_dir, "a_first.jpg")
        with open(os.path.join(self.photo_dir, "notes.txt"), "w") as f:
            f.write("x")
        nested_dir = os.path.join(self.photo_dir, "nested")
        os.makedirs(nested_dir)
        c = _make_photo(nested_dir, "c_third.jpg")
        indexer = self._indexer()
        paths = indexer.scan_photos()
        self.assertEqual(paths, [a, b, c])

    def test_scan_missing_dir(self):
        indexer = self._indexer()
        indexer.photo_dir = os.path.join(self.tmp.name, "nope")
        self.assertEqual(indexer.scan_photos(), [])


class BuildTest(IndexerTestBase):
    def test_successful_build_writes_everything(self):
        for i in range(4):
            _make_photo(self.photo_dir, f"beach_{i}.jpg", exif_dt="2023:07:15 18:30:00")
        indexer = self._indexer()
        status = indexer.build_index()
        self.assertEqual(status["status"], "success")
        self.assertEqual(status["indexed_count"], 4)
        self.assertEqual(indexer.vector_index.get_total_items(), 4)
        self.assertEqual(indexer.keyword_index.count, 4)
        meta = indexer.vector_index.metadata[0]
        self.assertEqual(meta["index_text_version"], INDEX_TEXT_VERSION)
        self.assertEqual(meta["time_info"]["season"], "夏天")
        self.assertEqual(meta["time_info"]["time_period"], "傍晚")
        # artifacts on disk
        self.assertTrue(os.path.exists(indexer.vector_index.index_path))
        self.assertTrue(os.path.exists(os.path.join(self.data_dir, "index_ready.marker")))
        self.assertTrue(os.path.exists(os.path.join(self.data_dir, "index_timing.jsonl")))
        # keyword doc has EXIF filter fields
        hits = indexer.keyword_index.search_with_filters(None, {"season": "夏天"})
        self.assertEqual(len(hits), 4)

    def test_empty_dir_fails(self):
        indexer = self._indexer()
        status = indexer.build_index()
        self.assertEqual(status["status"], "failed")

    def test_fallback_ratio_gate(self):
        for i in range(4):
            _make_photo(self.photo_dir, f"p_{i}.jpg")
        vision = FakeVisionService(
            fail_paths={os.path.join(self.photo_dir, "p_0.jpg")}
        )
        indexer = self._indexer(vision=vision)
        status = indexer.build_index()
        # 1 of 4 photos used fallback -> ratio 0.25 >= 0.1 -> failed
        self.assertEqual(status["status"], "failed")
        self.assertGreaterEqual(status["fallback_ratio"], 0.1)

    def test_incremental_adds_only_new(self):
        first = [_make_photo(self.photo_dir, f"x_{i}.jpg") for i in range(3)]
        indexer = self._indexer()
        self.assertEqual(indexer.build_index()["status"], "success")
        vision = FakeVisionService()
        indexer2 = self._indexer(vision=vision)
        _make_photo(self.photo_dir, "new_photo.jpg")
        status = indexer2.build_index()
        self.assertEqual(status["status"], "success")
        self.assertEqual(status["indexed_count"], 4)
        # only the new photo went through vision
        self.assertEqual(len(vision.calls), 1)
        self.assertIn("new_photo", vision.calls[0])
        del first

    def test_incremental_noop_when_no_new(self):
        _make_photo(self.photo_dir, "only.jpg")
        indexer = self._indexer()
        indexer.build_index()
        indexer2 = self._indexer()
        status = indexer2.build_index()
        self.assertEqual(status["status"], "success")
        self.assertIn("最新", status["message"])

    def test_schema_version_mismatch_triggers_full_rebuild(self):
        _make_photo(self.photo_dir, "old.jpg")
        indexer = self._indexer()
        indexer.build_index()
        # corrupt the schema version on disk
        with open(indexer.vector_index.metadata_path, "r") as f:
            metadata = json.load(f)
        metadata[0]["index_text_version"] = INDEX_TEXT_VERSION - 1
        with open(indexer.vector_index.metadata_path, "w") as f:
            json.dump(metadata, f)
        vision = FakeVisionService()
        indexer2 = self._indexer(vision=vision)
        status = indexer2.build_index()
        self.assertEqual(status["status"], "success")
        # cached analyses were reused: vision NOT called again
        self.assertEqual(len(vision.calls), 0)
        self.assertEqual(
            indexer2.vector_index.metadata[0]["index_text_version"], INDEX_TEXT_VERSION
        )

    def test_force_rebuild_clears(self):
        _make_photo(self.photo_dir, "a.jpg")
        indexer = self._indexer()
        indexer.build_index()
        status = indexer.build_index(force_rebuild=True)
        self.assertEqual(status["status"], "success")
        self.assertEqual(indexer.vector_index.get_total_items(), 1)

    def test_no_keyword_index_still_builds(self):
        _make_photo(self.photo_dir, "a.jpg")
        indexer = self._indexer(keyword=False)
        self.assertEqual(indexer.build_index()["status"], "success")


class LockAndStatusTest(IndexerTestBase):
    def test_lock_prevents_concurrent_build(self):
        _make_photo(self.photo_dir, "a.jpg")
        indexer = self._indexer()
        self.assertTrue(indexer._create_lock())
        status = indexer.build_index()
        self.assertEqual(status["status"], "processing")
        indexer._release_lock()

    def test_stale_lock_reaped_and_status_failed(self):
        _make_photo(self.photo_dir, "a.jpg")
        indexer = self._indexer()
        # dead pid lock
        with open(indexer._lock_path, "w") as f:
            json.dump({"pid": 999999999, "created_at": "x", "updated_at": "x"}, f)
        indexer._write_status_file({**indexer._status, "status": "processing"})
        status = indexer.get_status()
        self.assertEqual(status["status"], "failed")
        self.assertFalse(os.path.exists(indexer._lock_path))

    def test_live_lock_reports_processing(self):
        indexer = self._indexer()
        with open(indexer._lock_path, "w") as f:
            json.dump({"pid": os.getpid(), "created_at": "x", "updated_at": "x"}, f)
        status = indexer.get_status()
        self.assertEqual(status["status"], "processing")
        indexer._release_lock()

    def test_background_thread_mode(self):
        _make_photo(self.photo_dir, "a.jpg")
        indexer = self._indexer()
        status = indexer.start_build_in_background()
        self.assertEqual(status["status"], "processing")
        deadline = time.time() + 30
        while time.time() < deadline:
            if indexer.get_status()["status"] in {"success", "ready", "failed"}:
                break
            time.sleep(0.05)
        final = indexer.get_status()
        self.assertIn(final["status"], {"success", "ready"})
        self.assertEqual(indexer.vector_index.get_total_items(), 1)

    def test_exif_coverage_stat(self):
        _make_photo(self.photo_dir, "with_exif.jpg", exif_dt="2023:07:15 10:00:00")
        _make_photo(self.photo_dir, "without.jpg")
        indexer = self._indexer()
        indexer.build_index()
        status = indexer.get_status()
        self.assertAlmostEqual(status["exif_coverage"], 0.5)

    def test_timing_log_events(self):
        _make_photo(self.photo_dir, "a.jpg")
        indexer = self._indexer()
        indexer.build_index()
        events = []
        with open(indexer._timing_log_path) as f:
            for line in f:
                events.append(json.loads(line)["event"])
        self.assertIn("build_started", events)
        self.assertIn("photo_timing", events)
        self.assertIn("build_finished", events)


if __name__ == "__main__":
    unittest.main()
