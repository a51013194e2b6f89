"""Randomized end-to-end property test: indexer → searcher ground truth.

A random photo library with random EXIF timestamps (and some photos
without EXIF) goes through the REAL pipeline (Indexer with the local
vision backend, device vector store, BM25 keyword index), then
filter-only searches must return EXACTLY the metadata-derived ground
truth — season buckets, time-of-day bands, and year/month ranges,
including the EXIF-only rule (no-EXIF photos never match a time filter;
reference indexer.py:566-617).
"""

import os
import tempfile
import unittest

import numpy as np

from PIL import Image

from photo_search_engine_tpu.api.app import create_app
from photo_search_engine_tpu.core.indexer import Indexer
from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.core.searcher import Searcher
from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.services.query_formatter import QueryFormatter
from photo_search_engine_tpu.services.time_parser import TimeParser
from photo_search_engine_tpu.services.vision import LocalVisionService
from tests.helpers import FakeEmbeddingService

_SEASON_BY_MONTH = {
    1: "冬天", 2: "冬天", 12: "冬天",
    3: "春天", 4: "春天", 5: "春天",
    6: "夏天", 7: "夏天", 8: "夏天",
    9: "秋天", 10: "秋天", 11: "秋天",
}

_PERIOD_BY_HOUR = [
    (0, 5, "凌晨"), (5, 8, "早晨"), (8, 12, "上午"), (12, 14, "中午"),
    (14, 17, "下午"), (17, 19, "傍晚"), (19, 24, "夜晚"),
]


def _period(hour):
    for lo, hi, name in _PERIOD_BY_HOUR:
        if lo <= hour < hi:
            return name
    raise AssertionError(hour)


class EndToEndPropertyTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        photo_dir = os.path.join(self.tmp.name, "photos")
        data_dir = os.path.join(self.tmp.name, "data")
        os.makedirs(photo_dir)
        os.makedirs(data_dir)
        rng = np.random.default_rng(0)

        self.truth = {}  # name -> (year, month, hour) or None
        for i in range(60):
            name = f"p{i:03d}.jpg"
            img = Image.new(
                "RGB", (32, 24), tuple(int(c) for c in rng.integers(0, 255, 3))
            )
            if rng.random() < 0.15:
                img.save(os.path.join(photo_dir, name))
                self.truth[name] = None  # no EXIF
            else:
                year = int(rng.choice([2022, 2023, 2024]))
                month = int(rng.integers(1, 13))
                hour = int(rng.integers(0, 24))
                exif = Image.Exif()
                exif[306] = f"{year}:{month:02d}:15 {hour:02d}:30:00"
                img.save(os.path.join(photo_dir, name), exif=exif)
                self.truth[name] = (year, month, hour)

        embedding = FakeEmbeddingService(dimension=16)
        vector_index = VectorIndex(
            dimension=16,
            index_path=os.path.join(data_dir, "ps.index"),
            metadata_path=os.path.join(data_dir, "metadata.json"),
        )
        keyword_index = KeywordIndex(os.path.join(data_dir, "kw.json"))
        indexer = Indexer(
            photo_dir=photo_dir,
            vector_index=vector_index,
            vision_service=LocalVisionService(),
            embedding_service=embedding,
            keyword_index=keyword_index,
            data_dir=data_dir,
            max_retries=1,
        )
        status = indexer.build_index()
        assert status["status"] == "success", status
        self.searcher = Searcher(
            embedding=embedding,
            time_parser=TimeParser(backend="local"),
            query_formatter=QueryFormatter(backend="local"),
            vector_index=vector_index,
            keyword_index=keyword_index,
            data_dir=data_dir,
        )
        self.searcher.index_loaded = True
        self.searcher._refresh_metadata_cache()
        self.app = create_app(
            {
                "config": {"TOP_K": 60, "DEFAULT_SEARCH_MODE": "balanced"},
                "indexer": indexer,
                "searcher": self.searcher,
                "text_rerank_service": None,
                "visual_rerank_service": None,
            }
        )
        self.client = self.app.test_client()

    def tearDown(self):
        self.tmp.cleanup()

    def _search_names(self, query):
        response = self.client.post(
            "/search_photos", json_body={"query": query, "top_k": 60}
        )
        self.assertEqual(response.status_code, 200)
        payload = response.get_json()
        self.assertEqual(payload["status"], "success")
        return {r["file_name"] for r in payload["results"]}

    def test_season_filters_match_ground_truth(self):
        for season in ("春天", "夏天", "秋天", "冬天"):
            expected = {
                name
                for name, t in self.truth.items()
                if t is not None and _SEASON_BY_MONTH[t[1]] == season
            }
            got = self._search_names(f"{season}的照片")
            self.assertEqual(got, expected, season)

    def test_time_of_day_filters_match_ground_truth(self):
        for period in ("上午", "傍晚", "夜晚"):
            expected = {
                name
                for name, t in self.truth.items()
                if t is not None and _period(t[2]) == period
            }
            got = self._search_names(f"{period}的照片")
            self.assertEqual(got, expected, period)

    def test_combined_season_and_period(self):
        expected = {
            name
            for name, t in self.truth.items()
            if t is not None
            and _SEASON_BY_MONTH[t[1]] == "夏天"
            and _period(t[2]) == "上午"
        }
        got = self._search_names("夏天上午的照片")
        self.assertEqual(got, expected)

    def test_no_exif_photos_never_match_time_filters(self):
        no_exif = {name for name, t in self.truth.items() if t is None}
        self.assertTrue(no_exif)  # the fixture generated some
        for query in ("夏天的照片", "夜晚的照片"):
            self.assertFalse(self._search_names(query) & no_exif, query)


if __name__ == "__main__":
    unittest.main()
