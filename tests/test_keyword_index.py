"""Tests for core/keyword_index.py — BM25 + filter contract parity
(reference tests/test_keyword_store.py: filter shapes, score
normalization, doc management)."""

import os
import tempfile
import unittest

from photo_search_engine_tpu.core.keyword_index import KeywordIndex, tokenize


def _doc(path, retrieval_text="", description="照片", **extra):
    doc = {
        "photo_path": path,
        "description": description,
        "retrieval_text": retrieval_text,
        "file_name": os.path.basename(path),
    }
    doc.update(extra)
    return doc


class TokenizeTest(unittest.TestCase):
    def test_ascii_words(self):
        self.assertEqual(tokenize("Beach Sunset_01"), ["beach", "sunset_01"])

    def test_cjk_unigrams_and_bigrams(self):
        self.assertEqual(tokenize("夏天"), ["夏", "天", "夏天"])

    def test_mixed(self):
        tokens = tokenize("beach海边01")
        self.assertIn("beach", tokens)
        self.assertIn("海", tokens)
        self.assertIn("海边", tokens)
        self.assertIn("01", tokens)

    def test_empty(self):
        self.assertEqual(tokenize(None), [])
        self.assertEqual(tokenize("  "), [])


class KeywordSearchTest(unittest.TestCase):
    def setUp(self):
        self.ki = KeywordIndex()
        self.ki.add_document("1", _doc("/p/beach.jpg", "海边 沙滩 日落 photo"))
        self.ki.add_document("2", _doc("/p/city.jpg", "城市 夜景 大楼 photo"))
        self.ki.add_document("3", _doc("/p/dog.jpg", "狗 宠物 草地 photo"))

    def test_requires_mandatory_fields(self):
        with self.assertRaises(ValueError):
            self.ki.add_document("x", {"photo_path": "/x.jpg"})

    def test_search_ranks_matching_doc_first(self):
        hits = self.ki.search("海边 日落")
        self.assertTrue(hits)
        self.assertEqual(hits[0]["photo_path"], "/p/beach.jpg")
        self.assertAlmostEqual(hits[0]["score"], 1.0)

    def test_scores_normalized_to_unit_interval(self):
        hits = self.ki.search("photo 海边")
        for hit in hits:
            self.assertLessEqual(hit["score"], 1.0)
            self.assertGreater(hit["score"], 0.0)

    def test_empty_query_returns_empty(self):
        self.assertEqual(self.ki.search(""), [])
        self.assertEqual(self.ki.search("   "), [])

    def test_no_match_returns_empty(self):
        self.assertEqual(self.ki.search("飞机场"), [])

    def test_overwrite_same_doc_id(self):
        self.ki.add_document("1", _doc("/p/beach.jpg", "雪山 湖泊"))
        hits = self.ki.search("海边 沙滩")
        self.assertNotIn("/p/beach.jpg", [h["photo_path"] for h in hits])
        hits2 = self.ki.search("雪山")
        self.assertEqual(hits2[0]["photo_path"], "/p/beach.jpg")

    def test_phrase_bonus_prefers_contiguous(self):
        ki = KeywordIndex()
        ki.add_document("a", _doc("/p/a.jpg", "red car on road"))
        ki.add_document("b", _doc("/p/b.jpg", "car crashed red light road"))
        hits = ki.search("red car")
        self.assertEqual(hits[0]["photo_path"], "/p/a.jpg")

    def test_clear(self):
        self.ki.clear()
        self.assertEqual(self.ki.count, 0)
        self.assertEqual(self.ki.search("海边"), [])


class FilterTest(unittest.TestCase):
    def setUp(self):
        self.ki = KeywordIndex()
        self.ki.add_document(
            "1",
            _doc(
                "/p/summer_eve.jpg",
                "海边 日落",
                year=2023, month=7, season="夏天", time_period="傍晚",
                datetime="2023-07-15T18:30:00",
            ),
        )
        self.ki.add_document(
            "2",
            _doc(
                "/p/winter_morning.jpg",
                "雪山",
                year=2024, month=1, season="冬天", time_period="早晨",
                datetime="2024-01-10T07:10:00",
            ),
        )
        self.ki.add_document("3", _doc("/p/no_exif.jpg", "室内 聚会"))

    def test_season_filter(self):
        hits = self.ki.search_with_filters(None, {"season": "夏天"})
        self.assertEqual([h["photo_path"] for h in hits], ["/p/summer_eve.jpg"])
        self.assertEqual(hits[0]["score"], 0.5)  # filter-only sentinel

    def test_season_and_time_period(self):
        hits = self.ki.search_with_filters(
            None, {"season": "夏天", "time_period": "傍晚"}
        )
        self.assertEqual(len(hits), 1)
        hits2 = self.ki.search_with_filters(
            None, {"season": "夏天", "time_period": "早晨"}
        )
        self.assertEqual(hits2, [])

    def test_year_month_filter(self):
        hits = self.ki.search_with_filters(None, {"year": 2024, "month": 1})
        self.assertEqual([h["photo_path"] for h in hits], ["/p/winter_morning.jpg"])

    def test_date_range_includes_end_day(self):
        hits = self.ki.search_with_filters(
            None, {"start_date": "2023-07-01", "end_date": "2023-07-15"}
        )
        self.assertEqual([h["photo_path"] for h in hits], ["/p/summer_eve.jpg"])

    def test_date_range_excludes_out_of_range(self):
        hits = self.ki.search_with_filters(
            None, {"start_date": "2023-08-01", "end_date": "2023-12-31"}
        )
        self.assertEqual(hits, [])

    def test_text_plus_filter(self):
        hits = self.ki.search_with_filters("海边", {"season": "夏天"})
        self.assertEqual(hits[0]["photo_path"], "/p/summer_eve.jpg")
        self.assertAlmostEqual(hits[0]["score"], 1.0)
        hits2 = self.ki.search_with_filters("海边", {"season": "冬天"})
        self.assertEqual(hits2, [])

    def test_docs_without_exif_excluded_by_filters(self):
        hits = self.ki.search_with_filters(None, {"year": 2023})
        self.assertNotIn("/p/no_exif.jpg", [h["photo_path"] for h in hits])

    def test_match_all_when_no_query_no_filters(self):
        hits = self.ki.search_with_filters(None, {})
        self.assertEqual(len(hits), 3)
        self.assertTrue(all(h["score"] == 1.0 for h in hits))

    def test_get_filtered_paths(self):
        paths = self.ki.get_filtered_paths({"season": "夏天"})
        self.assertEqual(paths, ["/p/summer_eve.jpg"])
        all_paths = self.ki.get_filtered_paths({})
        self.assertEqual(len(all_paths), 3)


class PersistenceTest(unittest.TestCase):
    def test_save_load_roundtrip(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "kw.json")
            ki = KeywordIndex(path)
            ki.add_document("1", _doc("/p/beach.jpg", "海边 日落", year=2023))
            ki.save()
            ki2 = KeywordIndex(path)
            self.assertTrue(ki2.load())
            self.assertEqual(ki2.count, 1)
            hits = ki2.search("海边")
            self.assertEqual(hits[0]["photo_path"], "/p/beach.jpg")
            hits_f = ki2.search_with_filters(None, {"year": 2023})
            self.assertEqual(len(hits_f), 1)

    def test_load_missing_returns_false(self):
        with tempfile.TemporaryDirectory() as tmp:
            ki = KeywordIndex(os.path.join(tmp, "missing.json"))
            self.assertFalse(ki.load())


if __name__ == "__main__":
    unittest.main()
