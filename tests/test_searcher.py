"""Tests for core/searcher.py — the behavioral centerpiece
(reference tests/test_searcher.py: score mapping, hybrid fusion, time
strictness, filter-only branch, buckets/backfill, multi-round control)."""

import os
import tempfile
import unittest

import numpy as np

from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.core.searcher import (
    MIN_RESULT_SCORE,
    Searcher,
    check_time_match,
    parse_flexible_date,
)
from photo_search_engine_tpu.core.vector_index import VectorIndex
from tests.helpers import (
    FakeQueryFormatter,
    FakeTimeParser,
    MappedEmbeddingService,
)

DIM = 8


def _unit(*values):
    vec = np.zeros(DIM, np.float32)
    for i, v in enumerate(values):
        vec[i] = v
    norm = np.linalg.norm(vec)
    return (vec / norm if norm else vec).tolist()


def _axis(i):
    vec = np.zeros(DIM, np.float32)
    vec[i] = 1.0
    return vec.tolist()


def _blend(i, j, w):
    """Unit vector leaning toward axis i with weight w toward axis j."""
    vec = np.zeros(DIM, np.float32)
    vec[i] = 1.0
    vec[j] = w
    return (vec / np.linalg.norm(vec)).tolist()


class SearcherFixture(unittest.TestCase):
    """Index of 6 photos along embedding axes with EXIF-derived tags."""

    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        self.vi = VectorIndex(
            dimension=DIM,
            index_path=os.path.join(self.tmp.name, "ps.index"),
            metadata_path=os.path.join(self.tmp.name, "metadata.json"),
        )
        self.ki = KeywordIndex()
        self.photos = {}
        specs = [
            ("beach", 0, "海边 沙滩 日落", {"season": "夏天", "time_period": "傍晚",
                                            "year": 2023, "month": 7,
                                            "datetime_str": "2023-07-15T18:30:00"},
             "2023-07-15T18:30:00", ["photo"], []),
            ("city", 1, "城市 夜景 大楼", {"season": "冬天", "time_period": "夜晚",
                                           "year": 2024, "month": 1,
                                           "datetime_str": "2024-01-10T21:00:00"},
             "2024-01-10T21:00:00", ["photo"], []),
            ("dog", 2, "狗 宠物 草地", {}, None, ["photo"], []),
            ("poster", 3, "电影 海报 宣传", {}, None, ["海报"], []),
            ("alice", 4, "人物 合影 Alice", {}, None, ["photo"], ["Alice"]),
            ("mountain", 5, "雪山 湖泊", {"season": "冬天", "time_period": "上午",
                                          "year": 2024, "month": 2,
                                          "datetime_str": "2024-02-02T10:00:00"},
             "2024-02-02T10:00:00", ["photo"], []),
        ]
        for name, axis, text, time_info, exif_dt, media, identities in specs:
            path = f"/photos/{name}.jpg"
            self.photos[name] = path
            ti = {"year": None, "month": None, "day": None, "hour": None,
                  "season": None, "time_period": None, "weekday": None,
                  "datetime_str": None}
            ti.update(time_info)
            metadata = {
                "photo_path": path,
                "description": text,
                "retrieval_text": text,
                "embedding_text": text,
                "media_types": media,
                "top_tags": text.split(),
                "identity_names": identities,
                "identity_candidates": [],
                "identity_evidence": [],
                "ocr_text": "",
                "index_text_version": 2,
                "exif_data": {"datetime": exif_dt} if exif_dt else {},
                "time_info": ti,
            }
            self.vi.add_item(_axis(axis), metadata)
            self.ki.add_document(
                name,
                {
                    "photo_path": path,
                    "description": text,
                    "retrieval_text": text,
                    "file_name": f"{name}.jpg",
                    "year": ti["year"], "month": ti["month"], "day": ti["day"],
                    "season": ti["season"], "time_period": ti["time_period"],
                    "datetime": ti["datetime_str"],
                },
            )
        self.mapping = {
            "海边 日落": _blend(0, 1, 0.1),
            "城市夜景": _blend(1, 0, 0.1),
            "狗": _axis(2),
            "雪山": _blend(5, 1, 0.1),
        }

    def tearDown(self):
        self.tmp.cleanup()

    def _searcher(self, keyword=True, formatter=None, time_parser=None, **kw):
        searcher = Searcher(
            embedding=MappedEmbeddingService(self.mapping, DIM),
            time_parser=time_parser or FakeTimeParser(),
            vector_index=self.vi,
            keyword_index=self.ki if keyword else None,
            query_formatter=formatter,
            data_dir=self.tmp.name,
            **kw,
        )
        searcher.index_loaded = True
        searcher._refresh_metadata_cache()
        return searcher


class ScoreMappingTest(SearcherFixture):
    def test_cosine_mapping_stretch(self):
        s = self._searcher()
        self.assertEqual(s._distance_to_score(1.0), 1.0)
        self.assertAlmostEqual(s._distance_to_score(0.0), 0.5, places=6)
        self.assertAlmostEqual(s._distance_to_score(0.5), 0.7 + 0.05 * 1.3, places=6)
        self.assertAlmostEqual(s._distance_to_score(-0.6), 0.2 * 0.8, places=6)
        self.assertEqual(s._distance_to_score(2.0), 1.0)  # clamped

    def test_l2_mapping_exp(self):
        s = self._searcher()
        s.metric = "l2"
        self.assertAlmostEqual(s._distance_to_score(0.0), 1.0)
        self.assertAlmostEqual(s._distance_to_score(1.0), float(np.exp(-0.5)), places=5)
        self.assertAlmostEqual(s._distance_to_score(-1.0), 1.0)  # negative clamped


class CandidateKTest(SearcherFixture):
    def test_tiny_dataset_scans_all(self):
        s = self._searcher()
        self.assertEqual(s._calculate_candidate_k(10, False), 6)

    def test_relaxation_inflates(self):
        s = self._searcher()
        base = s._calculate_candidate_k(3, False, relaxation_level=0)
        relaxed = s._calculate_candidate_k(3, False, relaxation_level=2)
        self.assertGreaterEqual(relaxed, base)


class BasicSearchTest(SearcherFixture):
    def test_vector_only_search_ranks_target_first(self):
        s = self._searcher(keyword=False)
        results = s.search("海边 日落", top_k=3)
        self.assertEqual(results[0]["photo_path"], self.photos["beach"])
        self.assertNotIn("metadata", results[0])
        self.assertIn("match_summary", results[0])
        self.assertEqual(results[0]["rank"], 1)

    def test_hybrid_search_fuses_channels(self):
        s = self._searcher()
        results = s.search("海边 日落", top_k=3)
        self.assertEqual(results[0]["photo_path"], self.photos["beach"])
        self.assertIn("vector_score", results[0])
        self.assertIn("keyword_score", results[0])
        # beach hit both channels: renormalized score, no penalty
        self.assertGreater(results[0]["keyword_score"], 0.0)

    def test_no_penalty_for_missing_bm25(self):
        """Vector-only hits must not be dragged down by keyword_score=0."""
        s = self._searcher()
        combined = s._hybrid_search(
            "nonexistent keywords", self.mapping["海边 日落"], 6
        )
        beach = next(c for c in combined if c["photo_path"] == self.photos["beach"])
        # channel renormalization: score == vector score (no keyword dilution)
        self.assertAlmostEqual(beach["score"], beach["vector_score"], places=6)

    def test_keyword_only_penalized_and_weak_dropped(self):
        s = self._searcher()
        # poster matches keywords 电影海报 but its vector is orthogonal to the
        # query embedding; restrict vector candidates so poster is keyword-only
        combined = s._hybrid_search("电影 海报 宣传", _axis(0), 2)
        poster = [c for c in combined if c["photo_path"] == self.photos["poster"]]
        if poster:  # strong keyword hit: kept but ×0.65
            self.assertAlmostEqual(
                poster[0]["score"],
                round(poster[0]["keyword_score"] * 0.65, 6),
                places=5,
            )

    def test_ghost_keyword_doc_excluded(self):
        """Keyword docs with no vector metadata must never surface."""
        self.ki.add_document(
            "ghost",
            {"photo_path": "/photos/deleted.jpg", "description": "海边",
             "retrieval_text": "海边 沙滩 日落"},
        )
        s = self._searcher()
        results = s.search("海边 日落", top_k=6)
        self.assertNotIn("/photos/deleted.jpg", [r["photo_path"] for r in results])

    def test_validate_query(self):
        s = self._searcher()
        self.assertTrue(s.validate_query("海边"))
        self.assertTrue(s.validate_query("ab"))
        self.assertFalse(s.validate_query(""))
        self.assertFalse(s.validate_query("   "))
        self.assertFalse(s.validate_query("!!!"))
        self.assertFalse(s.validate_query("a"))  # single ascii letter
        self.assertFalse(s.validate_query("x" * 501))
        with self.assertRaises(ValueError):
            s.search("!!!")

    def test_search_debug_recorded(self):
        s = self._searcher()
        s.search("海边 日落", top_k=3)
        debug = s.get_last_search_debug()
        self.assertEqual(debug["mode"], "text")
        self.assertEqual(len(debug["rounds"]), 1)
        self.assertEqual(debug["rounds"][0]["round"], "base")
        self.assertIn("embedding_ms", debug["timing"])
        self.assertIn("hybrid_search_ms", debug["timing"])
        self.assertIn("merge_ms", debug["timing"])


class TimeFilterTest(SearcherFixture):
    def _time_parser(self):
        return FakeTimeParser({
            "去年夏天": {"start_date": "2023-06-01", "end_date": "2023-08-31",
                          "precision": "season"},
            "冬天": {"start_date": None, "end_date": None, "precision": "none"},
        })

    def test_date_range_filters_no_keyword_store(self):
        s = self._searcher(keyword=False, time_parser=self._time_parser())
        results = s.search("去年夏天 海边 日落", top_k=6)
        paths = [r["photo_path"] for r in results]
        self.assertIn(self.photos["beach"], paths)
        self.assertNotIn(self.photos["city"], paths)
        # photos without EXIF datetime are excluded from time-filtered results
        self.assertNotIn(self.photos["dog"], paths)

    def test_no_exif_photo_never_matches_time_filter(self):
        self.assertFalse(
            check_time_match({"time_info": {}, "exif_data": {}}, {"season": "夏天"})
        )
        self.assertTrue(
            check_time_match(
                {"time_info": {"season": "夏天"},
                 "exif_data": {"datetime": "2023-07-15T18:30:00"}},
                {"season": "夏天"},
            )
        )

    def test_formatter_season_hint_becomes_filter_with_time_terms(self):
        formatter = FakeQueryFormatter(
            mapping={"冬天雪山": {"search_text": "雪山", "season": "冬天"}}
        )
        s = self._searcher(
            keyword=False, formatter=formatter, time_parser=self._time_parser()
        )
        results = s.search("冬天雪山", top_k=6)
        paths = [r["photo_path"] for r in results]
        self.assertIn(self.photos["mountain"], paths)
        self.assertNotIn(self.photos["beach"], paths)
        self.assertNotIn(self.photos["dog"], paths)  # no EXIF -> excluded

    def test_strict_filter_with_keyword_store_drops_unfiltered_hits(self):
        """With a keyword store, strict filters are enforced by the keyword
        channel: vector hits outside the filtered set are dropped
        (reference searcher.py:925-947 exclusion rule)."""
        formatter = FakeQueryFormatter(
            mapping={"冬天雪山": {"search_text": "雪山", "season": "冬天"}}
        )
        s = self._searcher(formatter=formatter, time_parser=self._time_parser())
        results = s.search("冬天雪山", top_k=6)
        self.assertNotIn(
            self.photos["beach"], [r["photo_path"] for r in results]
        )

    def test_season_hint_ignored_without_time_terms(self):
        formatter = FakeQueryFormatter(
            mapping={"雪山湖景": {"search_text": "雪山", "season": "冬天"}}
        )
        s = self._searcher(formatter=formatter, time_parser=FakeTimeParser())
        results = s.search("雪山湖景", top_k=6)
        # no time terms detected → season hint is visual, not a filter;
        # photos without EXIF stay eligible
        self.assertTrue(results)

    def test_parse_flexible_date_formats(self):
        self.assertIsNotNone(parse_flexible_date("2024:01:01 08:30:00"))
        self.assertIsNotNone(parse_flexible_date("2024-01-01"))
        self.assertIsNotNone(parse_flexible_date("20240101"))
        self.assertIsNone(parse_flexible_date("not a date"))
        end = parse_flexible_date("2024-01-01", is_end_date=True)
        self.assertEqual((end.hour, end.minute, end.second), (23, 59, 59))


class FilterOnlyTest(SearcherFixture):
    def test_filter_only_branch(self):
        formatter = FakeQueryFormatter(
            mapping={"去年夏天的照片": {"search_text": "", "time_hint": "去年夏天"}}
        )
        parser = FakeTimeParser({
            "去年夏天": {"start_date": "2023-06-01", "end_date": "2023-08-31",
                          "precision": "season"},
        })
        s = self._searcher(formatter=formatter, time_parser=parser)
        results = s.search("去年夏天的照片", top_k=6)
        self.assertEqual([r["photo_path"] for r in results], [self.photos["beach"]])
        self.assertEqual(results[0]["score"], 1.0)
        debug = s.get_last_search_debug()
        self.assertEqual(debug["rounds"][0]["reason"], "纯时间过滤查询")

    def test_filter_only_falls_back_to_memory_without_keyword_index(self):
        formatter = FakeQueryFormatter(
            mapping={"去年夏天的照片": {"search_text": "", "time_hint": "去年夏天"}}
        )
        parser = FakeTimeParser({
            "去年夏天": {"start_date": "2023-06-01", "end_date": "2023-08-31",
                          "precision": "season"},
        })
        s = self._searcher(keyword=False, formatter=formatter, time_parser=parser)
        results = s.search("去年夏天的照片", top_k=6)
        self.assertEqual([r["photo_path"] for r in results], [self.photos["beach"]])

    def test_filter_only_without_time_terms_reverts_to_hybrid(self):
        formatter = FakeQueryFormatter(
            mapping={"海边 日落": {"search_text": "", "retrieval_mode": "filter_only",
                                   "time_hint": "x"}}
        )
        s = self._searcher(formatter=formatter, time_parser=FakeTimeParser())
        results = s.search("海边 日落", top_k=3)
        self.assertTrue(results)  # hybrid path ran
        self.assertNotEqual(
            s.get_last_search_debug()["rounds"][0].get("reason"), "纯时间过滤查询"
        )


class BucketsAndBackfillTest(SearcherFixture):
    def test_media_mismatch_demotes_bucket(self):
        s = self._searcher()
        item = {"score": 0.9, "metadata": {"media_types": ["photo"]}}
        bucket = s._assign_bucket(
            item=item, strict_threshold=0.5, broad_threshold=0.3,
            media_terms=["海报"], identity_terms=[], strict_identity_filter=False,
        )
        self.assertEqual(bucket, 2)

    def test_identity_demotion_only_when_strict(self):
        s = self._searcher()
        item = {"score": 0.9, "metadata": {"identity_names": []}}
        soft = s._assign_bucket(
            item=item, strict_threshold=0.5, broad_threshold=0.3,
            media_terms=[], identity_terms=["Alice"], strict_identity_filter=False,
        )
        strict = s._assign_bucket(
            item=item, strict_threshold=0.5, broad_threshold=0.3,
            media_terms=[], identity_terms=["Alice"], strict_identity_filter=True,
        )
        self.assertEqual(soft, 3)
        self.assertEqual(strict, 2)

    def test_fill_to_top_k_backfills_from_fallback(self):
        s = self._searcher()
        primary = [{"photo_path": "/a.jpg"}]
        fallback = [{"photo_path": "/a.jpg"}, {"photo_path": "/b.jpg"},
                    {"photo_path": "/c.jpg"}]
        filled = s._fill_to_top_k(primary, fallback, 3)
        self.assertEqual([f["photo_path"] for f in filled],
                         ["/a.jpg", "/b.jpg", "/c.jpg"])

    def test_round_quality_tracks_fallback_use(self):
        s = self._searcher(keyword=False)
        results = s.search("狗", top_k=5)
        quality = s._get_last_round_quality()
        self.assertEqual(quality["returned_count"], len(results))
        self.assertGreaterEqual(quality["raw_count"], quality["returned_count"])
        self.assertIn("strict_threshold", quality)
        self.assertIn("broad_threshold", quality)
        self.assertIn("fallback_used_count", quality)

    def test_identity_promotion_without_visual_grounding(self):
        s = self._searcher(keyword=False)
        combined = [
            {"photo_path": self.photos["dog"], "score": 0.9,
             "metadata": self.vi.metadata[2], "match_summary": {}},
            {"photo_path": self.photos["alice"], "score": 0.88,
             "metadata": self.vi.metadata[4], "match_summary": {}},
        ]
        results = s._finalize_results(
            combined_results=combined,
            normalized_top_k=2,
            has_filter=False,
            constraints={},
            search_text="",          # no visual grounding
            identity_terms=["alice"],
            strict_identity_filter=True,
        )
        # matched identity reaches the reliable bucket; the higher-scored
        # mismatch is strict-demoted to generalized -> alice outranks dog
        self.assertEqual(results[0]["photo_path"], self.photos["alice"])
        self.assertEqual(results[1]["photo_path"], self.photos["dog"])


class FloorsTest(SearcherFixture):
    def test_floors_relax_until_minimums(self):
        s = self._searcher()
        strict0, broad0 = s._round_score_floors(0)
        self.assertEqual(strict0, MIN_RESULT_SCORE)
        self.assertAlmostEqual(broad0, MIN_RESULT_SCORE - 0.12)
        strict3, _ = s._round_score_floors(3)
        self.assertEqual(strict3, max(0.22, MIN_RESULT_SCORE - 0.24))
        strict_inf, broad_inf = s._round_score_floors(99)
        self.assertEqual(strict_inf, 0.22)
        self.assertEqual(broad_inf, 0.12)

    def test_max_relaxation_rounds_counts_until_floor(self):
        s = self._searcher()
        rounds = s._max_relaxation_rounds_until_floor(1)
        self.assertGreaterEqual(rounds, 1)
        # after the floor bottoms out further levels change nothing
        level = 1 + rounds
        self.assertEqual(s._round_score_floors(level), s._round_score_floors(level + 1))


class MultiRoundTest(SearcherFixture):
    def _weak_mapping(self):
        """Query text maps far from every doc so round 1 is weak."""
        far = np.zeros(DIM, np.float32)
        far[6] = 1.0
        return {"难找的东西": far.tolist(), "换个说法": self.mapping["海边 日落"]}

    def test_expansion_triggered_on_weak_results(self):
        self.mapping.update(self._weak_mapping())
        formatter = FakeQueryFormatter(
            mapping={"难找的东西": {"search_text": "难找的东西"}},
            expansion_mapping={
                "难找的东西": [{"search_text": "换个说法", "contract_satisfied": True}]
            },
        )
        s = self._searcher(
            formatter=formatter,
            query_multi_round_enabled=True,
            query_expansion_enabled=True,
        )
        results = s.search("难找的东西", top_k=3, search_mode="high_recall")
        debug = s.get_last_search_debug()
        self.assertTrue(debug["expansion_triggered"])
        self.assertEqual(len(debug["alternatives"]), 1)
        self.assertIn(self.photos["beach"], [r["photo_path"] for r in results])
        round_names = [r["round"] for r in debug["rounds"]]
        self.assertEqual(round_names, ["base", "expansion"])

    def test_expansion_skipped_when_results_strong(self):
        formatter = FakeQueryFormatter(
            mapping={"海边 日落": {"search_text": "海边 日落"}},
            expansion_mapping={"海边 日落": [{"search_text": "alt"}]},
        )
        s = self._searcher(
            keyword=False,
            formatter=formatter,
            query_multi_round_enabled=True,
        )
        s.search("海边 日落", top_k=1, search_mode="high_recall")
        debug = s.get_last_search_debug()
        # top hit scores 1.0 with full top_k -> no expansion
        self.assertFalse(debug["expansion_triggered"])
        self.assertEqual(formatter.expand_calls, [])

    def test_expansion_not_run_outside_high_recall(self):
        self.mapping.update(self._weak_mapping())
        formatter = FakeQueryFormatter(
            mapping={"难找的东西": {"search_text": "难找的东西"}},
            expansion_mapping={"难找的东西": [{"search_text": "换个说法"}]},
        )
        s = self._searcher(formatter=formatter, query_multi_round_enabled=True)
        s.search("难找的东西", top_k=3, search_mode="balanced")
        self.assertEqual(formatter.expand_calls, [])

    def test_strict_contract_blocks_unsatisfied_alternatives(self):
        self.mapping.update(self._weak_mapping())
        formatter = FakeQueryFormatter(
            mapping={"难找的东西": {"search_text": "难找的东西",
                                     "intent_mode": "strict"}},
            expansion_mapping={
                "难找的东西": [
                    {"search_text": "换个说法", "contract_satisfied": False},
                ]
            },
        )
        s = self._searcher(
            formatter=formatter,
            query_multi_round_enabled=True,
        )
        s.search("难找的东西", top_k=3, search_mode="high_recall")
        debug = s.get_last_search_debug()
        # the alternative violates the contract: no expansion round ran
        self.assertEqual(debug["alternatives"], [])

    def test_reflection_round_runs_and_merges(self):
        self.mapping.update(self._weak_mapping())
        formatter = FakeQueryFormatter(
            mapping={"难找的东西": {"search_text": "难找的东西"}},
            reflection_mapping={
                "难找的东西": {"search_text": "换个说法", "reason": "语义改写"}
            },
        )
        s = self._searcher(
            formatter=formatter,
            query_multi_round_enabled=True,
            query_expansion_enabled=True,  # reflection runs after expansion
            query_reflection_enabled=True,
            query_max_reflection_rounds=2,
        )
        results = s.search("难找的东西", top_k=3, search_mode="high_recall")
        debug = s.get_last_search_debug()
        self.assertTrue(debug["reflection_triggered"])
        self.assertEqual(debug["reflection_reason"], "语义改写")
        self.assertIn(self.photos["beach"], [r["photo_path"] for r in results])

    def test_reflection_repeated_intent_stops(self):
        self.mapping.update(self._weak_mapping())
        far_text = {"search_text": "难找的东西"}  # same intent every time
        formatter = FakeQueryFormatter(
            mapping={"难找的东西": far_text},
            reflection_mapping={"难找的东西": dict(far_text)},
        )
        s = self._searcher(
            formatter=formatter,
            query_multi_round_enabled=True,
            query_expansion_enabled=True,
            query_reflection_enabled=True,
            query_max_reflection_rounds=5,
        )
        s.search("难找的东西", top_k=3, search_mode="high_recall")
        # reflection intent identical to itself across rounds → dedup stops it
        self.assertLessEqual(len(formatter.reflect_calls), 2)

    def test_reflection_disabled_by_flag(self):
        self.mapping.update(self._weak_mapping())
        formatter = FakeQueryFormatter(
            mapping={"难找的东西": {"search_text": "难找的东西"}},
            reflection_mapping={"难找的东西": {"search_text": "换个说法"}},
        )
        s = self._searcher(
            formatter=formatter,
            query_multi_round_enabled=True,
            query_expansion_enabled=True,
            query_reflection_enabled=False,
        )
        s.search("难找的东西", top_k=3, search_mode="high_recall")
        self.assertEqual(formatter.reflect_calls, [])


class ImageSearchTest(SearcherFixture):
    def test_search_by_image_path_excludes_self(self):
        s = self._searcher(keyword=False)
        results = s.search_by_image_path(self.photos["beach"], top_k=3)
        paths = [r["photo_path"] for r in results]
        self.assertNotIn(self.photos["beach"], paths)
        self.assertEqual(len(results), 3)
        self.assertNotIn("metadata", results[0])
        self.assertEqual(s.get_last_search_debug()["mode"], "image_path")

    def test_search_by_image_path_unknown_raises(self):
        s = self._searcher(keyword=False)
        with self.assertRaises(ValueError):
            s.search_by_image_path("/photos/unknown.jpg", top_k=3)

    def test_search_by_image_path_relative_raises(self):
        s = self._searcher(keyword=False)
        with self.assertRaises(ValueError):
            s.search_by_image_path("relative.jpg", top_k=3)

    def test_search_by_uploaded_image(self):
        s = self._searcher(keyword=False)
        upload = os.path.join(self.tmp.name, "upload.jpg")
        with open(upload, "wb") as f:
            f.write(b"fake")
        analysis = {"retrieval_text": "海边 日落"}
        results = s.search_by_uploaded_image(upload, analysis, top_k=3)
        self.assertEqual(results[0]["photo_path"], self.photos["beach"])
        self.assertEqual(s.get_last_search_debug()["mode"], "uploaded_image")

    def test_uploaded_image_empty_analysis_raises(self):
        s = self._searcher(keyword=False)
        upload = os.path.join(self.tmp.name, "upload.jpg")
        with open(upload, "wb") as f:
            f.write(b"fake")
        with self.assertRaises(ValueError):
            s.search_by_uploaded_image(upload, {}, top_k=3)


class CacheTest(SearcherFixture):
    def test_query_intent_cache_hits(self):
        formatter = FakeQueryFormatter(mapping={"海边 日落": {"search_text": "海边 日落"}})
        s = self._searcher(formatter=formatter)
        s.search("海边 日落", top_k=3)
        s.search("海边 日落", top_k=3)
        self.assertEqual(len(formatter.format_calls), 1)

    def test_embedding_cache_lru_eviction(self):
        s = self._searcher(keyword=False, embedding_cache_size=2)
        s._generate_embedding("a1")
        s._generate_embedding("b2")
        s._generate_embedding("a1")  # refresh a1
        s._generate_embedding("c3")  # evicts b2
        self.assertIn("a1", s._embedding_cache)
        self.assertNotIn("b2", s._embedding_cache)

    def test_weights_must_sum_to_one(self):
        with self.assertRaises(ValueError):
            Searcher(
                embedding=MappedEmbeddingService({}, DIM),
                time_parser=FakeTimeParser(),
                vector_index=self.vi,
                vector_weight=0.5,
                keyword_weight=0.3,
            )


if __name__ == "__main__":
    unittest.main()
