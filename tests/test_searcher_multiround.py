"""Additional multi-round controller parity tests
(reference tests/test_searcher.py:976-2460 scenarios)."""

import os
import tempfile
import unittest

import numpy as np

from photo_search_engine_tpu.core.searcher import Searcher
from photo_search_engine_tpu.core.vector_index import VectorIndex
from tests.helpers import (
    FakeQueryFormatter,
    FakeTimeParser,
    MappedEmbeddingService,
)

DIM = 8


def _axis(i):
    vec = np.zeros(DIM, np.float32)
    vec[i] = 1.0
    return vec.tolist()


class MultiRoundFixture(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        self.vi = VectorIndex(
            dimension=DIM,
            index_path=os.path.join(self.tmp.name, "ps.index"),
            metadata_path=os.path.join(self.tmp.name, "metadata.json"),
        )
        self.paths = []
        for i in range(6):
            path = f"/photos/p{i}.jpg"
            self.paths.append(path)
            self.vi.add_item(
                _axis(i),
                {
                    "photo_path": path,
                    "description": f"doc {i}",
                    "retrieval_text": f"doc {i}",
                    "media_types": ["photo"],
                    "identity_names": [],
                    "time_info": {},
                    "exif_data": {},
                },
            )
        far = np.zeros(DIM, np.float32)
        far[6] = 1.0
        self.mapping = {
            "difficult": far.tolist(),
            "hits0": _axis(0),
            "hits1": _axis(1),
            "hits2": _axis(2),
        }

    def tearDown(self):
        self.tmp.cleanup()

    def _searcher(self, formatter, **kw):
        searcher = Searcher(
            embedding=MappedEmbeddingService(self.mapping, DIM),
            time_parser=FakeTimeParser(),
            vector_index=self.vi,
            query_formatter=formatter,
            data_dir=self.tmp.name,
            query_multi_round_enabled=True,
            **kw,
        )
        searcher.index_loaded = True
        searcher._refresh_metadata_cache()
        return searcher

    def test_zero_reflection_cap_means_iterate_until_no_progress(self):
        """max_reflection_rounds=0 → auto rounds bounded by the relaxation
        floor schedule (reference 2119-2252)."""
        formatter = FakeQueryFormatter(
            mapping={"difficult": {"search_text": "difficult"}},
            reflection_mapping={"difficult": {"search_text": "difficult"}},
        )
        s = self._searcher(
            formatter,
            query_expansion_enabled=True,
            query_reflection_enabled=True,
            query_max_reflection_rounds=0,
        )
        s.search("difficult", top_k=5, search_mode="high_recall")
        # reflection intents dedup by signature: called once, then stopped
        self.assertGreaterEqual(len(formatter.reflect_calls), 1)
        max_auto = s._max_relaxation_rounds_until_floor(2)
        self.assertLessEqual(len(formatter.reflect_calls), max_auto)

    def test_reflection_merge_keeps_existing_when_sparse(self):
        """A sparse reflected round must not wipe previously-found results
        (reference 2253-2460)."""
        formatter = FakeQueryFormatter(
            mapping={"difficult": {"search_text": "hits0"}},
            expansion_mapping={
                "difficult": [{"search_text": "hits1", "contract_satisfied": True}]
            },
            reflection_mapping={"difficult": {"search_text": "hits2"}},
        )
        s = self._searcher(
            formatter,
            query_expansion_enabled=True,
            query_reflection_enabled=True,
            query_max_reflection_rounds=1,
        )
        results = s.search("difficult", top_k=5, search_mode="high_recall")
        got = {r["photo_path"] for r in results}
        # base found p0, expansion found p1, reflection found p2 — merged
        self.assertIn(self.paths[0], got)
        self.assertIn(self.paths[1], got)
        self.assertIn(self.paths[2], got)

    def test_expansion_runs_to_fill_count_even_with_strong_top(self):
        """Strong top score but fewer than top_k results still expands
        (reference 976-1062)."""
        formatter = FakeQueryFormatter(
            mapping={"hits0": {"search_text": "hits0"}},
            expansion_mapping={
                "hits0": [{"search_text": "hits1", "contract_satisfied": True}]
            },
        )
        s = self._searcher(formatter, query_expansion_enabled=True)
        # top_k beyond corpus size -> count-fill trigger with strong quality
        results = s.search("hits0", top_k=10, search_mode="high_recall")
        debug = s.get_last_search_debug()
        self.assertTrue(debug["expansion_triggered"])
        self.assertIn("数量不足", debug["expansion_reason"])
        self.assertGreaterEqual(len(results), 2)

    def test_debug_round_entries_for_expansion(self):
        formatter = FakeQueryFormatter(
            mapping={"difficult": {"search_text": "difficult"}},
            expansion_mapping={
                "difficult": [
                    {"search_text": "hits0", "contract_satisfied": True,
                     "reason": "改写一"},
                    {"search_text": "hits1", "contract_satisfied": True,
                     "reason": "改写二"},
                ]
            },
        )
        s = self._searcher(formatter, query_expansion_enabled=True,
                           query_expansion_max_alternatives=2)
        s.search("difficult", top_k=3, search_mode="high_recall")
        debug = s.get_last_search_debug()
        rounds = debug["rounds"]
        self.assertEqual([r["round"] for r in rounds], ["base", "expansion", "expansion"])
        self.assertEqual(rounds[1]["reason"], "改写一")
        self.assertEqual(rounds[2]["reason"], "改写二")
        self.assertEqual(len(debug["alternatives"]), 2)

    def test_expansion_cap_zero_uses_floor_schedule(self):
        formatter = FakeQueryFormatter(
            mapping={"difficult": {"search_text": "difficult"}},
            expansion_mapping={
                "difficult": [{"search_text": f"alt{i}"} for i in range(10)]
            },
        )
        s = self._searcher(formatter, query_expansion_enabled=True,
                           query_expansion_max_alternatives=0)
        s.search("difficult", top_k=3, search_mode="high_recall")
        debug = s.get_last_search_debug()
        auto_cap = s._max_relaxation_rounds_until_floor(1)
        self.assertLessEqual(len(debug["alternatives"]), auto_cap)
        self.assertGreater(len(debug["alternatives"]), 0)


if __name__ == "__main__":
    unittest.main()


class DeviceMaskedFilterTest(unittest.TestCase):
    """Selective time filters must not starve the candidate set: the
    no-keyword path rides the filter as a device mask inside the scan
    (the reference's over-fetch heuristic would return nothing here)."""

    def test_selective_filter_recall(self):
        import tempfile as _tempfile

        tmp = _tempfile.TemporaryDirectory()
        self.addCleanup(tmp.cleanup)
        vi = VectorIndex(
            dimension=DIM,
            index_path=os.path.join(tmp.name, "ps.index"),
            metadata_path=os.path.join(tmp.name, "m.json"),
        )
        rng = np.random.default_rng(0)
        query_vec = np.zeros(DIM, np.float32); query_vec[0] = 1.0
        # 600 docs: ranks 0..599 by similarity to the query; ONLY the two
        # least similar docs carry the summer tag
        n = 600
        for i in range(n):
            vec = np.zeros(DIM, np.float32)
            vec[0] = 1.0 - i * 0.001
            vec[1] = np.sqrt(max(0.0, 1 - vec[0] ** 2))
            summer = i >= n - 2
            vi.add_item(
                vec.tolist(),
                {
                    "photo_path": f"/p/{i}.jpg",
                    "description": f"doc {i}",
                    "retrieval_text": f"doc {i}",
                    "media_types": ["photo"],
                    "identity_names": [],
                    "time_info": {"season": "夏天"} if summer else {},
                    "exif_data": {"datetime": "2023-07-01T10:00:00"} if summer else {},
                },
            )
        parser = FakeTimeParser({
            "夏天": {"start_date": None, "end_date": None, "precision": "none"},
        })
        formatter = FakeQueryFormatter(
            mapping={"夏天 目标": {"search_text": "目标", "season": "夏天"}}
        )
        searcher = Searcher(
            embedding=MappedEmbeddingService({"目标": query_vec.tolist()}, DIM),
            time_parser=parser,
            vector_index=vi,
            query_formatter=formatter,
            data_dir=tmp.name,
        )
        searcher.index_loaded = True
        searcher._refresh_metadata_cache()
        results = searcher.search("夏天 目标", top_k=5)
        paths = {r["photo_path"] for r in results}
        # candidate_k would be ~50 of 600; the two summer docs rank ~#598
        # and are only reachable because the mask rides the device scan
        self.assertEqual(paths, {"/p/598.jpg", "/p/599.jpg"})


class MaskCacheInvalidationTest(unittest.TestCase):
    """A rebuild with the SAME row count must not serve a stale predicate
    mask (review-confirmed staleness scenario)."""

    def test_rebuild_same_count_refreshes_mask(self):
        import tempfile as _tempfile

        tmp = _tempfile.TemporaryDirectory()
        self.addCleanup(tmp.cleanup)
        vi = VectorIndex(
            dimension=DIM,
            index_path=os.path.join(tmp.name, "ps.index"),
            metadata_path=os.path.join(tmp.name, "m.json"),
        )

        def fill(summer_doc):
            vi.clear()
            for i in range(4):
                summer = i == summer_doc
                vi.add_item(
                    _axis(i),
                    {
                        "photo_path": f"/p/{i}.jpg",
                        "description": f"doc {i}",
                        "retrieval_text": f"doc {i}",
                        "media_types": ["photo"],
                        "identity_names": [],
                        "time_info": {"season": "夏天"} if summer else {},
                        "exif_data": {"datetime": "2023-07-01T10:00:00"}
                        if summer else {},
                    },
                )

        fill(summer_doc=0)
        parser = FakeTimeParser({
            "夏天": {"start_date": None, "end_date": None, "precision": "none"},
        })
        formatter = FakeQueryFormatter(
            mapping={"夏天 hits0": {"search_text": "hits0", "season": "夏天"},
                     "夏天 hits1": {"search_text": "hits1", "season": "夏天"}}
        )
        searcher = Searcher(
            embedding=MappedEmbeddingService(
                {"hits0": _axis(0), "hits1": _axis(1)}, DIM
            ),
            time_parser=parser,
            vector_index=vi,
            query_formatter=formatter,
            data_dir=tmp.name,
        )
        searcher.index_loaded = True
        searcher._refresh_metadata_cache()
        first = searcher.search("夏天 hits0", top_k=4)
        self.assertEqual([r["photo_path"] for r in first], ["/p/0.jpg"])

        # rebuild: same count, but now doc 2 is the summer one
        fill(summer_doc=2)
        searcher._refresh_metadata_cache()
        second = searcher.search("夏天 hits1", top_k=4)
        self.assertEqual([r["photo_path"] for r in second], ["/p/2.jpg"])
