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
