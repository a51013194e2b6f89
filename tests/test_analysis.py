"""Tests for services/analysis.py — parity with the reference's
structured-analysis contract (reference tests/test_structured_analysis.py)."""

import unittest

from photo_search_engine_tpu.services.analysis import (
    INDEX_TEXT_VERSION,
    build_match_summary,
    enhanced_analysis_reason,
    normalize_analysis_payload,
    normalize_tags,
    select_identity_names,
)


def _normalize(payload):
    return normalize_analysis_payload(
        payload,
        tag_min_confidence=0.65,
        identity_text_threshold=0.7,
        identity_visual_threshold=0.92,
    )


class TagNormalizationTest(unittest.TestCase):
    def test_confidence_filter(self):
        tags = normalize_tags(
            [
                {"tag": "beach", "confidence": 0.9},
                {"tag": "dog", "confidence": 0.5},
                {"tag": "sunset"},  # missing confidence -> 1.0
                "plain",
                {"tag": "bad", "confidence": "x"},  # unparsable -> 0.0
            ],
            min_confidence=0.65,
        )
        self.assertEqual(tags, ["beach", "sunset", "plain"])

    def test_dedupe_case_insensitive_keep_first(self):
        tags = normalize_tags(["Beach", "beach", "BEACH"], min_confidence=0.0)
        self.assertEqual(tags, ["Beach"])


class IdentitySelectionTest(unittest.TestCase):
    def test_text_evidence_threshold(self):
        names, evidence, cands = select_identity_names(
            [
                {"name": "Alice", "confidence": 0.75, "evidence_types": ["text"],
                 "evidence_sources": ["caption"]},
                {"name": "Bob", "confidence": 0.65, "evidence_types": ["text"]},
            ],
            text_threshold=0.7,
            visual_threshold=0.92,
        )
        self.assertEqual(names, ["Alice"])
        self.assertEqual(evidence, ["caption"])
        self.assertEqual(len(cands), 2)

    def test_visual_evidence_needs_higher_confidence(self):
        names, _, _ = select_identity_names(
            [
                {"name": "Carol", "confidence": 0.9, "evidence_types": ["visual"]},
                {"name": "Dan", "confidence": 0.95, "evidence_types": ["visual"]},
            ],
            text_threshold=0.7,
            visual_threshold=0.92,
        )
        self.assertEqual(names, ["Dan"])

    def test_no_evidence_type_uses_strictest(self):
        names, _, _ = select_identity_names(
            [{"name": "Eve", "confidence": 0.9}],
            text_threshold=0.7,
            visual_threshold=0.92,
        )
        self.assertEqual(names, [])

    def test_aliases_included(self):
        names, _, _ = select_identity_names(
            [{"name": "Frank", "aliases": ["F."], "confidence": 0.8,
              "evidence_types": ["text"]}],
            text_threshold=0.7,
            visual_threshold=0.92,
        )
        self.assertEqual(names, ["Frank", "F."])


class IndexTextTest(unittest.TestCase):
    def test_embedding_text_excludes_ocr_and_text_identities(self):
        normalized = _normalize(
            {
                "description": "a poster",
                "outer_scene_summary": "wall with poster",
                "inner_content_summary": "movie poster content",
                "media_types": ["poster"],
                "tags": [{"tag": "cinema", "confidence": 0.9}],
                "ocr_text": "GRAND PREMIERE 2024",
                "person_roles": ["actor"],
                "identity_candidates": [
                    {"name": "Star A", "confidence": 0.85, "evidence_types": ["text"],
                     "scope": "referenced"},
                ],
            }
        )
        # OCR only in retrieval_text
        self.assertIn("GRAND PREMIERE 2024", normalized["retrieval_text"])
        self.assertNotIn("GRAND PREMIERE", normalized["embedding_text"])
        # text-evidence identity accepted in retrieval_text but NOT embedding_text
        self.assertIn("Star A", normalized["retrieval_text"])
        self.assertNotIn("Star A", normalized["embedding_text"])
        # person roles only in embedding_text
        self.assertIn("actor", normalized["embedding_text"])

    def test_embedding_text_includes_visual_depicted_identity(self):
        normalized = _normalize(
            {
                "description": "two people",
                "media_types": ["photo"],
                "identity_candidates": [
                    {"name": "VIP", "confidence": 0.95, "evidence_types": ["visual"],
                     "scope": "depicted"},
                ],
            }
        )
        self.assertIn("VIP", normalized["embedding_text"])
        self.assertIn("VIP", normalized["retrieval_text"])

    def test_empty_payload_falls_back_to_description(self):
        normalized = _normalize({})
        self.assertEqual(normalized["description"], "一张照片")
        self.assertEqual(normalized["embedding_text"], "一张照片")
        self.assertEqual(normalized["retrieval_text"], "一张照片")

    def test_version_constant(self):
        self.assertEqual(INDEX_TEXT_VERSION, 2)


class EnhancedReasonTest(unittest.TestCase):
    def test_classification_uncertain_wins(self):
        reason = enhanced_analysis_reason(
            {"analysis_flags": {"classification_uncertain": True},
             "description": "long detailed description of a rich scene",
             "media_types": ["photo"]}
        )
        self.assertEqual(reason, "model_marked_uncertain")

    def test_person_identity_missing(self):
        reason = enhanced_analysis_reason(
            {"person_roles": ["person"], "description": "x", "media_types": []}
        )
        self.assertEqual(reason, "person_identity_missing")

    def test_ocr_signal_weak(self):
        reason = enhanced_analysis_reason(
            {"analysis_flags": {"text_heavy": True}, "ocr_text": "short",
             "description": "x"}
        )
        self.assertEqual(reason, "ocr_signal_weak")

    def test_rich_analysis_skips(self):
        reason = enhanced_analysis_reason(
            {
                "description": "a very long and detailed description here",
                "inner_content_summary": "plenty of inner content",
                "media_types": ["photo"],
                "tags": ["a", "b", "c"],
                "ocr_text": "",
            }
        )
        self.assertIsNone(reason)

    def test_sparse_signals_trigger(self):
        reason = enhanced_analysis_reason({"description": "x", "media_types": []})
        self.assertEqual(reason, "retrieval_signal_sparse")


class MatchSummaryTest(unittest.TestCase):
    def test_fields_and_caps(self):
        summary = build_match_summary(
            {
                "media_types": ["photo"],
                "tags": [f"t{i}" for i in range(12)],
                "identity_names": ["A"],
                "identity_evidence": ["caption"],
                "ocr_text": "z" * 300,
            }
        )
        self.assertEqual(summary["media_types"], ["photo"])
        self.assertEqual(len(summary["top_tags"]), 8)
        self.assertEqual(summary["identities"], ["A"])
        self.assertEqual(len(summary["ocr_excerpt"]), 120)


if __name__ == "__main__":
    unittest.main()
