"""Deterministic fakes for the test suite (strategy parity with
reference tests/helpers.py: scripted, offline, injectable)."""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional

import numpy as np

from photo_search_engine_tpu.services.analysis import normalize_analysis_payload
from photo_search_engine_tpu.services.query_formatter import QueryFormatter


class FakeEmbeddingService:
    """Deterministic unit vector seeded from the text's digest."""

    def __init__(self, dimension: int = 32) -> None:
        self.dimension = dimension

    def generate_embedding(self, text: str) -> List[float]:
        if not text or not str(text).strip():
            raise ValueError("text to embed must not be empty")
        seed = int.from_bytes(
            hashlib.blake2b(str(text).encode(), digest_size=4).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        vec = rng.normal(size=self.dimension).astype(np.float32)
        return (vec / np.linalg.norm(vec)).tolist()

    def generate_embedding_batch(self, texts: List[str]) -> List[List[float]]:
        return [self.generate_embedding(t) for t in texts]


class MappedEmbeddingService:
    """Text→vector mapping with deterministic fallback; lets tests place
    corpus/query points precisely in embedding space."""

    def __init__(self, mapping: Dict[str, List[float]], dimension: int) -> None:
        self.mapping = dict(mapping)
        self.dimension = dimension
        self._fallback = FakeEmbeddingService(dimension)

    def generate_embedding(self, text: str) -> List[float]:
        if text in self.mapping:
            return list(self.mapping[text])
        return self._fallback.generate_embedding(text)

    def generate_embedding_batch(self, texts: List[str]) -> List[List[float]]:
        return [self.generate_embedding(t) for t in texts]


class FakeVisionService:
    """Canned structured analyses by path; default derives from filename."""

    def __init__(self, analyses: Optional[Dict[str, Dict[str, Any]]] = None,
                 fail_paths: Optional[set] = None) -> None:
        self.analyses = analyses or {}
        self.fail_paths = fail_paths or set()
        self.calls: List[str] = []

    def analyze_image(self, image_path: str) -> Dict[str, Any]:
        self.calls.append(image_path)
        if image_path in self.fail_paths:
            raise RuntimeError("scripted vision failure")
        if image_path in self.analyses:
            payload = self.analyses[image_path]
        else:
            import os, re

            stem = os.path.splitext(os.path.basename(image_path))[0]
            tokens = [t for t in re.split(r"[\W_]+", stem) if t]
            payload = {
                "description": " ".join(tokens) or "一张照片",
                "outer_scene_summary": " ".join(tokens),
                "inner_content_summary": "",
                "media_types": ["photo"],
                "tags": tokens[:4],
                "ocr_text": "",
                "person_roles": [],
                "identity_candidates": [],
                "analysis_flags": {},
            }
        return normalize_analysis_payload(
            payload,
            tag_min_confidence=0.65,
            identity_text_threshold=0.7,
            identity_visual_threshold=0.92,
        )

    def get_last_analysis_metrics(self) -> Dict[str, Any]:
        return {"used_fallback": False, "attempts": []}


class FakeTimeParser:
    """Keyword-scripted time constraints (no LLM)."""

    def __init__(self, mapping: Optional[Dict[str, Dict[str, Any]]] = None) -> None:
        self.mapping = mapping or {}

    def detect_time_terms(self, query: str, strategy: str = "local_first") -> bool:
        return any(key in (query or "") for key in self.mapping)

    def extract_time_constraints(self, query: str, strategy: str = "local_first") -> Dict[str, Any]:
        for key, constraints in self.mapping.items():
            if key in (query or ""):
                return dict(constraints)
        return {"start_date": None, "end_date": None, "precision": "none"}


class FakeQueryFormatter:
    """Mapping-driven intents + scripted expansion/reflection rounds
    (mirrors reference tests/helpers.py:31-70 behavior)."""

    def __init__(
        self,
        mapping: Optional[Dict[str, Dict[str, Any]]] = None,
        expansion_mapping: Optional[Dict[str, List[Dict[str, Any]]]] = None,
        reflection_mapping: Optional[Dict[str, Dict[str, Any]]] = None,
        enabled: bool = True,
    ) -> None:
        self.mapping = mapping or {}
        self.expansion_mapping = expansion_mapping or {}
        self.reflection_mapping = reflection_mapping or {}
        self.enabled = enabled
        self.format_calls: List[str] = []
        self.expand_calls: List[str] = []
        self.reflect_calls: List[str] = []

    def is_enabled(self) -> bool:
        return self.enabled

    def format_query(self, user_query: str) -> Dict[str, Any]:
        self.format_calls.append(user_query)
        payload = self.mapping.get(user_query, {"search_text": user_query})
        return QueryFormatter.normalize_intent_payload(
            dict(payload),
            user_query=user_query,
            time_hint=payload.get("time_hint"),
            season=payload.get("season"),
            time_period=payload.get("time_period"),
        )

    def expand_query_intents(
        self, user_query: str, base_intent: Dict[str, Any], max_alternatives: int = 2
    ) -> List[Dict[str, Any]]:
        self.expand_calls.append(user_query)
        alts = self.expansion_mapping.get(user_query, [])
        return [
            QueryFormatter.normalize_intent_payload(
                dict(alt),
                user_query=user_query,
                time_hint=base_intent.get("time_hint"),
                season=base_intent.get("season"),
                time_period=base_intent.get("time_period"),
                base_intent=base_intent,
            )
            for alt in alts[:max_alternatives]
        ]

    def reflect_on_weak_results(
        self, user_query: str, base_intent: Dict[str, Any], weak_results: List[Dict[str, Any]]
    ) -> Dict[str, Any]:
        self.reflect_calls.append(user_query)
        payload = self.reflection_mapping.get(user_query)
        if not payload:
            return {}
        return QueryFormatter.normalize_intent_payload(
            dict(payload),
            user_query=user_query,
            time_hint=base_intent.get("time_hint"),
            season=base_intent.get("season"),
            time_period=base_intent.get("time_period"),
            base_intent=base_intent,
        )


class FakeTextRerankService:
    """Reverses candidate order (reference helpers.py:73-80)."""

    def is_enabled(self) -> bool:
        return True

    def rerank(self, query, candidates, top_k):
        out = [dict(c) for c in reversed(candidates)]
        for rank, item in enumerate(out, start=1):
            item["rank"] = rank
            item["text_rerank_score"] = round(1.0 - 0.01 * rank, 6)
        return out[:top_k]


class FakeVisualRerankService:
    """Sorts by photo_path (reference helpers.py:83-98)."""

    def is_enabled(self) -> bool:
        return True

    def rerank(self, query, candidates, top_k):
        out = sorted((dict(c) for c in candidates), key=lambda c: c.get("photo_path", ""))
        for rank, item in enumerate(out, start=1):
            item["rank"] = rank
            item["visual_rerank_score"] = round(1.0 - 0.01 * rank, 6)
        return out[:top_k]

    def rerank_by_reference_image(self, reference_image_path, candidates, top_k):
        return self.rerank("ref", candidates, top_k)
