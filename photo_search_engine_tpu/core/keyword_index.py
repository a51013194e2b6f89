"""Built-in keyword index: BM25 inverted index + EXIF filter fields.

Self-contained replacement for the reference's Elasticsearch dependency
(reference utils/keyword_store.py) with the same observable contract:

* Field boosts ``retrieval_text^3.0, description^2.0,
  inner_content_summary^1.8, outer_scene_summary^1.2, ocr_text^1.5,
  file_name^0.8``, best-fields combination, ``minimum_should_match`` 60%,
  plus a phrase bonus on ``retrieval_text^1.4``
  (keyword_store.py:105-139 _build_text_query).
* ``search`` normalizes BM25 by the max score to 0-1 and drops raw scores
  below 0.12 (keyword_store.py:240-284).
* ``search_with_filters`` combines the text query with exact-term filters
  (year/month/day/hour/season/time_period/weekday/camera) and a datetime
  range; filter-only hits score 0.5, match-all hits 1.0
  (keyword_store.py:286-392).
* ``get_filtered_paths`` (keyword_store.py:394) and ``clear`` (420).

Tokenization: lowercase ASCII word tokens + CJK unigrams and bigrams
(approximating the ES standard/IK analyzers, keyword_store.py:56-82).
BM25 uses Lucene parameters k1=1.2, b=0.75.

The hybrid-fusion caller treats this exactly like the ES-backed store, so
the no-keyword-store degradation path (searcher.py:1194-1196) is
preserved when this component is disabled.
"""

from __future__ import annotations

import json
import math
import os
import re
from collections import defaultdict
from datetime import datetime
from typing import Any, Dict, List, Optional

_K1 = 1.2
_B = 0.75
_MIN_SCORE = 0.12
_MIN_SHOULD_MATCH = 0.6
_PHRASE_BOOST = 1.4

TEXT_FIELD_BOOSTS: Dict[str, float] = {
    "retrieval_text": 3.0,
    "description": 2.0,
    "inner_content_summary": 1.8,
    "outer_scene_summary": 1.2,
    "ocr_text": 1.5,
    "file_name": 0.8,
}

FILTER_EXACT_FIELDS = (
    "year",
    "month",
    "day",
    "hour",
    "season",
    "time_period",
    "weekday",
    "camera",
)

_ASCII_WORD = re.compile(r"[a-z0-9_]+")


def _is_cjk(char: str) -> bool:
    code = ord(char)
    return (
        0x4E00 <= code <= 0x9FFF
        or 0x3400 <= code <= 0x4DBF
        or 0xF900 <= code <= 0xFAFF
    )


def tokenize(text: Any) -> List[str]:
    """Lowercased ASCII words + CJK unigrams and bigrams, in order."""
    if text is None:
        return []
    text = str(text).lower()
    tokens: List[str] = []
    cjk_run: List[str] = []

    def flush_cjk() -> None:
        if not cjk_run:
            return
        tokens.extend(cjk_run)
        for a, b in zip(cjk_run, cjk_run[1:]):
            tokens.append(a + b)
        cjk_run.clear()

    buffer = []
    for char in text:
        if _is_cjk(char):
            if buffer:
                tokens.extend(_ASCII_WORD.findall("".join(buffer)))
                buffer.clear()
            cjk_run.append(char)
        else:
            flush_cjk()
            buffer.append(char)
    flush_cjk()
    if buffer:
        tokens.extend(_ASCII_WORD.findall("".join(buffer)))
    return tokens


def _parse_dt(value: Optional[str], *, end_of_day: bool = False) -> Optional[datetime]:
    """Multi-format date parse; date-only end bounds extend to 23:59:59
    (mirrors searcher-side boundary handling, reference searcher.py:1963-2001)."""
    if not value or not isinstance(value, str):
        return None
    cleaned = value.strip().rstrip("\x00")
    date_only = ("%Y-%m-%d", "%Y/%m/%d", "%Y%m%d")
    formats = (
        "%Y-%m-%d",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%d %H:%M:%S",
        "%Y:%m:%d %H:%M:%S",
        "%Y/%m/%d %H:%M:%S",
        "%Y/%m/%d",
        "%Y%m%d",
    )
    for fmt in formats:
        try:
            parsed = datetime.strptime(cleaned, fmt)
        except ValueError:
            continue
        if end_of_day and fmt in date_only:
            return parsed.replace(hour=23, minute=59, second=59)
        return parsed
    try:
        return datetime.fromisoformat(cleaned)
    except Exception:
        return None


class _NativeBM25:
    """ctypes adapter over native/src/bm25.cc — packed postings + BM25
    scoring in C++ (the keyword channel's hot path at large corpus
    sizes).  Maps string tokens/doc-ids to dense integer ids."""

    def __init__(self) -> None:
        from photo_search_engine_tpu.native import get_library

        self._lib = get_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._fields = list(TEXT_FIELD_BOOSTS)
        self._handle = self._lib.pse_bm25_new(len(self._fields))
        self._token_ids: Dict[str, int] = {}
        self._doc_ids: Dict[str, int] = {}
        self._doc_names: List[str] = []

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            if getattr(self, "_handle", None):
                self._lib.pse_bm25_free(self._handle)
        except Exception:
            pass

    def _token_id(self, token: str, create: bool) -> Optional[int]:
        tid = self._token_ids.get(token)
        if tid is None and create:
            tid = len(self._token_ids)
            self._token_ids[token] = tid
        return tid

    def _doc_int(self, doc_id: str, create: bool) -> Optional[int]:
        did = self._doc_ids.get(doc_id)
        if did is None and create:
            did = len(self._doc_names)
            self._doc_ids[doc_id] = did
            self._doc_names.append(doc_id)
        return did

    def add_document(self, doc_id: str, field_tokens: Dict[str, List[str]]) -> None:
        import ctypes
        import numpy as np

        did = self._doc_int(doc_id, create=True)
        for field_index, field in enumerate(self._fields):
            tokens = field_tokens.get(field) or []
            ids = np.asarray(
                [self._token_id(t, create=True) for t in tokens], np.int64
            )
            self._lib.pse_bm25_add_doc(
                self._handle,
                did,
                field_index,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(ids),
            )

    def remove_document(self, doc_id: str) -> None:
        did = self._doc_ids.get(doc_id)
        if did is not None:
            self._lib.pse_bm25_remove_doc(self._handle, did)

    def score_field(
        self, field: str, terms: List[str], min_required: int
    ) -> Dict[str, float]:
        import ctypes
        import numpy as np

        field_index = self._fields.index(field)
        term_ids = [self._token_id(t, create=False) for t in terms]
        term_arr = np.asarray([t for t in term_ids if t is not None], np.int64)
        if term_arr.size == 0:
            return {}
        capacity = max(1024, len(self._doc_names))
        out_docs = np.empty(capacity, np.int64)
        out_scores = np.empty(capacity, np.float64)
        written = self._lib.pse_bm25_score_field(
            self._handle,
            field_index,
            term_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(term_arr),
            min_required,
            out_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            capacity,
        )
        written = min(written, capacity)
        return {
            self._doc_names[int(out_docs[i])]: float(out_scores[i])
            for i in range(written)
        }


class KeywordIndex:
    """BM25 + filters over photo documents (keyed by doc id).

    ``native="auto"`` (default) scores with the C++ postings core when the
    toolchain is available; ``native=False`` forces the pure-Python path.
    Both produce identical scores (asserted in tests)."""

    def __init__(self, index_path: Optional[str] = None, native: Any = "auto") -> None:
        self.index_path = index_path
        self._docs: Dict[str, Dict[str, Any]] = {}
        # field -> term -> {doc_id: tf}
        self._postings: Dict[str, Dict[str, Dict[str, int]]] = {
            field: defaultdict(dict) for field in TEXT_FIELD_BOOSTS
        }
        self._doc_len: Dict[str, Dict[str, int]] = {
            field: {} for field in TEXT_FIELD_BOOSTS
        }
        self._doc_tokens: Dict[str, List[str]] = {}  # retrieval_text streams
        self._native: Optional[_NativeBM25] = None
        if native == "auto" or native is True:
            try:
                self._native = _NativeBM25()
            except Exception:
                self._native = None

    # ------------------------------------------------------------------
    @property
    def count(self) -> int:
        return len(self._docs)

    def add_document(self, doc_id: str, document: Dict[str, Any]) -> None:
        """Insert or overwrite a document (reference keyword_store.py:216-238)."""
        if "photo_path" not in document or "description" not in document:
            raise ValueError("document requires photo_path and description fields")
        if doc_id in self._docs:
            self._remove(doc_id)
        self._docs[doc_id] = dict(document)
        field_tokens: Dict[str, List[str]] = {}
        for field in TEXT_FIELD_BOOSTS:
            tokens = tokenize(document.get(field))
            field_tokens[field] = tokens
            if field == "retrieval_text":
                self._doc_tokens[doc_id] = tokens
        if self._native is not None:
            self._native.add_document(doc_id, field_tokens)
            return
        for field, tokens in field_tokens.items():
            self._doc_len[field][doc_id] = len(tokens)
            counts: Dict[str, int] = defaultdict(int)
            for token in tokens:
                counts[token] += 1
            for token, tf in counts.items():
                self._postings[field][token][doc_id] = tf

    def _remove(self, doc_id: str) -> None:
        if self._native is not None:
            self._native.remove_document(doc_id)
        for field in TEXT_FIELD_BOOSTS:
            self._doc_len[field].pop(doc_id, None)
            for postings in self._postings[field].values():
                postings.pop(doc_id, None)
        self._doc_tokens.pop(doc_id, None)
        self._docs.pop(doc_id, None)

    def delete_document(self, doc_id: str) -> None:
        self._remove(doc_id)

    def clear(self) -> None:
        """Drop everything (reference keyword_store.py:420 delete+recreate)."""
        self._docs.clear()
        self._doc_tokens.clear()
        for field in TEXT_FIELD_BOOSTS:
            self._postings[field] = defaultdict(dict)
            self._doc_len[field] = {}
        if self._native is not None:
            try:
                self._native = _NativeBM25()
            except Exception:
                self._native = None

    # ------------------------------------------------------------------
    def _field_bm25(
        self, field: str, terms: List[str], candidates: Optional[set]
    ) -> Dict[str, float]:
        """Per-document BM25 for one field, honoring minimum_should_match."""
        if self._native is not None:
            unique_terms = list(dict.fromkeys(terms))
            required = max(1, int(_MIN_SHOULD_MATCH * len(unique_terms)))
            scored = self._native.score_field(field, unique_terms, required)
            if candidates is None:
                return scored
            return {d: s for d, s in scored.items() if d in candidates}
        n_docs = max(1, len(self._docs))
        lengths = self._doc_len[field]
        total_len = sum(lengths.values())
        avg_len = (total_len / len(lengths)) if lengths else 0.0
        unique_terms = list(dict.fromkeys(terms))
        required = max(1, int(_MIN_SHOULD_MATCH * len(unique_terms)))

        scores: Dict[str, float] = defaultdict(float)
        matched: Dict[str, int] = defaultdict(int)
        for term in unique_terms:
            postings = self._postings[field].get(term)
            if not postings:
                continue
            df = len(postings)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for doc_id, tf in postings.items():
                if candidates is not None and doc_id not in candidates:
                    continue
                dl = lengths.get(doc_id, 0)
                denom = tf + _K1 * (1.0 - _B + _B * (dl / avg_len if avg_len else 0.0))
                scores[doc_id] += idf * (tf * (_K1 + 1.0) / denom)
                matched[doc_id] += 1
        return {
            doc_id: score
            for doc_id, score in scores.items()
            if matched[doc_id] >= required
        }

    def _phrase_scores(
        self, terms: List[str], candidates: Optional[set]
    ) -> Dict[str, float]:
        """Contiguous-subsequence bonus on retrieval_text
        (the match_phrase clause, keyword_store.py:128-135)."""
        if len(terms) < 2:
            return {}
        out: Dict[str, float] = {}
        for doc_id, stream in self._doc_tokens.items():
            if candidates is not None and doc_id not in candidates:
                continue
            if not stream or len(stream) < len(terms):
                continue
            for start in range(len(stream) - len(terms) + 1):
                if stream[start : start + len(terms)] == terms:
                    out[doc_id] = 1.0
                    break
        return out

    def _text_scores(
        self, query: Optional[str], candidates: Optional[set]
    ) -> Optional[Dict[str, float]]:
        """best_fields multi_match + phrase bonus; None when no query text."""
        if not query or not str(query).strip():
            return None
        terms = tokenize(query)
        if not terms:
            return None
        best: Dict[str, float] = defaultdict(float)
        for field, boost in TEXT_FIELD_BOOSTS.items():
            for doc_id, score in self._field_bm25(field, terms, candidates).items():
                weighted = score * boost
                if weighted > best[doc_id]:
                    best[doc_id] = weighted
        phrase_base = self._field_bm25("retrieval_text", terms, candidates)
        # A full contiguous match implies every term matched in
        # retrieval_text, so phrase candidates are a subset of phrase_base —
        # scanning only those keeps the phrase pass O(candidates).
        for doc_id, present in self._phrase_scores(terms, set(phrase_base)).items():
            if present:
                best[doc_id] = best[doc_id] + _PHRASE_BOOST * phrase_base.get(doc_id, 1.0)
        return dict(best)

    # ------------------------------------------------------------------
    def _filter_candidates(self, filters: Dict[str, Any]) -> Optional[set]:
        """Doc ids passing exact-term + datetime-range filters; None when no
        filters are given (keyword_store.py:315-345)."""
        clauses = []
        for field in FILTER_EXACT_FIELDS:
            value = filters.get(field)
            if value is not None:
                clauses.append((field, value))
        start = _parse_dt(filters.get("start_date"))
        end = _parse_dt(filters.get("end_date"), end_of_day=True)
        if not clauses and start is None and end is None:
            return None

        passing = set()
        for doc_id, doc in self._docs.items():
            ok = True
            for field, value in clauses:
                if doc.get(field) != value:
                    ok = False
                    break
            if ok and (start is not None or end is not None):
                doc_dt = _parse_dt(doc.get("datetime"))
                if doc_dt is None:
                    ok = False
                elif start is not None and doc_dt < start:
                    ok = False
                elif end is not None and doc_dt > end:
                    ok = False
            if ok:
                passing.add(doc_id)
        return passing

    # ------------------------------------------------------------------
    @staticmethod
    def _normalize_hits(
        raw: Dict[str, float], docs: Dict[str, Dict[str, Any]], top_k: int
    ) -> List[Dict[str, Any]]:
        if not raw:
            return []
        ordered = sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        max_score = ordered[0][1] or 1.0
        if max_score == 0:
            max_score = 1.0
        return [
            {
                "photo_path": docs[doc_id]["photo_path"],
                "score": (score / max_score) if score else 0.5,
            }
            for doc_id, score in ordered
        ]

    def search(self, query: str, top_k: int = 50) -> List[Dict[str, Any]]:
        """BM25 search → [{photo_path, score∈(0,1]}] with raw min_score 0.12
        (reference keyword_store.py:240-284)."""
        scores = self._text_scores(query, None)
        if scores is None:
            return []
        kept = {d: s for d, s in scores.items() if s >= _MIN_SCORE}
        return self._normalize_hits(kept, self._docs, top_k)

    def search_with_filters(
        self,
        query: Optional[str],
        filters: Dict[str, Any],
        top_k: int = 50,
    ) -> List[Dict[str, Any]]:
        """Text + EXIF filter search (reference keyword_store.py:286-392)."""
        candidates = self._filter_candidates(filters or {})
        scores = self._text_scores(query, candidates)
        if scores is not None:
            kept = {d: s for d, s in scores.items() if s >= _MIN_SCORE}
            return self._normalize_hits(kept, self._docs, top_k)
        if candidates is None:
            # no text, no filters → match_all, score 1.0 each
            raw = {doc_id: 1.0 for doc_id in self._docs}
            return self._normalize_hits(raw, self._docs, top_k)
        # filter-only: ES gives _score 0 → normalized to the 0.5 sentinel
        raw = {doc_id: 0.0 for doc_id in candidates}
        return self._normalize_hits(raw, self._docs, top_k)

    def get_filtered_paths(
        self, filters: Dict[str, Any], top_k: int = 1000
    ) -> List[str]:
        candidates = self._filter_candidates(filters or {})
        if candidates is None:
            candidates = set(self._docs)
        paths = sorted(
            self._docs[doc_id]["photo_path"] for doc_id in candidates
        )
        return paths[:top_k]

    # ------------------------------------------------------------------
    def save(self, path: Optional[str] = None) -> None:
        """Persist raw documents; postings are rebuilt on load."""
        target = path or self.index_path
        if not target:
            raise ValueError("no index path configured")
        directory = os.path.dirname(target)
        if directory:
            os.makedirs(directory, exist_ok=True)
        with open(target, "w", encoding="utf-8") as f:
            json.dump({"documents": self._docs}, f, ensure_ascii=False)

    def load(self, path: Optional[str] = None) -> bool:
        target = path or self.index_path
        if not target or not os.path.exists(target):
            return False
        with open(target, "r", encoding="utf-8") as f:
            payload = json.load(f)
        self.clear()
        for doc_id, doc in (payload.get("documents") or {}).items():
            self.add_document(doc_id, doc)
        return True
