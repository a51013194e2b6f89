"""Tests for the services layer: llm_compat, embedding, time parser,
query formatter, vision, rerank (reference tests/test_embedding_service.py,
test_time_parser.py, test_query_formatter.py, test_vision_llm_service.py)."""

import json
import os
import tempfile
import unittest
from datetime import datetime
from unittest.mock import Mock

import numpy as np
from PIL import Image

from photo_search_engine_tpu.models.hash_embedder import (
    HashEmbedder,
    HashingEmbeddingService,
)
from photo_search_engine_tpu.services.embedding import (
    DeviceTextRerankService,
    OpenAICompatibleEmbeddingService,
    TextRerankService,
)
from photo_search_engine_tpu.services.llm_compat import (
    create_chat_completion,
    extract_response_text,
    is_ollama_base_url,
    normalize_openai_base_url,
    resolve_api_key,
)
from photo_search_engine_tpu.services.query_formatter import QueryFormatter
from photo_search_engine_tpu.services.rerank import (
    LocalVisualRerankService,
    VisualRerankService,
    merge_with_unprocessed,
    parse_ranking_text,
    rank_to_score_map,
)
from photo_search_engine_tpu.services.time_parser import TimeParser
from photo_search_engine_tpu.services.vision import (
    LocalVisionService,
    OpenAIVisionService,
    parse_json_object,
)


def _chat_response(text):
    return {"choices": [{"message": {"content": text}}]}


class LlmCompatTest(unittest.TestCase):
    def test_ollama_detection_and_key(self):
        self.assertTrue(is_ollama_base_url("http://localhost:11434"))
        self.assertTrue(is_ollama_base_url("https://api.ollama.com"))
        self.assertFalse(is_ollama_base_url("https://api.example.com"))
        self.assertEqual(resolve_api_key("", "http://localhost:11434"), "ollama")
        self.assertEqual(resolve_api_key("k", "http://x"), "k")

    def test_base_url_normalization(self):
        self.assertEqual(
            normalize_openai_base_url("http://localhost:11434"),
            "http://localhost:11434/v1",
        )
        self.assertEqual(
            normalize_openai_base_url("http://localhost:11434/api"),
            "http://localhost:11434/v1",
        )
        self.assertEqual(
            normalize_openai_base_url("https://api.example.com/custom"),
            "https://api.example.com/custom",
        )

    def test_extract_response_text_shapes(self):
        self.assertEqual(
            extract_response_text(_chat_response("hello")), "hello"
        )
        self.assertEqual(extract_response_text({"output_text": "abc"}), "abc")
        obj = Mock()
        obj.choices = [{"message": {"content": "mocked"}}]
        self.assertEqual(extract_response_text(obj), "mocked")
        with self.assertRaises(ValueError):
            extract_response_text(None)

    def test_progressive_degradation(self):
        calls = []

        def create(**kwargs):
            calls.append(kwargs)
            if "response_format" in kwargs or "extra_body" in kwargs:
                raise RuntimeError("unsupported")
            return _chat_response("ok")

        client = Mock()
        client.chat.completions.create = create
        response = create_chat_completion(
            client,
            model="m",
            messages=[{"role": "user", "content": "q"}],
            timeout=5,
            response_format={"type": "json_object"},
            reasoning_effort="low",
        )
        self.assertEqual(extract_response_text(response), "ok")
        self.assertGreaterEqual(len(calls), 3)
        self.assertNotIn("response_format", calls[-1])


class HashEmbedderTest(unittest.TestCase):
    def test_deterministic_and_normalized(self):
        embedder = HashEmbedder(dimension=256)
        a1 = embedder.embed("海边 日落 沙滩")
        a2 = embedder.embed("海边 日落 沙滩")
        np.testing.assert_allclose(a1, a2)
        self.assertAlmostEqual(float(np.linalg.norm(a1)), 1.0, places=5)

    def test_similarity_orders_by_token_overlap(self):
        embedder = HashEmbedder(dimension=512)
        query = embedder.embed("海边 日落")
        near = embedder.embed("海边 日落 沙滩")
        far = embedder.embed("城市 夜景 大楼")
        self.assertGreater(float(query @ near), float(query @ far))

    def test_service_adapter(self):
        svc = HashingEmbeddingService(dimension=128)
        emb = svc.generate_embedding("测试")
        self.assertEqual(len(emb), 128)
        with self.assertRaises(ValueError):
            svc.generate_embedding("  ")
        batch = svc.generate_embedding_batch(["a", "b"])
        self.assertEqual(len(batch), 2)


class EmbeddingServiceTest(unittest.TestCase):
    def _client(self, dim=8, fail_times=0):
        state = {"calls": 0}

        def create(**kwargs):
            state["calls"] += 1
            if state["calls"] <= fail_times:
                raise RuntimeError("boom")
            inputs = kwargs["input"]
            if isinstance(inputs, str):
                inputs = [inputs]
            return {"data": [{"embedding": [0.1] * dim} for _ in inputs]}

        client = Mock()
        client.embeddings.create = create
        return client, state

    def test_generate_embedding(self):
        client, _ = self._client()
        svc = OpenAICompatibleEmbeddingService("k", "m", "https://x", client=client)
        emb = svc.generate_embedding("text")
        self.assertEqual(len(emb), 8)
        self.assertEqual(svc.dimension, 8)

    def test_empty_text_raises(self):
        client, _ = self._client()
        svc = OpenAICompatibleEmbeddingService("k", "m", "https://x", client=client)
        with self.assertRaises(ValueError):
            svc.generate_embedding("   ")

    def test_retry_then_success(self):
        client, state = self._client(fail_times=1)
        svc = OpenAICompatibleEmbeddingService("k", "m", "https://x", client=client)
        emb = svc.generate_embedding("text")
        self.assertEqual(len(emb), 8)
        self.assertEqual(state["calls"], 2)

    def test_missing_key_raises(self):
        with self.assertRaises(ValueError):
            OpenAICompatibleEmbeddingService("", "m", "https://remote")

    def test_ollama_keyless_ok(self):
        svc = OpenAICompatibleEmbeddingService(
            "", "m", "http://localhost:11434", client=Mock()
        )
        self.assertEqual(svc.api_key, "ollama")


class TextRerankTest(unittest.TestCase):
    def _candidates(self):
        return [
            {"photo_path": "/a.jpg", "retrieval_text": "海边", "score": 0.9},
            {"photo_path": "/b.jpg", "retrieval_text": "城市", "score": 0.8},
            {"photo_path": "/c.jpg", "retrieval_text": "草地", "score": 0.7},
        ]

    def test_api_backend(self):
        session = Mock()
        response = Mock()
        response.json.return_value = {
            "results": [
                {"index": 2, "relevance_score": 0.95},
                {"index": 0, "relevance_score": 0.60},
            ]
        }
        response.raise_for_status.return_value = None
        session.post.return_value = response
        svc = TextRerankService(
            "k", "m", "https://x", session=session, client=Mock(), backend="api"
        )
        out = svc.rerank("草地", self._candidates(), 3)
        self.assertEqual(out[0]["photo_path"], "/c.jpg")
        self.assertEqual(out[0]["text_rerank_score"], 0.95)

    def test_chat_backend(self):
        client = Mock()
        client.chat.completions.create = Mock(
            return_value=_chat_response(json.dumps({"ranking": [{"index": 2, "score": 0.9}]}))
        )
        svc = TextRerankService(
            "k", "m", "https://x", client=client, backend="chat"
        )
        out = svc.rerank("城市", self._candidates(), 2)
        self.assertEqual(out[0]["photo_path"], "/b.jpg")

    def test_ollama_auto_selects_chat(self):
        svc = TextRerankService(
            "", "m", "http://localhost:11434", client=Mock(), session=Mock()
        )
        self.assertEqual(svc._resolve_backend(), "chat")

    def test_device_rerank_orders_by_text_similarity(self):
        svc = DeviceTextRerankService(dimension=256)
        out = svc.rerank("草地 宠物", self._candidates(), 3)
        self.assertEqual(out[0]["photo_path"], "/c.jpg")
        self.assertTrue(svc.is_enabled())

    def test_empty_query_passthrough(self):
        svc = DeviceTextRerankService(dimension=64)
        out = svc.rerank("", self._candidates(), 2)
        self.assertEqual(len(out), 2)


class TimeParserLocalTest(unittest.TestCase):
    def setUp(self):
        self.parser = TimeParser(backend="local", now_fn=lambda: datetime(2026, 8, 16, 12, 0))

    def test_local_gate(self):
        self.assertTrue(self.parser.detect_time_terms("去年的照片"))
        self.assertTrue(self.parser.detect_time_terms("2023年7月"))
        self.assertFalse(self.parser.detect_time_terms("海边日落"))
        self.assertFalse(self.parser.detect_time_terms(""))

    def test_season_alone_no_date_range(self):
        result = self.parser.extract_time_constraints("夏天的照片")
        self.assertIsNone(result["start_date"])
        self.assertEqual(result["precision"], "none")

    def test_last_year(self):
        result = self.parser.extract_time_constraints("去年的照片")
        self.assertEqual(result["start_date"], "2025-01-01")
        self.assertEqual(result["end_date"], "2025-12-31")
        self.assertEqual(result["precision"], "year")

    def test_last_year_summer(self):
        result = self.parser.extract_time_constraints("去年夏天的照片")
        self.assertEqual(result["start_date"], "2025-06-01")
        self.assertEqual(result["end_date"], "2025-08-31")
        self.assertEqual(result["precision"], "season")

    def test_winter_spans_year_boundary(self):
        result = self.parser.extract_time_constraints("去年冬天")
        self.assertEqual(result["start_date"], "2025-12-01")
        self.assertEqual(result["end_date"], "2026-02-28")

    def test_explicit_year_month(self):
        result = self.parser.extract_time_constraints("2023年7月的照片")
        self.assertEqual(result["start_date"], "2023-07-01")
        self.assertEqual(result["end_date"], "2023-07-31")
        self.assertEqual(result["precision"], "month")

    def test_explicit_full_date(self):
        result = self.parser.extract_time_constraints("2023年7月15日")
        self.assertEqual(result["start_date"], "2023-07-15")
        self.assertEqual(result["end_date"], "2023-07-15")

    def test_today(self):
        result = self.parser.extract_time_constraints("今天拍的")
        self.assertEqual(result["start_date"], "2026-08-16")
        self.assertEqual(result["end_date"], "2026-08-16")

    def test_last_month(self):
        result = self.parser.extract_time_constraints("上个月")
        self.assertEqual(result["start_date"], "2026-07-01")
        self.assertEqual(result["end_date"], "2026-07-31")

    def test_llm_backend_parses_llm_json(self):
        client = Mock()
        client.chat.completions.create = Mock(
            return_value=_chat_response(
                json.dumps({"has_time_constraint": True,
                            "start_date": "2025-06-01", "end_date": "2025-08-31"})
            )
        )
        parser = TimeParser("k", "m", "https://x", client=client, backend="openai")
        result = parser.extract_time_constraints("去年夏天")
        self.assertEqual(result["start_date"], "2025-06-01")
        self.assertEqual(result["precision"], "season")


class QueryFormatterLocalTest(unittest.TestCase):
    def setUp(self):
        self.qf = QueryFormatter(backend="local")

    def test_strips_politeness_and_lifts_time(self):
        intent = self.qf.format_query("帮我找去年夏天傍晚在海边拍的照片")
        self.assertEqual(intent["season"], "夏天")
        self.assertEqual(intent["time_period"], "傍晚")
        self.assertIn("海边", intent["search_text"])
        self.assertNotIn("夏天", intent["search_text"])
        self.assertNotIn("帮我", intent["search_text"])
        self.assertEqual(intent["retrieval_mode"], "hybrid")

    def test_filter_only_when_no_visual_text(self):
        intent = self.qf.format_query("去年夏天的照片")
        self.assertEqual(intent["retrieval_mode"], "filter_only")
        self.assertEqual(intent["search_text"], "")

    def test_media_terms_detected(self):
        intent = self.qf.format_query("找一下聊天记录截图")
        self.assertIn("截图", intent["media_terms"])

    def test_contract_defaults(self):
        intent = self.qf.format_query("海边日落")
        self.assertEqual(intent["intent_contract"]["core_target"], "海边日落")
        self.assertEqual(intent["intent_mode"], "open")

    def test_remote_backend_normalizes_payload(self):
        client = Mock()
        client.chat.completions.create = Mock(
            return_value=_chat_response(json.dumps({
                "search_text": "海边 日落",
                "retrieval_mode": "bogus",
                "media_terms": ["照片", " "],
                "identity_terms": [],
                "strict_identity_filter": True,
                "intent_mode": None,
                "intent_contract": {"core_target": "", "must_keep": ["海边", "海边"]},
                "time_hint": None, "season": "夏天", "time_period": None,
            }))
        )
        qf = QueryFormatter("k", "m", "https://x", client=client, backend="openai")
        intent = qf.format_query("去年夏天海边日落")
        self.assertEqual(intent["retrieval_mode"], "hybrid")
        self.assertEqual(intent["intent_mode"], "strict")  # from strict_identity_filter
        self.assertEqual(intent["intent_contract"]["core_target"], "海边 日落")
        self.assertEqual(intent["intent_contract"]["must_keep"], ["海边"])

    def test_remote_failure_degrades_to_raw_query(self):
        client = Mock()
        client.chat.completions.create = Mock(side_effect=RuntimeError("down"))
        qf = QueryFormatter("k", "m", "https://x", client=client,
                            backend="openai", max_retries=1)
        intent = qf.format_query("海边日落")
        self.assertEqual(intent["search_text"], "海边日落")
        self.assertEqual(intent["retrieval_mode"], "hybrid")

    def test_expand_respects_max_alternatives(self):
        client = Mock()
        client.chat.completions.create = Mock(
            return_value=_chat_response(json.dumps({"alternatives": [
                {"search_text": "a", "contract_satisfied": True},
                {"search_text": "b", "contract_satisfied": False},
                {"search_text": "c"},
            ]}))
        )
        qf = QueryFormatter("k", "m", "https://x", client=client, backend="openai")
        base = qf._fallback_intent("q")
        alts = qf.expand_query_intents("q", base, max_alternatives=2)
        self.assertEqual(len(alts), 2)
        self.assertFalse(alts[1]["contract_satisfied"])

    def test_reflection_empty_when_no_improvement(self):
        client = Mock()
        client.chat.completions.create = Mock(return_value=_chat_response("{}"))
        qf = QueryFormatter("k", "m", "https://x", client=client, backend="openai")
        self.assertEqual(qf.reflect_on_weak_results("q", qf._fallback_intent("q"), []), {})


class VisionTest(unittest.TestCase):
    def test_parse_json_object_variants(self):
        self.assertEqual(parse_json_object('{"a": 1}'), {"a": 1})
        self.assertEqual(parse_json_object('```json\n{"a": 1}\n```'), {"a": 1})
        self.assertEqual(
            parse_json_object('noise before {"a": {"b": 2}} noise after'),
            {"a": {"b": 2}},
        )
        self.assertEqual(parse_json_object('[{"a": 1}]'), {"a": 1})
        with self.assertRaises(ValueError):
            parse_json_object("no json here")

    def _image(self, tmp):
        path = os.path.join(tmp, "beach_sunset.jpg")
        Image.new("RGB", (64, 48), (200, 100, 10)).save(path)
        return path

    def test_local_vision_structured_output(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = self._image(tmp)
            svc = LocalVisionService()
            analysis = svc.analyze_image(path)
            self.assertTrue(analysis["retrieval_text"])
            self.assertTrue(analysis["embedding_text"])
            self.assertIn("beach", analysis["retrieval_text"])
            self.assertIn("photo", analysis["media_types"])
            metrics = svc.get_last_analysis_metrics()
            self.assertFalse(metrics["used_fallback"])

    def test_openai_vision_parses_and_normalizes(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = self._image(tmp)
            client = Mock()
            client.chat.completions.create = Mock(
                return_value=_chat_response(json.dumps({
                    "description": "海边日落",
                    "media_types": ["photo"],
                    "tags": [{"tag": "海边", "confidence": 0.9}],
                    "ocr_text": "",
                    "inner_content_summary": "长长的沙滩和晚霞非常漂亮",
                    "outer_scene_summary": "海边",
                    "person_roles": [],
                    "identity_candidates": [],
                    "analysis_flags": {},
                }))
            )
            svc = OpenAIVisionService("k", "m", "https://x", client=client,
                                      enhanced_analysis_enabled=False)
            analysis = svc.analyze_image(path)
            self.assertEqual(analysis["description"], "海边日落")
            self.assertIn("海边", analysis["embedding_text"])
            metrics = svc.get_last_analysis_metrics()
            self.assertEqual(metrics["attempts"][0]["status"], "success")

    def test_openai_vision_repair_path(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = self._image(tmp)
            replies = iter([
                _chat_response("THIS IS NOT JSON AT ALL"),
                _chat_response(json.dumps({"description": "修复后的描述",
                                           "media_types": ["photo"]})),
            ])
            client = Mock()
            client.chat.completions.create = Mock(side_effect=lambda **kw: next(replies))
            svc = OpenAIVisionService("k", "m", "https://x", client=client,
                                      enhanced_analysis_enabled=False)
            analysis = svc.analyze_image(path)
            self.assertEqual(analysis["description"], "修复后的描述")
            self.assertGreaterEqual(
                svc.get_last_analysis_metrics()["base_repair_seconds"], 0.0
            )

    def test_enhanced_pass_merges_fields(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = self._image(tmp)
            # base result is sparse -> triggers enhanced pass
            replies = iter([
                _chat_response(json.dumps({"description": "x", "media_types": []})),
                _chat_response(json.dumps({"media_types": ["poster"],
                                           "inner_content_summary": "补充的内部内容信息"})),
            ])
            client = Mock()
            client.chat.completions.create = Mock(side_effect=lambda **kw: next(replies))
            svc = OpenAIVisionService("k", "m", "https://x", client=client)
            analysis = svc.analyze_image(path)
            self.assertEqual(analysis["media_types"], ["poster"])
            metrics = svc.get_last_analysis_metrics()
            self.assertTrue(metrics["enhanced_triggered"])
            self.assertTrue(metrics["enhanced_succeeded"])


class VisualRerankTest(unittest.TestCase):
    def test_rank_score_map(self):
        scores = rank_to_score_map([2, 0, 1], 3)
        self.assertEqual(scores[2], 1.0)
        self.assertAlmostEqual(scores[0], 2 / 3)
        self.assertAlmostEqual(scores[1], 1 / 3)

    def test_parse_ranking_json_and_fallback(self):
        self.assertEqual(parse_ranking_text('{"ranking": [2, 1]}', 3), [1, 0])
        self.assertEqual(parse_ranking_text("I think 2 then 3 then 1", 3), [1, 2, 0])
        with self.assertRaises(ValueError):
            parse_ranking_text("nothing", 3)

    def test_merge_with_unprocessed_backfills(self):
        reranked = [{"photo_path": "/a.jpg"}]
        original = [{"photo_path": "/a.jpg"}, {"photo_path": "/b.jpg"}]
        merged = merge_with_unprocessed(reranked, original, 2)
        self.assertEqual([m["photo_path"] for m in merged], ["/a.jpg", "/b.jpg"])
        self.assertEqual([m["rank"] for m in merged], [1, 2])

    def _images(self, tmp, colors):
        paths = []
        for i, color in enumerate(colors):
            path = os.path.join(tmp, f"img{i}.jpg")
            Image.new("RGB", (32, 32), color).save(path)
            paths.append(path)
        return paths

    def test_llm_visual_rerank_chunked(self):
        with tempfile.TemporaryDirectory() as tmp:
            paths = self._images(tmp, [(255, 0, 0)] * 5)
            candidates = [{"photo_path": p, "score": 0.5} for p in paths]
            client = Mock()
            client.chat.completions.create = Mock(
                return_value=_chat_response(json.dumps({"ranking": [2, 1]}))
            )
            svc = VisualRerankService("k", "m", "https://x", client=client, max_images=2)
            out = svc.rerank("红色", candidates, 3)
            self.assertEqual(len(out), 3)
            # tournament: ceil(5/2)=3 chunk calls (last singleton skips) + merge
            self.assertGreaterEqual(client.chat.completions.create.call_count, 3)

    def test_local_visual_rerank_by_reference_picks_similar(self):
        with tempfile.TemporaryDirectory() as tmp:
            # candidate 0: gradient like reference; candidate 1: inverse
            ref = os.path.join(tmp, "ref.jpg")
            grad = np.tile(np.linspace(0, 255, 32, dtype=np.uint8), (32, 1))
            Image.fromarray(np.stack([grad] * 3, -1)).save(ref)
            near = os.path.join(tmp, "near.jpg")
            Image.fromarray(np.stack([grad] * 3, -1)).rotate(2).save(near)
            far = os.path.join(tmp, "far.jpg")
            Image.fromarray(np.stack([255 - grad] * 3, -1)).save(far)
            candidates = [
                {"photo_path": far, "score": 0.9},
                {"photo_path": near, "score": 0.1},
            ]
            svc = LocalVisualRerankService()
            out = svc.rerank_by_reference_image(ref, candidates, 2)
            self.assertEqual(out[0]["photo_path"], near)


if __name__ == "__main__":
    unittest.main()


class OpenAIHttpClientTest(unittest.TestCase):
    """The SDK-free HTTP client: payload shaping + header handling."""

    def _patch_requests(self, capture):
        import photo_search_engine_tpu.services.llm_compat as compat

        class FakeResponse:
            def raise_for_status(self):
                pass

            def json(self):
                return {"choices": [{"message": {"content": "pong"}}]}

        class FakeRequests:
            @staticmethod
            def post(url, headers=None, data=None, timeout=None):
                capture.update(url=url, headers=headers,
                               data=json.loads(data), timeout=timeout)
                return FakeResponse()

        return compat, FakeRequests()

    def test_chat_create_posts_payload(self):
        import photo_search_engine_tpu.services.llm_compat as compat

        capture = {}
        compat_mod, fake = self._patch_requests(capture)
        original = compat_mod.requests
        compat_mod.requests = fake
        try:
            client = compat_mod.OpenAIHttpClient("sk-key", "https://x/v1", timeout=7)
            response = client.chat.completions.create(
                model="m", messages=[{"role": "user", "content": "hi"}],
                timeout=9, extra_body={"reasoning_effort": "low"},
            )
        finally:
            compat_mod.requests = original
        self.assertEqual(capture["url"], "https://x/v1/chat/completions")
        self.assertEqual(capture["headers"]["Authorization"], "Bearer sk-key")
        self.assertEqual(capture["timeout"], 9)
        # extra_body flattened into the payload
        self.assertEqual(capture["data"]["reasoning_effort"], "low")
        self.assertNotIn("extra_body", capture["data"])
        self.assertEqual(extract_response_text(response), "pong")

    def test_embeddings_endpoint_and_default_timeout(self):
        import photo_search_engine_tpu.services.llm_compat as compat

        capture = {}
        compat_mod, fake = self._patch_requests(capture)
        original = compat_mod.requests
        compat_mod.requests = fake
        try:
            client = compat_mod.OpenAIHttpClient("", "https://x/v1", timeout=11)
            client.embeddings.create(model="e", input="text")
        finally:
            compat_mod.requests = original
        self.assertEqual(capture["url"], "https://x/v1/embeddings")
        self.assertNotIn("Authorization", capture["headers"])  # keyless
        self.assertEqual(capture["timeout"], 11)
