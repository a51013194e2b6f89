"""Tests for api/app.py — composition root wiring, graceful degradation,
port fallback, worker mode (reference tests/test_main.py: DI wiring,
config fallback chains, port fallback, worker mode)."""

import os
import socket
import tempfile
import unittest

from photo_search_engine_tpu.api.app import (
    _validate_required_config,
    create_app,
    initialize_services,
    pick_port,
)
from photo_search_engine_tpu.config import load_config, reset_config_cache
from photo_search_engine_tpu.models.hash_embedder import HashingEmbeddingService
from photo_search_engine_tpu.services.embedding import (
    DeviceTextRerankService,
    OpenAICompatibleEmbeddingService,
)
from photo_search_engine_tpu.services.rerank import LocalVisualRerankService
from photo_search_engine_tpu.services.vision import LocalVisionService, OpenAIVisionService


def _base_config(tmp):
    reset_config_cache()
    saved = dict(os.environ)
    for key in list(os.environ):
        if key.startswith(("LLM_", "VISION_", "EMBEDDING_", "QUERY_", "TEXT_",
                           "VISUAL_", "TIME_", "SEARCH_", "KEYWORD_", "PHOTO_",
                           "DATA_", "RUNTIME_", "INDEX_", "METADATA_")):
            del os.environ[key]
    os.environ["PHOTO_DIR"] = os.path.join(tmp, "photos")
    os.environ["DATA_DIR"] = tmp
    config = load_config()
    os.environ.clear()
    os.environ.update(saved)
    reset_config_cache()
    return config


class CompositionTest(unittest.TestCase):
    def test_offline_composition_uses_local_backends(self):
        with tempfile.TemporaryDirectory() as tmp:
            services = initialize_services(_base_config(tmp))
            self.assertIsInstance(services["embedding_service"], HashingEmbeddingService)
            self.assertIsInstance(services["vision_service"], LocalVisionService)
            self.assertIsInstance(services["text_rerank_service"], DeviceTextRerankService)
            self.assertIsInstance(services["visual_rerank_service"], LocalVisualRerankService)
            self.assertIsNotNone(services["keyword_index"])
            self.assertIsNotNone(services["query_formatter"])
            self.assertEqual(services["query_formatter"].backend, "local")
            self.assertEqual(services["time_parser"].backend, "local")

    def test_online_composition_uses_http_backends(self):
        with tempfile.TemporaryDirectory() as tmp:
            config = _base_config(tmp)
            config.update(
                EMBEDDING_BASE_URL="https://emb.example.com/v1",
                EMBEDDING_API_KEY="k",
                VISION_BASE_URL="https://vis.example.com/v1",
                VISION_API_KEY="k",
            )
            services = initialize_services(config)
            self.assertIsInstance(
                services["embedding_service"], OpenAICompatibleEmbeddingService
            )
            self.assertIsInstance(services["vision_service"], OpenAIVisionService)

    def test_keyword_backend_none_disables(self):
        with tempfile.TemporaryDirectory() as tmp:
            config = _base_config(tmp)
            config["KEYWORD_BACKEND"] = "none"
            services = initialize_services(config)
            self.assertIsNone(services["keyword_index"])
            self.assertIsNone(services["searcher"].keyword_index)

    def test_query_formatter_disabled_by_flag(self):
        with tempfile.TemporaryDirectory() as tmp:
            config = _base_config(tmp)
            config["QUERY_FORMAT_ENABLED"] = False
            services = initialize_services(config)
            self.assertIsNone(services["query_formatter"])

    def test_searcher_wired_with_config_values(self):
        with tempfile.TemporaryDirectory() as tmp:
            config = _base_config(tmp)
            config["TOP_K"] = 7
            config["VECTOR_WEIGHT"] = 0.6
            config["KEYWORD_WEIGHT"] = 0.4
            services = initialize_services(config)
            self.assertEqual(services["searcher"].top_k, 7)
            self.assertAlmostEqual(services["searcher"].vector_weight, 0.6)
            self.assertIs(services["indexer"].vector_index, services["vector_index"])
            self.assertIs(services["searcher"].vector_index, services["vector_index"])

    def test_microbatch_flag_attaches_batcher(self):
        with tempfile.TemporaryDirectory() as tmp:
            config = _base_config(tmp)
            config["SEARCH_MICROBATCH_ENABLED"] = True
            services = initialize_services(config)
            self.assertTrue(hasattr(services["vector_index"], "_microbatcher"))
            services["vector_index"]._microbatcher.close()

    def test_create_app_registers_routes(self):
        with tempfile.TemporaryDirectory() as tmp:
            services = initialize_services(_base_config(tmp))
            app = create_app(services)
            client = app.test_client()
            self.assertEqual(client.get("/index_status").status_code, 200)
            self.assertEqual(client.get("/nope").status_code, 404)

    def test_validate_required_config(self):
        with self.assertRaises(ValueError):
            _validate_required_config({"PHOTO_DIR": None})
        _validate_required_config({"PHOTO_DIR": "/x"})  # no raise


class PortFallbackTest(unittest.TestCase):
    def test_pick_port_prefers_free_port(self):
        port, fell_back = pick_port("127.0.0.1", 0)  # 0 = ephemeral, always free
        self.assertFalse(fell_back)

    def test_pick_port_falls_back_when_busy(self):
        blocker = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        blocker.bind(("127.0.0.1", 0))
        busy_port = blocker.getsockname()[1]
        blocker.listen(1)
        try:
            port, fell_back = pick_port("127.0.0.1", busy_port)
            self.assertTrue(fell_back)
            self.assertNotEqual(port, busy_port)
            self.assertLessEqual(port - busy_port, 10)
        finally:
            blocker.close()


if __name__ == "__main__":
    unittest.main()
