"""Tests for api/routes.py over the WSGI test client (reference
tests/test_routes.py: response shapes, 409-during-indexing, rerank
pipeline pool/cut semantics, photo serving, traversal guard)."""

import io
import json
import os
import tempfile
import unittest

from PIL import Image

from photo_search_engine_tpu.api.app import create_app
from photo_search_engine_tpu.api.routes import apply_rerank_pipeline
from photo_search_engine_tpu.core.indexer import Indexer
from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.core.searcher import Searcher
from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.services.vision import LocalVisionService
from tests.helpers import (
    FakeEmbeddingService,
    FakeTextRerankService,
    FakeTimeParser,
    FakeVisualRerankService,
)


def _make_photo(directory, name, color=(90, 140, 60)):
    path = os.path.join(directory, name)
    Image.new("RGB", (48, 36), color).save(path)
    return path


class RoutesFixture(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()
        self.photo_dir = os.path.join(self.tmp.name, "photos")
        self.data_dir = os.path.join(self.tmp.name, "data")
        os.makedirs(self.photo_dir)
        os.makedirs(self.data_dir)
        self.photos = [
            _make_photo(self.photo_dir, "beach_sunset.jpg"),
            _make_photo(self.photo_dir, "city_night.jpg"),
            _make_photo(self.photo_dir, "dog_grass.jpg"),
        ]
        self.embedding = FakeEmbeddingService(dimension=16)
        self.vector_index = VectorIndex(
            dimension=16,
            index_path=os.path.join(self.data_dir, "ps.index"),
            metadata_path=os.path.join(self.data_dir, "metadata.json"),
        )
        self.keyword_index = KeywordIndex(os.path.join(self.data_dir, "kw.json"))
        self.indexer = Indexer(
            photo_dir=self.photo_dir,
            vector_index=self.vector_index,
            vision_service=LocalVisionService(),
            embedding_service=self.embedding,
            keyword_index=self.keyword_index,
            data_dir=self.data_dir,
            max_retries=1,
        )
        self.searcher = Searcher(
            embedding=self.embedding,
            time_parser=FakeTimeParser(),
            vector_index=self.vector_index,
            keyword_index=self.keyword_index,
            data_dir=self.data_dir,
        )
        services = {
            "config": {"TOP_K": 12, "DEFAULT_SEARCH_MODE": "balanced"},
            "indexer": self.indexer,
            "searcher": self.searcher,
            "text_rerank_service": FakeTextRerankService(),
            "visual_rerank_service": FakeVisualRerankService(),
        }
        self.app = create_app(services)
        self.client = self.app.test_client()

    def tearDown(self):
        self.tmp.cleanup()

    def _build(self):
        status = self.indexer.build_index()
        assert status["status"] == "success", status
        self.searcher.index_loaded = True
        self.searcher._refresh_metadata_cache()


class BasicRoutesTest(RoutesFixture):
    def test_index_status_initial(self):
        response = self.client.get("/index_status")
        self.assertEqual(response.status_code, 200)
        payload = response.get_json()
        self.assertIn(payload["status"], {"idle", "failed"})

    def test_root_serves_spa(self):
        response = self.client.get("/")
        self.assertEqual(response.status_code, 200)
        self.assertIn(b"<!DOCTYPE html>", response.data[:20])

    def test_unknown_route_404_json(self):
        response = self.client.get("/nope")
        self.assertEqual(response.status_code, 404)
        self.assertEqual(response.get_json()["status"], "error")

    def test_init_index_and_search_flow(self):
        response = self.client.post("/init_index", json_body={"mode": "full"})
        self.assertEqual(response.status_code, 200)
        # wait for background build
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            status = self.client.get("/index_status").get_json()
            if status["status"] in {"success", "ready", "failed"}:
                break
            time.sleep(0.05)
        self.assertIn(status["status"], {"success", "ready"})

        response = self.client.post(
            "/search_photos", json_body={"query": "beach sunset", "top_k": 3}
        )
        payload = response.get_json()
        self.assertEqual(payload["status"], "success")
        self.assertGreaterEqual(payload["total_results"], 1)
        hit = payload["results"][0]
        self.assertIn("photo_url", hit)
        self.assertIn("file_name", hit)
        self.assertIn("match_summary", hit)
        self.assertIn("search_debug", payload)
        self.assertIn("elapsed_time", payload)
        self.assertFalse(payload["text_reranked"])
        self.assertFalse(payload["visual_reranked"])

    def test_metrics_route(self):
        # /metrics is net-new (no reference equivalent): request counters,
        # latency percentiles, store snapshot, indexing status
        self._build()
        ok = self.client.post(
            "/search_photos", json_body={"query": "beach sunset", "top_k": 3}
        )
        self.assertEqual(ok.status_code, 200)
        bad = self.client.post("/search_photos", json_body={"query": "  "})
        self.assertEqual(bad.status_code, 400)

        payload = self.client.get("/metrics").get_json()
        stats = payload["routes"]["search_photos"]
        self.assertEqual(stats["requests"], 2)
        self.assertEqual(stats["errors"], 1)
        self.assertEqual(stats["latency_ms"]["window"], 2)
        self.assertLessEqual(
            stats["latency_ms"]["p50"], stats["latency_ms"]["p99"]
        )
        self.assertGreaterEqual(payload["index"]["count"], 1)
        self.assertEqual(payload["index"]["index_type"], "flat")
        self.assertIn(payload["indexing"]["status"], {"success", "ready"})
        self.assertIn("last_search_timing", payload)
        # the search response's debug names the device path that served it
        debug = ok.get_json()["search_debug"]
        self.assertEqual(debug["index_route"]["impl"], "exact")
        self.assertEqual(debug["index_route"]["mesh_devices"], 0)

    def test_search_requires_json_and_query(self):
        self._build()
        response = self.client.post("/search_photos")
        self.assertEqual(response.status_code, 400)
        response = self.client.post("/search_photos", json_body={"query": "  "})
        self.assertEqual(response.status_code, 400)

    def test_search_409_while_indexing(self):
        self._build()
        with open(self.indexer._lock_path, "w") as f:
            json.dump({"pid": os.getpid(), "created_at": "x", "updated_at": "x"}, f)
        try:
            response = self.client.post(
                "/search_photos", json_body={"query": "beach"}
            )
            self.assertEqual(response.status_code, 409)
            response2 = self.client.post(
                "/search_by_image", json_body={"image_path": self.photos[0]}
            )
            self.assertEqual(response2.status_code, 409)
        finally:
            self.indexer._release_lock()

    def test_init_index_400_while_processing(self):
        with open(self.indexer._lock_path, "w") as f:
            json.dump({"pid": os.getpid(), "created_at": "x", "updated_at": "x"}, f)
        try:
            response = self.client.post("/init_index", json_body={"mode": "full"})
            self.assertEqual(response.status_code, 400)
        finally:
            self.indexer._release_lock()

    def test_search_by_image_route(self):
        self._build()
        response = self.client.post(
            "/search_by_image", json_body={"image_path": self.photos[0], "top_k": 2}
        )
        payload = response.get_json()
        self.assertEqual(payload["status"], "success")
        self.assertNotIn(
            os.path.basename(self.photos[0]),
            [r["file_name"] for r in payload["results"]],
        )

    def test_search_by_image_unknown_path_400(self):
        self._build()
        response = self.client.post(
            "/search_by_image", json_body={"image_path": "/photos/none.jpg"}
        )
        self.assertEqual(response.status_code, 400)

    def test_upload_search_route(self):
        self._build()
        buffer = io.BytesIO()
        Image.new("RGB", (40, 30), (10, 10, 200)).save(buffer, format="JPEG")
        response = self.client.post(
            "/search_by_uploaded_image",
            data={"top_k": "2"},
            files={"image": ("query.jpg", buffer.getvalue())},
        )
        payload = response.get_json()
        self.assertEqual(payload["status"], "success")
        self.assertEqual(payload["query_image_name"], "query.jpg")

    def test_upload_invalid_file_400(self):
        self._build()
        response = self.client.post(
            "/search_by_uploaded_image",
            files={"image": ("bad.jpg", b"this is not an image")},
        )
        self.assertEqual(response.status_code, 400)

    def test_photo_serving_and_guards(self):
        self._build()
        ok = self.client.get(f"/photo?path={self.photos[0]}")
        self.assertEqual(ok.status_code, 200)
        self.assertEqual(ok.headers["Content-Type"], "image/jpeg")
        self.assertEqual(self.client.get("/photo").status_code, 400)
        # normpath collapses inline ..; what remains is judged by extension
        self.assertEqual(
            self.client.get("/photo?path=/etc/../etc/passwd").status_code, 400
        )
        # relative paths that keep .. after normpath are rejected outright
        self.assertEqual(
            self.client.get("/photo?path=../../secret.jpg").status_code, 403
        )
        self.assertEqual(
            self.client.get("/photo?path=/nonexistent/x.jpg").status_code, 404
        )

    def test_open_photo_location_missing_404(self):
        response = self.client.post(
            "/open_photo_location", json_body={"image_path": "/no/such/file.jpg"}
        )
        self.assertEqual(response.status_code, 404)


class RerankPipelineTest(RoutesFixture):
    def test_text_rerank_over_full_pool_then_cut(self):
        self._build()
        response = self.client.post(
            "/search_photos",
            json_body={
                "query": "beach sunset",
                "top_k": 3,
                "rerank_top_k": 2,
                "enable_text_rerank": True,
            },
        )
        payload = response.get_json()
        self.assertTrue(payload["text_reranked"])
        self.assertLessEqual(payload["total_results"], 2)
        self.assertEqual([r["rank"] for r in payload["results"]],
                         list(range(1, len(payload["results"]) + 1)))

    def test_no_rerank_keeps_top_k_cut(self):
        results = [{"photo_path": f"/p/{i}.jpg", "score": 0.9 - i * 0.1} for i in range(5)]
        out, state = apply_rerank_pipeline(
            results=results, top_k=4, rerank_top_k=2,
            enable_text_rerank=False, enable_visual_rerank=False,
            text_query="q", reference_image_path=None,
            text_rerank_service=None, visual_rerank_service=None,
        )
        # no rerank ran: cut at top_k, NOT rerank_top_k
        self.assertEqual(len(out), 4)
        self.assertEqual(state, {"text_reranked": False, "visual_reranked": False})

    def test_visual_rerank_failure_is_non_fatal(self):
        class ExplodingVisual:
            def is_enabled(self):
                return True

            def rerank(self, *a, **k):
                raise RuntimeError("boom")

            def rerank_by_reference_image(self, *a, **k):
                raise RuntimeError("boom")

        results = [{"photo_path": "/p/a.jpg", "score": 0.9}]
        out, state = apply_rerank_pipeline(
            results=results, top_k=1, rerank_top_k=1,
            enable_text_rerank=False, enable_visual_rerank=True,
            text_query="q", reference_image_path=None,
            text_rerank_service=None, visual_rerank_service=ExplodingVisual(),
        )
        self.assertEqual(len(out), 1)
        self.assertFalse(state["visual_reranked"])

    def test_reference_image_takes_priority_over_text(self):
        calls = []

        class Recorder:
            def is_enabled(self):
                return True

            def rerank(self, query, candidates, top_k):
                calls.append("text_mode")
                return candidates[:top_k]

            def rerank_by_reference_image(self, path, candidates, top_k):
                calls.append("reference_mode")
                return candidates[:top_k]

        results = [{"photo_path": "/p/a.jpg", "score": 0.9}]
        apply_rerank_pipeline(
            results=results, top_k=1, rerank_top_k=1,
            enable_text_rerank=False, enable_visual_rerank=True,
            text_query="q", reference_image_path="/ref.jpg",
            text_rerank_service=None, visual_rerank_service=Recorder(),
        )
        self.assertEqual(calls, ["reference_mode"])


if __name__ == "__main__":
    unittest.main()
