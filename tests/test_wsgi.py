"""Tests for the WSGI micro-framework itself (api/wsgi.py)."""

import unittest

from photo_search_engine_tpu.api.wsgi import App, Response, json_response


def _make_app():
    app = App()

    @app.route("/echo", methods=["POST"])
    def echo(request):
        return {"json": request.get_json(silent=True), "query": request.query}

    @app.route("/form", methods=["POST"])
    def form(request):
        files = {
            name: [f.filename, len(f.content)] for name, f in request.files.items()
        }
        return {"form": request.form, "files": files}

    @app.route("/bytes")
    def raw(request):
        return Response(b"\x00\x01binary", content_type="application/octet-stream")

    @app.route("/boom")
    def boom(request):
        raise RuntimeError("kaboom")

    @app.route("/status")
    def status(request):
        return {"accepted": True}, 409

    return app


class WsgiTest(unittest.TestCase):
    def setUp(self):
        self.client = _make_app().test_client()

    def test_json_roundtrip_and_query(self):
        response = self.client.post("/echo?a=1&b=two", json_body={"x": [1, 2]})
        self.assertEqual(response.status_code, 200)
        payload = response.get_json()
        self.assertEqual(payload["json"], {"x": [1, 2]})
        self.assertEqual(payload["query"], {"a": "1", "b": "two"})

    def test_malformed_json_is_none(self):
        app = _make_app()
        client = app.test_client()
        # send invalid JSON through a raw request
        import io

        environ = {
            "REQUEST_METHOD": "POST",
            "PATH_INFO": "/echo",
            "QUERY_STRING": "",
            "CONTENT_TYPE": "application/json",
            "CONTENT_LENGTH": "9",
            "wsgi.input": io.BytesIO(b"not json!"),
        }
        captured = {}
        body = b"".join(app(environ, lambda s, h: captured.update(status=s)))
        self.assertIn(b'"json": null', body)

    def test_multipart_files_and_fields(self):
        response = self.client.post(
            "/form",
            data={"top_k": "5", "中文键": "值"},
            files={"image": ("photo.jpg", b"\xff\xd8\xff binary bytes")},
        )
        payload = response.get_json()
        self.assertEqual(payload["form"]["top_k"], "5")
        self.assertEqual(payload["form"]["中文键"], "值")
        self.assertEqual(payload["files"]["image"][0], "photo.jpg")
        self.assertEqual(payload["files"]["image"][1], len(b"\xff\xd8\xff binary bytes"))

    def test_method_not_allowed(self):
        response = self.client.get("/echo")
        self.assertEqual(response.status_code, 405)

    def test_unknown_path_404(self):
        response = self.client.get("/missing")
        self.assertEqual(response.status_code, 404)

    def test_handler_exception_becomes_500(self):
        response = self.client.get("/boom")
        self.assertEqual(response.status_code, 500)
        self.assertEqual(response.get_json()["status"], "error")

    def test_custom_status_tuple(self):
        response = self.client.get("/status")
        self.assertEqual(response.status_code, 409)
        self.assertTrue(response.get_json()["accepted"])

    def test_binary_response(self):
        response = self.client.get("/bytes")
        self.assertEqual(response.data, b"\x00\x01binary")
        self.assertEqual(response.headers["Content-Type"], "application/octet-stream")

    def test_json_response_unicode(self):
        response = json_response({"msg": "中文"})
        self.assertIn("中文".encode("utf-8"), response.body)


if __name__ == "__main__":
    unittest.main()
