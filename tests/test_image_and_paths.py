"""Tests for utils/image_parser.py and utils/path_utils.py
(reference tests/test_image_parser.py, tests/test_path_utils.py)."""

import os
import tempfile
import unittest

from PIL import Image

from photo_search_engine_tpu.utils.image_parser import (
    extract_exif_metadata,
    generate_fallback_description,
    get_file_time,
    is_valid_image,
    resize_and_optimize_image,
)
from photo_search_engine_tpu.utils.path_utils import (
    ensure_display_path,
    normalize_local_path,
    same_file_path,
    windows_to_wsl_path,
    wsl_to_windows_path,
)


def _make_image(path, size=(64, 48), exif_dt=None):
    img = Image.new("RGB", size, color=(120, 40, 200))
    if exif_dt is not None:
        exif = Image.Exif()
        exif[306] = exif_dt  # DateTime tag in the 0th IFD
        img.save(path, exif=exif)
    else:
        img.save(path)


class ImageParserTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.TemporaryDirectory()

    def tearDown(self):
        self.tmp.cleanup()

    def test_is_valid_image(self):
        path = os.path.join(self.tmp.name, "a.jpg")
        _make_image(path)
        self.assertTrue(is_valid_image(path))
        self.assertFalse(is_valid_image(os.path.join(self.tmp.name, "missing.jpg")))
        txt = os.path.join(self.tmp.name, "b.txt")
        with open(txt, "w") as f:
            f.write("nope")
        self.assertFalse(is_valid_image(txt))
        fake = os.path.join(self.tmp.name, "c.jpg")
        with open(fake, "w") as f:
            f.write("not an image")
        self.assertFalse(is_valid_image(fake))

    def test_exif_datetime_extracted_iso(self):
        path = os.path.join(self.tmp.name, "d.jpg")
        _make_image(path, exif_dt="2023:07:15 18:30:00")
        meta = extract_exif_metadata(path)
        self.assertEqual(meta["datetime"], "2023-07-15T18:30:00")

    def test_exif_missing_returns_none_fields(self):
        path = os.path.join(self.tmp.name, "e.jpg")
        _make_image(path)
        meta = extract_exif_metadata(path)
        self.assertIsNone(meta["datetime"])
        self.assertIsNone(meta["gps"])

    def test_file_time_iso(self):
        path = os.path.join(self.tmp.name, "f.jpg")
        _make_image(path)
        self.assertIn("T", get_file_time(path))

    def test_resize_caps_max_edge(self):
        path = os.path.join(self.tmp.name, "big.jpg")
        _make_image(path, size=(800, 400))
        data = resize_and_optimize_image(path, max_size=200, format="JPEG")
        import io

        with Image.open(io.BytesIO(data)) as out:
            self.assertEqual(max(out.size), 200)

    def test_fallback_description(self):
        self.assertEqual(generate_fallback_description("/x/IMG_1234.jpg"), "与IMG相关的照片")
        self.assertEqual(generate_fallback_description("/x/20230101.jpg"), "一张照片")
        self.assertEqual(
            generate_fallback_description("/x/beach_sunset_7.jpg"), "与beach和sunset相关的照片"
        )


class PathUtilsTest(unittest.TestCase):
    def test_windows_wsl_roundtrip(self):
        self.assertEqual(windows_to_wsl_path("C:\\photos\\a.jpg"), "/mnt/c/photos/a.jpg")
        self.assertEqual(wsl_to_windows_path("/mnt/c/photos/a.jpg"), "C:\\photos\\a.jpg")
        self.assertEqual(windows_to_wsl_path("/already/posix"), "/already/posix")

    def test_normalize_windows_on_posix(self):
        if os.name != "nt":
            self.assertEqual(normalize_local_path("C:/photos/a.jpg"), "/mnt/c/photos/a.jpg")

    def test_normalize_strips_quotes(self):
        self.assertEqual(normalize_local_path('"/tmp/x.jpg"'), "/tmp/x.jpg")

    def test_display_path_prefers_windows(self):
        self.assertEqual(ensure_display_path("/mnt/c/p/a.jpg"), "C:\\p\\a.jpg")
        self.assertEqual(ensure_display_path("/home/u/a.jpg"), "/home/u/a.jpg")

    def test_same_file_path_case_insensitive(self):
        self.assertTrue(same_file_path("/tmp/A.JPG", "/tmp/A.JPG"))
        self.assertFalse(same_file_path("/tmp/a.jpg", "/tmp/b.jpg"))


if __name__ == "__main__":
    unittest.main()
