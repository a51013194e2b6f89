"""Tests for tools/migrate.py (FAISS-binary vector extraction, metadata
repair, end-to-end migration) and tools/recall_eval.py."""

import json
import os
import struct
import tempfile
import unittest

import numpy as np

from photo_search_engine_tpu.tools.migrate import (
    extract_faiss_vectors,
    migrate,
    repair_metadata_item,
)

_REFERENCE_DATA = "/root/reference/data"


def _fake_faiss_binary(path, vectors):
    """Layout mimicking FAISS flat storage: junk header, then the vector
    block as an int64 element-count prefix + raw float32 data."""
    n, d = vectors.shape
    with open(path, "wb") as f:
        f.write(b"IHNf" + os.urandom(64))
        f.write(struct.pack("<q", n * d))
        f.write(np.asarray(vectors, np.float32).tobytes())
        f.write(os.urandom(32))


class ExtractTest(unittest.TestCase):
    def test_extracts_vector_block(self):
        rng = np.random.default_rng(0)
        vectors = rng.normal(size=(13, 32)).astype(np.float32)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "x.index")
            _fake_faiss_binary(path, vectors)
            out = extract_faiss_vectors(path, 13, 32)
            np.testing.assert_allclose(out, vectors)

    def test_missing_block_raises(self):
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "bad.index")
            with open(path, "wb") as f:
                f.write(os.urandom(256))
            with self.assertRaises(ValueError):
                extract_faiss_vectors(path, 10, 16)


class RepairTest(unittest.TestCase):
    def test_stringified_fields_parsed(self):
        fixed = repair_metadata_item(
            {
                "media_types": "['自然风光', '户外摄影']",
                "analysis_flags": "{'text_heavy': True}",
                "identity_names": "[]",
                "time_info": "{'year': 2023}",
                "index_text_version": "2",
                "description": "untouched",
            }
        )
        self.assertEqual(fixed["media_types"], ["自然风光", "户外摄影"])
        self.assertEqual(fixed["analysis_flags"], {"text_heavy": True})
        self.assertEqual(fixed["time_info"], {"year": 2023})
        self.assertEqual(fixed["index_text_version"], 2)
        self.assertEqual(fixed["description"], "untouched")

    def test_malformed_strings_left_alone(self):
        fixed = repair_metadata_item({"media_types": "[broken"})
        self.assertEqual(fixed["media_types"], "[broken")


class MigrateRoundtripTest(unittest.TestCase):
    def test_synthetic_migration(self):
        rng = np.random.default_rng(1)
        vectors = rng.normal(size=(9, 16)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        metadata = [
            {
                "photo_path": f"/p/{i}.jpg",
                "description": f"照片{i}",
                "retrieval_text": f"照片 文本 {i}",
                "media_types": "['photo']",
                "time_info": "{'season': '夏天', 'year': 2023}" if i % 2 else "{}",
                "index_text_version": "2",
            }
            for i in range(9)
        ]
        with tempfile.TemporaryDirectory() as tmp:
            index_path = os.path.join(tmp, "ref.index")
            metadata_path = os.path.join(tmp, "metadata.json")
            _fake_faiss_binary(index_path, vectors)
            with open(metadata_path, "w") as f:
                json.dump(metadata, f)
            with open(index_path + ".meta.json", "w") as f:
                json.dump({"metric": "cosine", "dimension": 16}, f)
            out_dir = os.path.join(tmp, "out")
            report = migrate(index_path, metadata_path, out_dir)
            self.assertEqual(report["count"], 9)

            from photo_search_engine_tpu.core.vector_index import VectorIndex

            vi = VectorIndex(
                dimension=16,
                index_path=os.path.join(out_dir, "photo_search.index"),
                metadata_path=os.path.join(out_dir, "metadata.json"),
            )
            self.assertTrue(vi.load())
            hits = vi.search(vectors[3].tolist(), 1)
            self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/3.jpg")
            self.assertEqual(hits[0]["metadata"]["media_types"], ["photo"])

            from photo_search_engine_tpu.tools.recall_eval import evaluate

            report = evaluate(out_dir, k=3)
            self.assertEqual(report["exact_recall_at_k"], 1.0)

    def test_migrate_to_ivf_sidecar(self):
        rng = np.random.default_rng(2)
        vectors = rng.normal(size=(24, 16)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        metadata = [
            {"photo_path": f"/p/{i}.jpg", "description": f"d{i}",
             "index_text_version": "2"}
            for i in range(24)
        ]
        with tempfile.TemporaryDirectory() as tmp:
            index_path = os.path.join(tmp, "ref.index")
            metadata_path = os.path.join(tmp, "metadata.json")
            _fake_faiss_binary(index_path, vectors)
            with open(metadata_path, "w") as f:
                json.dump(metadata, f)
            with open(index_path + ".meta.json", "w") as f:
                json.dump({"metric": "cosine", "dimension": 16}, f)
            out_dir = os.path.join(tmp, "out")
            migrate(index_path, metadata_path, out_dir, index_type="ivf")

            from photo_search_engine_tpu.core.vector_index import VectorIndex

            # an ivf-configured server opens the migrated corpus directly
            vi = VectorIndex(
                dimension=16,
                index_path=os.path.join(out_dir, "photo_search.index"),
                metadata_path=os.path.join(out_dir, "metadata.json"),
                index_type="ivf", ivf_nlist=4, ivf_nprobe=4,
            )
            self.assertTrue(vi.load())
            hits = vi.search(vectors[3].tolist(), 1)
            self.assertEqual(hits[0]["metadata"]["photo_path"], "/p/3.jpg")
            # while a flat-configured one refuses (type mismatch)
            flat = VectorIndex(
                dimension=16,
                index_path=os.path.join(out_dir, "photo_search.index"),
                metadata_path=os.path.join(out_dir, "metadata.json"),
            )
            with self.assertRaises(ValueError):
                flat.load()

    @unittest.skipUnless(
        os.path.isdir(_REFERENCE_DATA), "reference data not mounted"
    )
    def test_reference_corpus_migration(self):
        with tempfile.TemporaryDirectory() as tmp:
            report = migrate(
                os.path.join(_REFERENCE_DATA, "photo_search.index"),
                os.path.join(_REFERENCE_DATA, "metadata.json"),
                tmp,
            )
            self.assertEqual(report["count"], 77)
            self.assertEqual(report["dimension"], 4096)


if __name__ == "__main__":
    unittest.main()


class ReplayForensicsTest(unittest.TestCase):
    def test_transport_fault_verdict(self):
        # a dump whose bad indices exceed the corpus must replay IN RANGE
        # against a healthy backend (exit 0 = transport-fault verdict)
        import subprocess
        import sys
        import tempfile

        import numpy as np

        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory() as tmp:
            dump = f"{tmp}/dump.npz"
            np.savez(
                dump,
                queries=rng.normal(size=(2, 16)).astype(np.float32),
                k=np.int64(4),
                count=np.int64(300),
                what=np.bytes_(b"batched search"),
                bad_idx=np.full((2, 4), 999, np.int64),
            )
            result = subprocess.run(
                [
                    sys.executable, "-m",
                    "photo_search_engine_tpu.tools.replay_forensics",
                    dump, "--rows", "300", "--dim", "16", "--platform", "cpu",
                ],
                capture_output=True, text=True, timeout=300,
            )
        self.assertEqual(result.returncode, 0, result.stdout + result.stderr)
        self.assertIn("transport fault confirmed", result.stdout)
