"""Tests for the serving-path micro-batcher."""

import os
import tempfile
import threading
import unittest

import numpy as np

from photo_search_engine_tpu.core.batcher import MicroBatcher, attach_microbatcher
from photo_search_engine_tpu.core.vector_index import VectorIndex


class MicroBatcherTest(unittest.TestCase):
    def test_concurrent_requests_coalesce(self):
        calls = []

        def run_batch(queries, k):
            calls.append(queries.shape[0])
            scores = queries @ self.corpus.T
            idx = np.argsort(-scores, axis=1)[:, :k]
            return np.take_along_axis(scores, idx, axis=1), idx

        rng = np.random.default_rng(0)
        self.corpus = rng.normal(size=(50, 8)).astype(np.float32)
        self.corpus /= np.linalg.norm(self.corpus, axis=1, keepdims=True)
        batcher = MicroBatcher(run_batch, max_batch=64, window_s=0.05)

        results = {}

        def worker(i):
            query = self.corpus[i]
            dists, idx = batcher.search(query, 3)
            results[i] = int(idx[0])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batcher.close()
        # every request got its own nearest row
        for i in range(16):
            self.assertEqual(results[i], i)
        # coalesced into far fewer device calls than requests
        self.assertLess(len(calls), 16)
        self.assertEqual(sum(calls), 16)

    def test_mixed_k_values(self):
        def run_batch(queries, k):
            scores = queries @ corpus.T
            idx = np.argsort(-scores, axis=1)[:, :k]
            return np.take_along_axis(scores, idx, axis=1), idx

        rng = np.random.default_rng(1)
        corpus = rng.normal(size=(20, 4)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        batcher = MicroBatcher(run_batch, window_s=0.05)
        outs = {}

        def worker(i, k):
            dists, idx = batcher.search(corpus[i], k)
            outs[i] = (len(dists), int(idx[0]))

        threads = [
            threading.Thread(target=worker, args=(0, 2)),
            threading.Thread(target=worker, args=(1, 5)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batcher.close()
        self.assertEqual(outs[0], (2, 0))
        self.assertEqual(outs[1], (5, 1))

    def test_errors_propagate(self):
        def run_batch(queries, k):
            raise RuntimeError("device on fire")

        batcher = MicroBatcher(run_batch, window_s=0.01)
        with self.assertRaises(RuntimeError):
            batcher.search(np.zeros(4, np.float32), 2)
        batcher.close()

    def test_attach_to_vector_index(self):
        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=8,
                index_path=os.path.join(tmp, "ps.index"),
                metadata_path=os.path.join(tmp, "m.json"),
                metric="cosine",
            )
            rng = np.random.default_rng(2)
            vectors = rng.normal(size=(30, 8)).astype(np.float32)
            vi.add_batch(vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(30)])
            batcher = attach_microbatcher(vi, window_s=0.02)

            results = {}

            def worker(i):
                hits = vi.search(vectors[i].tolist(), 2)
                results[i] = hits[0]["metadata"]["photo_path"]

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            batcher.close()
            for i in range(8):
                self.assertEqual(results[i], f"/p/{i}.jpg")
            self.assertLessEqual(batcher.batches_run, 8)
            self.assertEqual(batcher.requests_served, 8)


if __name__ == "__main__":
    unittest.main()
