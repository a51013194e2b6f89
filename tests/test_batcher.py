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

    def test_mixed_filtered_and_unfiltered_batch(self):
        """Concurrent requests with DIFFERENT predicates coalesce through
        the grouped-mask kernel; each respects its own filter."""
        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=8,
                index_path=os.path.join(tmp, "ps.index"),
                metadata_path=os.path.join(tmp, "m.json"),
                metric="cosine",
            )
            rng = np.random.default_rng(3)
            vectors = rng.normal(size=(40, 8)).astype(np.float32)
            vi.add_batch(vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(40)])
            batcher = attach_microbatcher(vi, window_s=0.05)

            even = np.zeros(40, bool); even[::2] = True
            low = np.zeros(40, bool); low[:20] = True
            results = {}

            def worker(i):
                if i % 3 == 0:
                    hits = vi.search(vectors[i].tolist(), 3)  # unfiltered
                elif i % 3 == 1:
                    hits = vi.search_masked(vectors[i].tolist(), 3, even)
                else:
                    hits = vi.search_masked(vectors[i].tolist(), 3, low)
                results[i] = [h["metadata"]["photo_path"] for h in hits]

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(9)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            batcher.close()
            for i in range(9):
                ids = [int(p.split("/")[-1][:-4]) for p in results[i]]
                if i % 3 == 0:
                    self.assertEqual(ids[0], i)  # self-hit, no filter
                elif i % 3 == 1:
                    self.assertTrue(all(x % 2 == 0 for x in ids), (i, ids))
                else:
                    self.assertTrue(all(x < 20 for x in ids), (i, ids))
            # filtered + unfiltered requests shared grouped batches
            self.assertGreaterEqual(batcher.grouped_batches_run, 1)
            self.assertLessEqual(batcher.batches_run, 9)

    def test_many_distinct_predicates_bounded_table(self):
        """64 distinct per-request predicates in one batch: results stay
        correct, every grouped device call sees a table bounded by
        mask_table_cap, and table sizes land on the {2,4,8} buckets (one
        compile per bucket, not one per distinct predicate count)."""
        tables_seen = []

        def run_grouped(queries, k, table, ids):
            tables_seen.append(table.shape[0])
            per_query = table[ids] > 0  # [B, N]
            scores = queries @ corpus.T
            scores = np.where(per_query, scores, -np.inf)
            idx = np.argsort(-scores, axis=1)[:, :k]
            return np.take_along_axis(scores, idx, axis=1), idx.astype(np.int32)

        def run_batch(queries, k):
            scores = queries @ corpus.T
            idx = np.argsort(-scores, axis=1)[:, :k]
            return np.take_along_axis(scores, idx, axis=1), idx.astype(np.int32)

        rng = np.random.default_rng(5)
        corpus = rng.normal(size=(128, 8)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        batcher = MicroBatcher(
            run_batch, run_grouped_batch=run_grouped, max_batch=64,
            window_s=0.2, pipeline=1,
        )
        results = {}

        def worker(i):
            # predicate i: only rows with index % 64 == i pass — 64
            # DISTINCT masks, the adversarial per-request-date-filter mix
            mask = (np.arange(128) % 64) == i
            dists, idx = batcher.search(corpus[i], 2, mask=mask)
            results[i] = idx.tolist()

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(64)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batcher.close()
        for i in range(64):
            # rows i and i+64 are the only ones passing predicate i
            self.assertEqual(sorted(results[i]), [i, i + 64], i)
        # staging bounded: no call saw more than the cap's bucket
        self.assertTrue(tables_seen, "grouped path never ran")
        self.assertLessEqual(max(tables_seen), MicroBatcher.mask_table_cap)
        # bucketed shapes only — bounded compile count
        self.assertTrue(set(tables_seen) <= {2, 4, 8}, tables_seen)

    def test_quantized_index_grouped_batch(self):
        with tempfile.TemporaryDirectory() as tmp:
            vi = VectorIndex(
                dimension=8,
                index_path=os.path.join(tmp, "ps.index"),
                metadata_path=os.path.join(tmp, "m.json"),
                metric="cosine",
                quantized=True,
            )
            rng = np.random.default_rng(4)
            vectors = rng.normal(size=(30, 8)).astype(np.float32)
            vi.add_batch(vectors, [{"photo_path": f"/p/{i}.jpg"} for i in range(30)])
            batcher = attach_microbatcher(vi, window_s=0.02)
            mask = np.zeros(30, bool); mask[:10] = True
            hits = vi.search_masked(vectors[0].tolist(), 3, mask)
            batcher.close()
            ids = [int(h["metadata"]["photo_path"].split("/")[-1][:-4]) for h in hits]
            self.assertTrue(all(x < 10 for x in ids), ids)
            self.assertEqual(ids[0], 0)


class PipelineTest(unittest.TestCase):
    def _run(self, pipeline):
        import threading
        import time as _time

        from photo_search_engine_tpu.core.batcher import MicroBatcher

        state = {"inflight": 0, "peak": 0}
        gate = threading.Lock()

        def run_batch(queries, k):
            with gate:
                state["inflight"] += 1
                state["peak"] = max(state["peak"], state["inflight"])
            _time.sleep(0.05)  # a slow dispatch/fetch round trip
            with gate:
                state["inflight"] -= 1
            return (
                np.tile(queries[:, :1], (1, k)),
                np.tile(np.arange(k, dtype=np.int64)[None, :], (queries.shape[0], 1)),
            )

        batcher = MicroBatcher(run_batch, window_s=0.0, pipeline=pipeline)
        results = []
        lock = threading.Lock()

        def worker(i):
            vals, idx = batcher.search(np.full(4, float(i), np.float32), 3)
            with lock:
                results.append((i, float(vals[0])))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batcher.close()
        self.assertEqual(len(results), 12)
        for i, val in results:
            self.assertEqual(val, float(i))  # every caller got ITS slice
        return state["peak"]

    def test_pipeline_overlaps_batches(self):
        # zero linger window → many small batches; depth 2 must overlap
        self.assertGreaterEqual(self._run(pipeline=2), 2)

    def test_pipeline_one_is_strictly_serial(self):
        self.assertEqual(self._run(pipeline=1), 1)

    def test_close_drains_queued_requests(self):
        import threading
        import time as _time

        from photo_search_engine_tpu.core.batcher import MicroBatcher

        def run_batch(queries, k):
            _time.sleep(0.03)
            return (
                np.tile(queries[:, :1], (1, k)),
                np.zeros((queries.shape[0], k), np.int64),
            )

        batcher = MicroBatcher(run_batch, window_s=0.05, pipeline=2)
        results = []
        lock = threading.Lock()

        def worker(i):
            vals, _ = batcher.search(np.full(4, float(i), np.float32), 2)
            with lock:
                results.append(float(vals[0]))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        _time.sleep(0.01)
        batcher.close()  # must serve everything already enqueued
        for t in threads:
            t.join(timeout=10)
        self.assertEqual(sorted(results), [float(i) for i in range(6)])
        # a post-close request revives the worker (the revivable contract)
        vals, _ = batcher.search(np.full(4, 9.0, np.float32), 2)
        self.assertEqual(float(vals[0]), 9.0)
        batcher.close()


class CallBatcherTest(unittest.TestCase):
    def test_concurrent_calls_coalesce_and_dedupe(self):
        from photo_search_engine_tpu.core.batcher import CallBatcher

        calls = []

        def run_batch(items):
            calls.append(list(items))
            return [item.upper() for item in items]

        batcher = CallBatcher(run_batch, window_s=0.05)
        results = {}

        def worker(text):
            results[text] = batcher.submit(text)

        import threading

        texts = ["a", "b", "a", "c", "b", "a"]
        threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batcher.close()
        self.assertEqual(results, {"a": "A", "b": "B", "c": "C"})
        # 6 submissions coalesced into fewer batch calls, each deduplicated
        self.assertLess(len(calls), 6)
        for batch in calls:
            self.assertEqual(len(batch), len(set(batch)))

    def test_errors_propagate_to_all_waiters(self):
        from photo_search_engine_tpu.core.batcher import CallBatcher

        batcher = CallBatcher(
            lambda items: (_ for _ in ()).throw(RuntimeError("boom")),
            window_s=0.02,
        )
        with self.assertRaises(RuntimeError):
            batcher.submit("x")
        batcher.close()

    def test_result_count_mismatch_fails_loudly(self):
        from photo_search_engine_tpu.core.batcher import CallBatcher

        batcher = CallBatcher(lambda items: [], window_s=0.01)
        with self.assertRaises(RuntimeError):
            batcher.submit("x")
        batcher.close()


class BatchedEmbeddingServiceTest(unittest.TestCase):
    def test_matches_wrapped_service_under_concurrency(self):
        import threading

        from photo_search_engine_tpu.core.batcher import BatchedEmbeddingService
        from photo_search_engine_tpu.models.hash_embedder import (
            HashingEmbeddingService,
        )

        inner = HashingEmbeddingService(dimension=32)
        batch_calls = {"n": 0}
        real_batch = inner.generate_embedding_batch

        def counting_batch(texts):
            batch_calls["n"] += 1
            return real_batch(texts)

        inner.generate_embedding_batch = counting_batch
        wrapped = BatchedEmbeddingService(inner, window_s=0.05)
        texts = [f"海边 日落 {i % 4}" for i in range(16)]
        expected = {t: inner.generate_embedding(t) for t in set(texts)}
        got = {}
        lock = threading.Lock()

        def worker(text):
            vec = wrapped.generate_embedding(text)
            with lock:
                got[text] = vec

        before = batch_calls["n"]
        threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        self.assertEqual(got, expected)
        self.assertLess(batch_calls["n"] - before, 16)  # coalesced
        # contract passthrough: empty input raises like the wrapped service
        with self.assertRaises(ValueError):
            wrapped.generate_embedding("   ")
        # attribute passthrough
        self.assertEqual(wrapped.dimension, 32)


if __name__ == "__main__":
    unittest.main()
