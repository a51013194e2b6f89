"""Regression tests for the round-1 code-review findings (each was a
repro-confirmed defect)."""

import os
import tempfile
import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.parallel import (
    ShardedEmbeddingStore,
    make_mesh,
    sharded_exact_search,
)


class ShardedPallasCountTest(unittest.TestCase):
    """Padding rows must be masked inside the scan, not post-hoc."""

    def test_negative_similarity_with_padding(self):
        rng = np.random.default_rng(0)
        mesh = make_mesh()
        # live rows all strongly negative similarity to the query;
        # padding rows (zeros) would score 0 and win without in-scan masks
        corpus = np.full((8 * 128, 16), -1.0, np.float32)
        counts = np.full(8, 100, np.int32)
        query = np.ones((1, 16), np.float32)
        for impl in ("lax", "pallas"):
            vals, idx = sharded_exact_search(
                jnp.asarray(corpus), jnp.asarray(query), 5, mesh,
                counts=counts, impl=impl,
            )
            idx = np.asarray(idx)
            self.assertTrue((idx >= 0).all(), f"impl={impl} returned empty slots")
            # every hit is a live row (local index < 100 within its shard)
            self.assertTrue(((idx % 128) < 100).all())
            self.assertTrue(np.allclose(np.asarray(vals), -16.0), impl)
        del rng

    def test_l2_pallas_matches_lax(self):
        rng = np.random.default_rng(1)
        mesh = make_mesh()
        corpus = rng.normal(size=(8 * 64, 16)).astype(np.float32)
        queries = rng.normal(size=(3, 16)).astype(np.float32)
        v_lax, i_lax = sharded_exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 5, mesh,
            metric="l2", impl="lax",
        )
        v_pl, i_pl = sharded_exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 5, mesh,
            metric="l2", impl="pallas",
        )
        np.testing.assert_array_equal(np.asarray(i_lax), np.asarray(i_pl))
        np.testing.assert_allclose(np.asarray(v_lax), np.asarray(v_pl),
                                   rtol=1e-4, atol=1e-4)

    def test_k_larger_than_shard_rows(self):
        rng = np.random.default_rng(2)
        mesh = make_mesh()
        corpus = rng.normal(size=(8 * 16, 8)).astype(np.float32)
        queries = rng.normal(size=(2, 8)).astype(np.float32)
        vals, idx = sharded_exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 50, mesh
        )
        self.assertEqual(np.asarray(idx).shape, (2, 50))
        scores = queries @ corpus.T
        ref = np.argsort(-scores, axis=1, kind="stable")[:, :50]
        np.testing.assert_array_equal(np.asarray(idx), ref)


class StableIdTest(unittest.TestCase):
    """Returned ids must survive capacity growth."""

    def test_ids_stable_across_growth(self):
        store = ShardedEmbeddingStore(8, make_mesh(), metric="ip", shard_block=8)
        rng = np.random.default_rng(3)
        first = rng.normal(size=(64, 8)).astype(np.float32)
        ids_first = store.append(first)
        # grow capacity well past the original hint
        store.append(rng.normal(size=(200, 8)).astype(np.float32))
        for row, stable_id in zip(first[:10], ids_first[:10]):
            np.testing.assert_allclose(store.reconstruct(int(stable_id)), row,
                                       rtol=1e-6)

    def test_search_ids_decode_after_growth(self):
        # cosine so the query's own row is always the nearest hit
        store = ShardedEmbeddingStore(8, make_mesh(), metric="cosine", shard_block=8)
        rng = np.random.default_rng(4)
        vectors = rng.normal(size=(30, 8)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        store.append(vectors)
        store.append(rng.normal(size=(100, 8)).astype(np.float32))
        _, idx = store.search(vectors[7], 1)
        np.testing.assert_allclose(
            store.reconstruct(int(idx[0][0])), vectors[7], rtol=1e-5
        )


class StaleIvfReloadTest(unittest.TestCase):
    """A reload with the same row count must rebuild the IVF layout."""

    def test_reload_invalidates_ivf(self):
        rng = np.random.default_rng(5)
        with tempfile.TemporaryDirectory() as tmp:
            def make():
                return VectorIndex(
                    dimension=16,
                    index_path=os.path.join(tmp, "ps.index"),
                    metadata_path=os.path.join(tmp, "m.json"),
                    index_type="ivf",
                    ivf_nlist=4,
                    ivf_nprobe=4,
                )

            a_vectors = rng.normal(size=(16, 16)).astype(np.float32)
            vi = make()
            vi.add_batch(a_vectors, [{"photo_path": f"/a/{i}.jpg"} for i in range(16)])
            vi.search(a_vectors[0].tolist(), 1)  # builds IVF for corpus A
            # full rebuild with DIFFERENT vectors but the same count
            b_vectors = rng.normal(size=(16, 16)).astype(np.float32)
            vi.clear()
            vi.add_batch(b_vectors, [{"photo_path": f"/b/{i}.jpg"} for i in range(16)])
            vi.save()
            vi.load()
            hits = vi.search(b_vectors[5].tolist(), 1)
            self.assertEqual(hits[0]["metadata"]["photo_path"], "/b/5.jpg")


class LargeKRoutingTest(unittest.TestCase):
    """k beyond the pallas unroll budget routes to the XLA path and stays
    correct (the searcher passes candidate_k up to ~1000)."""

    def test_large_k_exact(self):
        from photo_search_engine_tpu.ops import exact_search

        rng = np.random.default_rng(6)
        corpus = rng.normal(size=(600, 16)).astype(np.float32)
        queries = rng.normal(size=(2, 16)).astype(np.float32)
        vals, idx = exact_search(
            jnp.asarray(corpus), jnp.asarray(queries), 500, impl="pallas"
        )
        scores = queries @ corpus.T
        ref = np.argsort(-scores, axis=1, kind="stable")[:, :500]
        np.testing.assert_array_equal(np.asarray(idx), ref)


class QueryGateInterruptTest(unittest.TestCase):
    """Round-4 review: an interrupted queued waiter must not leak the
    gate's permit (pre-fix: the releasing thread handed the permit to
    the dead waiter's Event and every later search blocked forever)."""

    class _Boom(BaseException):
        pass

    def _gate(self):
        from photo_search_engine_tpu.core.keyword_index import _LazyQueryGate

        gate = _LazyQueryGate()
        gate._permits = 1
        return gate

    def test_interrupt_before_handoff(self):
        import threading

        from photo_search_engine_tpu.core import keyword_index as ki

        gate = self._gate()
        gate.__enter__()  # take the only permit

        orig_event = threading.Event

        class _RaisingEvent(orig_event):
            def wait(self, *a, **k):
                raise QueryGateInterruptTest._Boom()

        ki.threading.Event = _RaisingEvent
        try:
            with self.assertRaises(self._Boom):
                gate.__enter__()  # queued waiter interrupted mid-wait
        finally:
            ki.threading.Event = orig_event
        self.assertEqual(len(gate._waiters), 0)
        gate.__exit__(None, None, None)  # holder releases
        self.assertEqual(gate._permits, 1)  # permit is back
        gate.__enter__()  # and a fresh acquire succeeds without blocking
        gate.__exit__(None, None, None)

    def test_interrupt_after_handoff_forwards_permit(self):
        import threading

        from photo_search_engine_tpu.core import keyword_index as ki

        gate = self._gate()
        gate.__enter__()

        orig_event = threading.Event

        class _HandoffThenRaise(orig_event):
            def wait(self, *a, **k):
                # the holder releases WHILE we are blocked: the permit is
                # handed to this event... and then the wait is interrupted
                gate.__exit__(None, None, None)
                raise QueryGateInterruptTest._Boom()

        ki.threading.Event = _HandoffThenRaise
        try:
            with self.assertRaises(self._Boom):
                gate.__enter__()
        finally:
            ki.threading.Event = orig_event
        # the handed-off permit was forwarded back, not lost
        self.assertEqual(gate._permits, 1)
        gate.__enter__()
        gate.__exit__(None, None, None)


class SpmdShutdownGuardTest(unittest.TestCase):
    """Round-4 review: after shutdown_followers() on a multi-controller
    mesh, device ops must fail fast instead of 'executing locally' —
    the local dispatch enters the same cross-process collectives the
    skipped broadcast guarded, hanging rank 0."""

    def _bare(self, world: int, shutdown: bool):
        import threading

        from photo_search_engine_tpu.parallel.spmd_serving import (
            SPMDVectorIndex,
        )

        index = object.__new__(SPMDVectorIndex)
        index._spmd_rank = 0
        index._spmd_world = world
        index._spmd_lock = threading.RLock()
        index._spmd_shutdown = shutdown
        return index

    def test_post_shutdown_multicontroller_raises(self):
        index = self._bare(world=2, shutdown=True)
        # RuntimeError must fire BEFORE any broadcast or device dispatch
        # (the bare instance has no store — reaching super() would fail
        # with AttributeError instead)
        for call in (
            lambda: index._route_search(np.zeros((1, 4), np.float32), 1, None),
            lambda: index.raw_grouped_search_batch(
                np.zeros((1, 4), np.float32), 1,
                np.ones((1, 8), np.uint8), np.zeros(1, np.int64),
            ),
            lambda: index.load(),
            lambda: index.clear(),
        ):
            with self.assertRaisesRegex(RuntimeError, "shut down"):
                call()

    def test_single_process_unaffected(self):
        index = self._bare(world=1, shutdown=True)
        index._check_live()  # must not raise: no followers to hang on


class PathKeyCwdTest(unittest.TestCase):
    """Round-4 review: relative/~ photo paths absolutize against the
    live CWD — the process-global _path_key cache must not pin the
    first call's CWD for the process lifetime."""

    def test_relative_path_follows_cwd(self):
        from photo_search_engine_tpu.core.searcher import Searcher

        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as a, \
                tempfile.TemporaryDirectory() as b:
            try:
                os.chdir(a)
                key_a = Searcher._path_key("photos/x.jpg")
                os.chdir(b)
                key_b = Searcher._path_key("photos/x.jpg")
            finally:
                os.chdir(cwd)
        self.assertNotEqual(key_a, key_b)
        self.assertTrue(key_a.replace("\\", "/").endswith("photos/x.jpg"))

    def test_absolute_path_still_cached(self):
        from photo_search_engine_tpu.core.searcher import Searcher

        Searcher._path_key_cached.cache_clear()
        self.assertEqual(
            Searcher._path_key("/p/beach.jpg"), "/p/beach.jpg"
        )
        self.assertGreaterEqual(
            Searcher._path_key_cached.cache_info().currsize, 1
        )


if __name__ == "__main__":
    unittest.main()
