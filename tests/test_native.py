"""Tests for the native C++ components: compile, correctness, and exact
parity with the pure-Python fallbacks."""

import unittest

import numpy as np

from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.models.ivf import balanced_layout
from photo_search_engine_tpu.native import native_available


def _doc(path, retrieval_text, **extra):
    doc = {
        "photo_path": path,
        "description": retrieval_text,
        "retrieval_text": retrieval_text,
        "file_name": path.rsplit("/", 1)[-1],
    }
    doc.update(extra)
    return doc


class NativeBuildTest(unittest.TestCase):
    def test_library_compiles_and_loads(self):
        self.assertTrue(native_available(), "g++ is present; the lib must build")


class NativeLayoutTest(unittest.TestCase):
    def test_layout_places_every_row_once(self):
        rng = np.random.default_rng(0)
        n, nlist = 5000, 16
        ranked = rng.integers(0, nlist, size=(n, 3)).astype(np.int64)
        cluster_of_row, perm, capacity = balanced_layout(ranked, nlist, slack=1.3)
        live = perm[perm >= 0]
        self.assertEqual(len(live), n)
        self.assertEqual(len(set(live.tolist())), n)
        fills = np.bincount(cluster_of_row, minlength=nlist)
        self.assertTrue((fills <= capacity).all())

    def test_layout_prefers_first_choice(self):
        ranked = np.array([[2, 0, 1]] * 10, np.int64)
        cluster_of_row, perm, capacity = balanced_layout(ranked, nlist=4, slack=4.0)
        self.assertTrue((cluster_of_row == 2).all())


class NativeBm25ParityTest(unittest.TestCase):
    def _build_pair(self):
        docs = [
            ("1", _doc("/p/beach.jpg", "海边 沙滩 日落 photo", season="夏天")),
            ("2", _doc("/p/city.jpg", "城市 夜景 大楼 photo")),
            ("3", _doc("/p/dog.jpg", "狗 宠物 草地 photo")),
            ("4", _doc("/p/red_car.jpg", "red car on road")),
            ("5", _doc("/p/crash.jpg", "car crashed red light road")),
        ]
        native = KeywordIndex(native=True)
        python = KeywordIndex(native=False)
        self.assertIsNotNone(native._native)
        self.assertIsNone(python._native)
        for doc_id, doc in docs:
            native.add_document(doc_id, doc)
            python.add_document(doc_id, doc)
        return native, python

    def assert_same_hits(self, a, b):
        self.assertEqual(len(a), len(b))
        for ha, hb in zip(a, b):
            self.assertEqual(ha["photo_path"], hb["photo_path"])
            self.assertAlmostEqual(ha["score"], hb["score"], places=9)

    def test_search_parity(self):
        native, python = self._build_pair()
        for query in ("海边 日落", "red car", "photo 城市", "狗", "nothing here"):
            self.assert_same_hits(native.search(query), python.search(query))

    def test_filters_parity(self):
        native, python = self._build_pair()
        self.assert_same_hits(
            native.search_with_filters("海边", {"season": "夏天"}),
            python.search_with_filters("海边", {"season": "夏天"}),
        )
        self.assert_same_hits(
            native.search_with_filters(None, {"season": "夏天"}),
            python.search_with_filters(None, {"season": "夏天"}),
        )

    def test_overwrite_and_clear_parity(self):
        native, python = self._build_pair()
        for ki in (native, python):
            ki.add_document("1", _doc("/p/beach.jpg", "雪山 湖泊"))
        self.assert_same_hits(native.search("雪山"), python.search("雪山"))
        self.assert_same_hits(native.search("海边 沙滩"), python.search("海边 沙滩"))
        for ki in (native, python):
            ki.clear()
        self.assertEqual(native.search("雪山"), [])
        self.assertEqual(python.search("雪山"), [])

    def test_native_faster_at_scale(self):
        import time

        rng = np.random.default_rng(0)
        vocabulary = [f"tok{i}" for i in range(2000)]

        # below ~2k docs the pure-Python path wins (ctypes call overhead
        # dominates); the native core's advantage is the large-corpus regime
        def build(ki):
            for i in range(4000):
                words = " ".join(rng.choice(vocabulary, size=30))
                ki.add_document(str(i), _doc(f"/p/{i}.jpg", words))

        native = KeywordIndex(native=True)
        python = KeywordIndex(native=False)
        rng = np.random.default_rng(0); build(native)
        rng = np.random.default_rng(0); build(python)
        query = " ".join(vocabulary[:5])

        # best-of-3 per side: robust to transient machine load (a single
        # noisy wall-clock pair flipped this under a concurrent benchmark)
        def best_time(index):
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                for _ in range(30):
                    index.search(query)
                best = min(best, time.perf_counter() - t)
            return best

        native_time = best_time(native)
        python_time = best_time(python)
        self.assert_same_hits(native.search(query), python.search(query))
        # informational; native should not be slower
        self.assertLessEqual(native_time, python_time * 1.5)


class NativeBm25LoadGuardTest(unittest.TestCase):
    """Round-4 review: the bulk-load path must apply the same
    dense-int32-row guard as add_doc — a corrupted sidecar row id (e.g.
    2^40) would otherwise set max_doc astronomically and the next
    query's scratch allocation (slots = max_doc + 1) would bad_alloc
    across the ctypes boundary and abort the process."""

    def test_corrupt_doc_len_row_is_skipped(self):
        from photo_search_engine_tpu.core.keyword_index import _NativeBM25

        native = _NativeBM25()
        tids = np.array([0, 1], np.int64)
        rows = np.array([0, 0], np.int64)
        tfs = np.array([1, 1], np.int32)
        # second doc-length entry carries a corrupt (huge) row id
        len_rows = np.array([0, np.int64(1) << 40], np.int64)
        lens = np.array([2, 2], np.int64)
        native.load_field(0, tids, rows, tfs, len_rows, lens)
        # scoring must neither crash nor allocate 2^40 scratch slots
        docs, scores, matched = native.score_field(0, [0, 1], 1)
        self.assertEqual(docs.tolist(), [0])
        self.assertTrue((docs <= np.iinfo(np.int32).max).all())


if __name__ == "__main__":
    unittest.main()
