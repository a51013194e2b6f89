"""Property/fuzz tests: randomized configurations compared against
reference implementations (kernel vs NumPy, native BM25 vs Python)."""

import unittest

import numpy as np

import jax.numpy as jnp

from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.ops import exact_search


class KernelFuzzTest(unittest.TestCase):
    def test_random_configs_match_numpy(self):
        rng = np.random.default_rng(42)
        for trial in range(12):
            n = int(rng.integers(5, 400))
            dim = int(rng.choice([8, 32, 96, 130, 256]))
            q = int(rng.integers(1, 9))
            k = int(rng.integers(1, min(n, 20) + 1))
            metric = str(rng.choice(["ip", "l2"]))
            use_mask = bool(rng.random() < 0.5)
            use_count = bool(rng.random() < 0.4)
            duplicate = bool(rng.random() < 0.3)

            corpus = rng.normal(size=(n, dim)).astype(np.float32)
            if duplicate and n >= 4:
                corpus[n // 2 :] = corpus[: n - n // 2]  # force ties
            queries = rng.normal(size=(q, dim)).astype(np.float32)
            mask = (rng.random(n) > 0.4).astype(np.int32) if use_mask else None
            count = int(rng.integers(1, n + 1)) if use_count else None

            scores = queries @ corpus.T
            if metric == "l2":
                qn = (queries**2).sum(1, keepdims=True)
                cn = (corpus**2).sum(1)[None, :]
                scores = -(qn + cn - 2 * scores)
            valid = np.arange(n)[None, :] < (n if count is None else count)
            if mask is not None:
                valid = valid & (mask[None, :] > 0)
            ref_scores = np.where(valid, scores, -np.inf)
            ref_idx = np.argsort(-ref_scores, axis=1, kind="stable")[:, :k]
            ref_vals = np.take_along_axis(ref_scores, ref_idx, axis=1)
            ref_idx = np.where(np.isneginf(ref_vals), -1, ref_idx)

            label = (f"trial={trial} n={n} d={dim} q={q} k={k} {metric} "
                     f"mask={use_mask} count={count} dup={duplicate}")
            for impl in ("lax", "pallas"):
                vals, idx = exact_search(
                    jnp.asarray(corpus), jnp.asarray(queries), k,
                    count=count,
                    mask=None if mask is None else jnp.asarray(mask),
                    metric=metric, impl=impl, block_n=128, block_q=8,
                )
                np.testing.assert_array_equal(
                    np.asarray(idx), ref_idx, err_msg=f"{label} impl={impl}"
                )


class Bm25FuzzTest(unittest.TestCase):
    def test_random_corpora_native_matches_python(self):
        rng = np.random.default_rng(7)
        vocabulary = [f"w{i}" for i in range(120)] + ["海", "边", "山", "夏天"]
        native = KeywordIndex(native=True)
        python = KeywordIndex(native=False)
        if native._native is None:
            self.skipTest("native library unavailable")
        for i in range(120):
            text = " ".join(rng.choice(vocabulary, size=int(rng.integers(3, 25))))
            doc = {
                "photo_path": f"/p/{i}.jpg",
                "description": text,
                "retrieval_text": text,
                "file_name": f"{i}.jpg",
                "season": str(rng.choice(["夏天", "冬天"])),
            }
            native.add_document(str(i), doc)
            python.add_document(str(i), doc)
        # random overwrites
        for i in rng.choice(120, size=10, replace=False):
            text = " ".join(rng.choice(vocabulary, size=8))
            doc = {"photo_path": f"/p/{i}.jpg", "description": text,
                   "retrieval_text": text}
            native.add_document(str(i), doc)
            python.add_document(str(i), doc)

        for trial in range(15):
            query = " ".join(rng.choice(vocabulary, size=int(rng.integers(1, 6))))
            a = native.search(query, top_k=20)
            b = python.search(query, top_k=20)
            self.assertEqual(len(a), len(b), query)
            for ha, hb in zip(a, b):
                self.assertEqual(ha["photo_path"], hb["photo_path"], query)
                self.assertAlmostEqual(ha["score"], hb["score"], places=9, msg=query)
            filters = {"season": "夏天"}
            fa = native.search_with_filters(query, filters, top_k=20)
            fb = python.search_with_filters(query, filters, top_k=20)
            self.assertEqual(
                [h["photo_path"] for h in fa], [h["photo_path"] for h in fb], query
            )


if __name__ == "__main__":
    unittest.main()
