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


class Int8FuzzTest(unittest.TestCase):
    """Randomized configs through the int8 scan + exact rescore.

    Exact equality is only guaranteed on separated data, so the property
    checked is two-sided: (a) returned DISTANCES are exactly the
    full-precision scores of the returned ids (the rescore contract), in
    descending order, respecting mask/count; (b) recall vs the oracle is
    high (the nomination property)."""

    def test_random_configs_rescore_contract(self):
        from photo_search_engine_tpu.ops.quantized import int8_search, quantize_rows

        rng = np.random.default_rng(11)
        for trial in range(10):
            n = int(rng.integers(50, 3000))
            dim = int(rng.choice([16, 64, 130]))
            q = int(rng.integers(1, 7))
            k = int(rng.integers(1, min(n, 16) + 1))
            metric = str(rng.choice(["ip", "l2"]))
            use_mask = bool(rng.random() < 0.4)
            use_count = bool(rng.random() < 0.4)

            corpus = rng.normal(size=(n, dim)).astype(np.float32)
            corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
            queries = rng.normal(size=(q, dim)).astype(np.float32)
            mask = (rng.random(n) > 0.3).astype(np.int32) if use_mask else None
            count = int(rng.integers(k, n + 1)) if use_count else None
            label = (f"trial={trial} n={n} d={dim} q={q} k={k} {metric} "
                     f"mask={use_mask} count={count}")

            q8, scales = quantize_rows(jnp.asarray(corpus))
            vals, idx = int8_search(
                q8, scales, jnp.asarray(corpus), jnp.asarray(queries), k,
                count=count, mask=None if mask is None else jnp.asarray(mask),
                metric=metric,
            )
            vals, idx = np.asarray(vals), np.asarray(idx)

            scores = queries @ corpus.T
            if metric == "l2":
                qn = (queries**2).sum(1, keepdims=True)
                cn = (corpus**2).sum(1)[None, :]
                dist = qn + cn - 2 * scores
            valid = np.arange(n) < (n if count is None else count)
            if mask is not None:
                valid = valid & (mask > 0)

            for r in range(q):
                live = idx[r] >= 0
                ids = idx[r][live]
                # (a) ids respect mask/count and values are the exact
                # full-precision scores, correctly ordered
                self.assertTrue(valid[ids].all(), label)
                if metric == "ip":
                    np.testing.assert_allclose(
                        vals[r][live], scores[r][ids], rtol=2e-4, atol=2e-4,
                        err_msg=label,
                    )
                    self.assertTrue(
                        (np.diff(vals[r][live]) <= 1e-5).all(), label
                    )
                else:
                    np.testing.assert_allclose(
                        vals[r][live], dist[r][ids], rtol=2e-4, atol=2e-4,
                        err_msg=label,
                    )
                    self.assertTrue(
                        (np.diff(vals[r][live]) >= -1e-5).all(), label
                    )
                # (b) nomination recall vs the oracle
                ref_scores = np.where(
                    valid, scores[r] if metric == "ip" else -dist[r], -np.inf
                )
                n_valid = int((ref_scores > -np.inf).sum())
                ref_ids = np.argsort(-ref_scores, kind="stable")[: min(k, n_valid)]
                if len(ref_ids):
                    recall = len(set(ids.tolist()) & set(ref_ids.tolist())) / len(ref_ids)
                    self.assertGreaterEqual(recall, 0.7, label)


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
        # random deletions (exercise the native swap-remove postings path
        # — the SoA docs/tfs arrays must stay paired)
        for i in rng.choice(120, size=15, replace=False):
            native.delete_document(str(i))
            python.delete_document(str(i))

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
