"""Block-boundary regression for the cache-blocked native BM25 walk.

The C++ scoring walk (native/src/bm25.cc walk_blocked) strides the doc
space in kBlockDocs = 32k-doc blocks with per-term cursors; the existing
ScaleTest (50k docs) crosses at most one boundary, so this suite pins
the multi-block behavior directly against a NumPy BM25 oracle and
against itself under mutation orders that unsort the postings:

* docs spread over six 32k blocks (rows up to ~180k, five boundary
  crossings) score identically to an oracle evaluating the exact
  expression shapes bm25.cc documents;
* an index built in shuffled row order (postings arrive unsorted —
  ensure_norm must restore the doc-sorted invariant) produces BIT-EXACT
  scores vs the ascending build (the channel's contract: results are
  bit-identical to the Python fallback including tie order);
* removals (swap-with-back unsorting) followed by re-scoring agree with
  a fresh build of the surviving docs;
* an ``allowed`` mask shorter than max_doc filters rows past its end.
"""

import math
import unittest

import numpy as np

from photo_search_engine_tpu.core.keyword_index import TEXT_FIELD_BOOSTS

try:
    from photo_search_engine_tpu.core.keyword_index import _NativeBM25

    _NATIVE = _NativeBM25 is not None
except ImportError:  # pragma: no cover
    _NATIVE = False

K1, B = 1.2, 0.75
BLOCK = 32 * 1024  # bm25.cc kBlockDocs — keep in sync
SPAN = 180_007  # max row — spans six 32k blocks (five boundary crossings)
STEP = 9


def _docs():
    """(row, tids) pairs: term 0 everywhere, term 1 on even docs, term 2
    rare, plus per-doc filler tokens so doc lengths (and norms) vary."""
    out = []
    for row in range(0, SPAN, STEP):
        tids = [0]
        if (row // STEP) % 2 == 0:
            tids.append(1)
        if row % 9000 == 0:
            tids.append(2)
        tids += [100 + (row % 7)] * (row % 4)  # filler varies dl 1..6
        out.append((row, tids))
    return out


def _build(order):
    idx = _NativeBM25()
    for row, tids in order:
        idx.add_doc(row, 0, np.asarray(tids, np.int64))
    return idx


def _oracle(docs, terms, allowed_len=None):
    """NumPy BM25 with the exact expression shapes bm25.cc evaluates."""
    n_docs = float(len(docs))
    dls = {row: len(tids) for row, tids in docs}
    avgdl = sum(dls.values()) / len(dls)
    tf = {}  # term -> {row: tf}
    for row, tids in docs:
        for t in tids:
            tf.setdefault(t, {}).setdefault(row, 0)
            tf[t][row] += 1
    scores = {}
    for t in terms:
        postings = tf.get(t, {})
        df = float(len(postings))
        if not postings:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for row, f in postings.items():
            if allowed_len is not None and row >= allowed_len:
                continue
            norm = K1 * (1.0 - B + B * dls[row] / avgdl)
            contrib = f * (K1 + 1.0) / (f + norm)
            scores[row] = scores.get(row, 0.0) + idf * contrib
    return scores


@unittest.skipUnless(_NATIVE, "native BM25 core unavailable")
class BlockedWalkTest(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        try:
            probe = _NativeBM25()
            del probe
        except RuntimeError:
            raise unittest.SkipTest("native BM25 core unavailable")
        cls.docs = _docs()
        cls.asc = _build(cls.docs)
        rng = np.random.default_rng(17)
        cls.shuffled_order = [cls.docs[i] for i in rng.permutation(len(cls.docs))]
        cls.shuf = _build(cls.shuffled_order)

    def _score(self, idx, terms, allowed=None):
        rows, scores, matched = idx.score_field(0, terms, 1, allowed=allowed)
        order = np.argsort(rows, kind="stable")
        return rows[order], scores[order]

    def test_matches_oracle_across_blocks(self):
        rows, scores = self._score(self.asc, [0, 1, 2])
        want = _oracle(self.docs, [0, 1, 2])
        self.assertEqual(len(rows), len(want))
        # hits land in all six 32k walk blocks
        blocks = set(int(r) // BLOCK for r in rows)
        self.assertEqual(blocks, {0, 1, 2, 3, 4, 5})
        for row, score in zip(rows.tolist(), scores.tolist()):
            self.assertAlmostEqual(score, want[row], places=10, msg=f"row {row}")

    def test_unsorted_build_is_bit_exact(self):
        # postings arrived in shuffled doc order; ensure_norm must restore
        # the doc-sorted invariant, making the walk (and its float
        # accumulation order) identical to the ascending build
        for terms in ([0], [0, 1], [0, 1, 2], [2]):
            ra, sa = self._score(self.asc, terms)
            rs, ss = self._score(self.shuf, terms)
            np.testing.assert_array_equal(ra, rs)
            self.assertEqual(sa.tobytes(), ss.tobytes(), f"terms={terms}")

    def test_removals_match_fresh_build(self):
        removed = {row for row, _ in self.docs if (row // STEP) % 11 == 3}
        survivors = [(row, tids) for row, tids in self.docs if row not in removed]
        mutated = _build(self.docs)
        for row in removed:
            mutated.remove_doc(row)
        fresh = _build(survivors)
        rm_rows, rm_scores = self._score(mutated, [0, 1, 2])
        fr_rows, fr_scores = self._score(fresh, [0, 1, 2])
        np.testing.assert_array_equal(rm_rows, fr_rows)
        self.assertEqual(rm_scores.tobytes(), fr_scores.tobytes())
        self.assertTrue(all(int(r) not in removed for r in rm_rows.tolist()))

    def test_allowed_mask_shorter_than_max_doc(self):
        # rows at/past the mask's end count as not-allowed (the caller
        # snapshotted its mask before those rows existed)
        allowed_len = 70_000  # cuts inside block 2
        rng = np.random.default_rng(5)
        allowed = (rng.random(allowed_len) < 0.5).astype(np.uint8)
        rows, scores = self._score(self.asc, [0, 1], allowed=allowed)
        self.assertTrue(rows.size)
        self.assertTrue(int(rows.max()) < allowed_len)
        self.assertTrue(all(allowed[int(r)] for r in rows.tolist()))
        want = {
            row: s
            for row, s in _oracle(self.docs, [0, 1], allowed_len=allowed_len).items()
            if allowed[row]
        }
        self.assertEqual(len(rows), len(want))
        for row, score in zip(rows.tolist(), scores.tolist()):
            self.assertAlmostEqual(score, want[row], places=10)

    def test_fused_score_query_unsorted_bit_exact(self):
        # the fused multi-field entry point takes the same blocked walk;
        # add a second field so the fused max-over-fields runs too
        boosts = np.zeros(len(TEXT_FIELD_BOOSTS), np.float64)
        boosts[0] = 1.4
        boosts[1] = 1.0
        for idx_obj in (self.asc, self.shuf):
            for row, tids in self.docs[::5]:
                idx_obj.add_doc(row, 1, np.asarray(tids[:2], np.int64))
        ra = self.asc.score_query([0, 1, 2], 1, boosts, -1, 0, total_rows=SPAN)
        rs = self.shuf.score_query([0, 1, 2], 1, boosts, -1, 0, total_rows=SPAN)
        oa = np.argsort(ra[0], kind="stable")
        os_ = np.argsort(rs[0], kind="stable")
        np.testing.assert_array_equal(ra[0][oa], rs[0][os_])
        self.assertEqual(ra[1][oa].tobytes(), rs[1][os_].tobytes())


if __name__ == "__main__":
    unittest.main()
