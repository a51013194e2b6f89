"""Randomized parity fuzz for sharded IVF vs the sharded exact oracle.

Random (rows, dim, nlist, k, query count) shapes on the 8-device CPU
mesh; full probe must always match sharded exact exactly, including
after incremental appends.
"""

from __future__ import annotations

import unittest

import numpy as np

from photo_search_engine_tpu.parallel.sharded import (
    ShardedEmbeddingStore,
    make_mesh,
)
from photo_search_engine_tpu.parallel.sharded_ivf import ShardedIVFIndex


class ShardedIVFFuzzTest(unittest.TestCase):
    def test_random_shapes_full_probe_parity(self):
        mesh = make_mesh(8)
        rng = np.random.default_rng(42)
        for trial in range(6):
            n = int(rng.integers(64, 900))
            dim = int(rng.choice([16, 48, 96]))
            nlist = int(rng.integers(2, max(3, n // 12)))
            k = int(rng.integers(1, 8))
            nq = int(rng.integers(1, 12))
            rows = rng.normal(size=(n, dim)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            store = ShardedEmbeddingStore(dim, mesh, metric="cosine")
            store.append(rows)
            index = ShardedIVFIndex.build(
                store, nlist, train_iters=2, seed=trial
            )
            # optionally grow the store through the incremental path
            if trial % 2:
                extra = rng.normal(size=(int(rng.integers(1, 40)), dim))
                extra = (
                    extra / np.linalg.norm(extra, axis=1, keepdims=True)
                ).astype(np.float32)
                ids = store.append(extra)
                if not index.append(extra, ids):
                    index = ShardedIVFIndex.build(
                        store, nlist, train_iters=2, seed=trial
                    )
            queries = rng.normal(size=(nq, dim)).astype(np.float32)
            queries /= np.linalg.norm(queries, axis=1, keepdims=True)
            _, eids = store.search(queries, k)
            _, gids = index.search(queries, k, nprobe=index.nlist)
            for row in range(nq):
                self.assertEqual(
                    set(gids[row].tolist()),
                    set(np.asarray(eids)[row].tolist()),
                    msg=f"trial {trial}: n={n} dim={dim} nlist={nlist} "
                    f"k={k} q={row}",
                )


if __name__ == "__main__":
    unittest.main()
