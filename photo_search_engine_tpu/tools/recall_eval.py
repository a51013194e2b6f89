"""Recall + latency evaluation over a migrated corpus.

Evaluates the BASELINE.md configs that need no external model services:

* image-to-image retrieval over the corpus's own embeddings
  (leave-one-out: query with each stored vector, exclude self) — the
  exact path's recall@k vs a NumPy brute-force oracle (FAISS-flat
  parity; expected 1.0) and the IVF path's recall@k;
* time-filtered masked search: season/time-of-day masks derived from
  time_info applied in the device scan vs a host-filtered oracle.

Usage:
  python -m photo_search_engine_tpu.tools.recall_eval --data-dir ./data_tpu [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np


def evaluate(data_dir: str, k: int = 10, nprobe: int = 8) -> Dict[str, Any]:
    from photo_search_engine_tpu.core.vector_index import VectorIndex

    vector_index = VectorIndex(
        dimension=None,
        index_path=os.path.join(data_dir, "photo_search.index"),
        metadata_path=os.path.join(data_dir, "metadata.json"),
    )
    if not vector_index.load():
        raise FileNotFoundError(f"no index at {data_dir}")
    corpus = vector_index._store.snapshot()
    metadata = vector_index.metadata
    n = corpus.shape[0]
    k_eval = min(k, n - 1)

    # oracle: brute-force cosine, excluding self
    scores = corpus @ corpus.T
    np.fill_diagonal(scores, -np.inf)
    oracle = np.argsort(-scores, axis=1, kind="stable")[:, :k_eval]

    # exact path (device kernel), k+1 then drop self
    vector_index.search_batch(corpus, k_eval + 1)  # warm (compile)
    started = time.perf_counter()
    batches = vector_index.search_batch(corpus, k_eval + 1)
    exact_elapsed = time.perf_counter() - started
    path_to_row = {m.get("photo_path"): i for i, m in enumerate(metadata)}
    exact_hits = 0
    for row, hits in enumerate(batches):
        got = [
            path_to_row[h["metadata"]["photo_path"]]
            for h in hits
            if path_to_row.get(h["metadata"]["photo_path"]) != row
        ][:k_eval]
        exact_hits += len(set(got) & set(oracle[row].tolist()))
    exact_recall = exact_hits / (n * k_eval)

    # IVF path
    ivf_recall = None
    if n >= 32:
        from photo_search_engine_tpu.models.ivf import IVFIndex

        nlist = max(2, min(64, n // 8))
        index = IVFIndex.build(corpus, nlist=nlist, seed=0)
        _, ivf_idx = index.search(corpus, k_eval + 1, nprobe=min(nprobe, nlist))
        ivf_hits = 0
        for row in range(n):
            got = [i for i in ivf_idx[row].tolist() if i != row and i >= 0][:k_eval]
            ivf_hits += len(set(got) & set(oracle[row].tolist()))
        ivf_recall = ivf_hits / (n * k_eval)

    # int8 scan + exact rescore path (real embeddings, not synthetic —
    # measures the quantized nomination on the corpus's own distribution)
    int8_recall = None
    if n >= 2:
        from photo_search_engine_tpu.core.embedding_store import EmbeddingStore

        q_store = EmbeddingStore.from_array(
            corpus, metric="cosine", quantized=True, already_normalized=True
        )
        _, i8_idx = q_store.search(corpus, k_eval + 1, impl="int8")
        i8_hits = 0
        for row in range(n):
            got = [i for i in i8_idx[row].tolist() if i != row and i >= 0][:k_eval]
            i8_hits += len(set(got) & set(oracle[row].tolist()))
        int8_recall = i8_hits / (n * k_eval)

    # masked (time-filtered) search vs host-filtered oracle
    mask_checks = 0
    mask_correct = 0
    seasons = sorted(
        {
            (m.get("time_info") or {}).get("season")
            for m in metadata
            if (m.get("time_info") or {}).get("season")
        }
    )
    for season in seasons:
        mask = np.array(
            [
                1 if (m.get("time_info") or {}).get("season") == season else 0
                for m in metadata
            ],
            np.int32,
        )
        if mask.sum() == 0:
            continue
        query_row = int(np.argmax(mask))
        hits = vector_index.search_masked(
            corpus[query_row].tolist(), min(k_eval, int(mask.sum())), mask.astype(bool)
        )
        allowed = {
            m.get("photo_path") for m, flag in zip(metadata, mask) if flag
        }
        mask_checks += 1
        if all(h["metadata"]["photo_path"] in allowed for h in hits):
            mask_correct += 1

    return {
        "corpus": {"count": n, "dimension": int(corpus.shape[1])},
        "exact_recall_at_k": round(exact_recall, 4),
        "exact_batch_seconds": round(exact_elapsed, 4),
        "ivf_recall_at_k": None if ivf_recall is None else round(ivf_recall, 4),
        "int8_recall_at_k": None if int8_recall is None else round(int8_recall, 4),
        "masked_search_checks": mask_checks,
        "masked_search_correct": mask_correct,
        "k": k_eval,
    }


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--nprobe", type=int, default=8)
    args = parser.parse_args(argv)
    print(json.dumps(evaluate(args.data_dir, args.k, args.nprobe), ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
