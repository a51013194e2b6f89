"""Replay a fetch-forensics dump against a live store.

``VectorIndex._validated_fetch`` writes ``pse_fetch_forensics_*.npz``
(queries, k, masks, the bad fetched results, and the live count) when a
device-link fault window outlasts every retry.  This tool replays the
captured batch OUTSIDE the window and reports whether the bad result
reproduces:

* **does not reproduce** (the normal case) → transport fault; the dump's
  ``bad_idx`` documents what the link returned vs what the same inputs
  produce now.
* **reproduces** → a real kernel/routing bug; file the dump with the
  repro.

Usage:
  python -m photo_search_engine_tpu.tools.replay_forensics DUMP.npz \
      [--rows N] [--dim D] [--seed S]

Without a saved corpus the replay rebuilds the load-test corpus shape
(device-synthesized, same PRNG recipe as scripts/load_test.py) — pass
the generation parameters the original run used.  For serving dumps
against a persisted index, load the index instead with --index-path.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dump")
    parser.add_argument("--rows", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument("--index-path", default=None,
                        help="replay against a persisted VectorIndex "
                        "instead of a synthesized corpus")
    parser.add_argument("--metadata-path", default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force a backend (cpu = replay the routing "
                        "logic off-device; the env var alone is ignored "
                        "on hosts with an axon sitecustomize)")
    args = parser.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    payload = np.load(args.dump, allow_pickle=False)
    queries = payload["queries"]
    k = int(payload["k"])
    count = int(payload["count"])
    what = bytes(payload["what"]).decode()
    bad_idx = payload.get("bad_idx")
    print(f"dump: {what}, queries {queries.shape}, k={k}, count={count}")
    if bad_idx is not None:
        print(
            f"bad fetch: idx range [{bad_idx.min()}, {bad_idx.max()}] "
            f"(count {count})"
        )

    from photo_search_engine_tpu.core.vector_index import VectorIndex

    if args.index_path:
        vi = VectorIndex(
            dimension=None,
            index_path=args.index_path,
            metadata_path=args.metadata_path
            or args.index_path.replace(".index", "-meta.json"),
        )
        if not vi.load():
            print("index load failed", file=sys.stderr)
            return 2
    else:
        import jax
        import jax.numpy as jnp

        from photo_search_engine_tpu.ops.topk import l2_normalize

        print(f"synthesizing {args.rows}x{args.dim} corpus on device "
              "(load_test recipe)")
        vi = VectorIndex(
            dimension=args.dim,
            index_path="/tmp/replay.index",
            metadata_path="/tmp/replay-meta.json",
            metric="cosine",
            store_dtype="auto",
        )
        store = vi._store
        n_chunks = 8
        per = -(-args.rows // n_chunks)
        parts = [
            l2_normalize(
                jax.random.normal(
                    jax.random.PRNGKey(i), (per, args.dim), store.store_dtype
                )
            )
            for i in range(n_chunks)
        ]
        rows_dev = jnp.concatenate(parts)[: args.rows]
        store.load_device_rows(rows_dev)
        vi.metadata.extend(
            {"photo_path": f"/photos/{i}.jpg"} for i in range(args.rows)
        )

    mask = payload.get("mask")
    if "mask_table" in payload:
        dists, idx = vi.raw_grouped_search_batch(
            queries, k, payload["mask_table"], payload["mask_ids"]
        )
    else:
        dists, idx = vi.raw_search_batch(
            queries, k, mask=None if mask is None else np.asarray(mask)
        )
    idx = np.asarray(idx)
    in_range = bool((idx < count).all() and (idx >= -1).all())
    print(f"replay: idx range [{idx.min()}, {idx.max()}] — "
          f"{'IN RANGE (transport fault confirmed)' if in_range else 'REPRODUCES (real bug!)'}")
    if bad_idx is not None and in_range:
        overlap = np.mean(
            [
                len(set(idx[i].tolist()) & set(np.asarray(bad_idx)[i].tolist()))
                / max(idx.shape[1], 1)
                for i in range(idx.shape[0])
            ]
        )
        print(f"row overlap with the bad fetch: {overlap:.3f}")
    return 0 if in_range else 1


if __name__ == "__main__":
    raise SystemExit(main())
