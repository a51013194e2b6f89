#!/usr/bin/env python
"""One-command COMPILED-mode kernel validation on the real TPU.

The pytest suite runs on a CPU mesh with Pallas in interpreter mode, which
does not exercise Mosaic lowering (block alignment, VMEM budgets, scalar
prefetch) — bugs have hidden there before.  This script compiles and
parity-checks every kernel family against its oracle on the attached chip.

Run:  python scripts/tpu_smoke.py          (~2-4 min, mostly compiles)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"backend: {backend} {jax.devices()}")
    if backend != "tpu":
        print("WARNING: not a TPU — this validates the compiled path only on TPU")

    from photo_search_engine_tpu.ops import (
        exact_search,
        exact_search_oracle,
        grouped_mask_oracle,
        grouped_mask_search,
    )
    from photo_search_engine_tpu.models.ivf import IVFIndex

    rng = np.random.default_rng(0)
    failures = []

    def check(label, ok):
        print(f"  {'PASS' if ok else 'FAIL'}  {label}")
        if not ok:
            failures.append(label)

    # ---- exact kernels (both variants, both metrics, masks, counts) ----
    print("== exact top-k ==")
    corpus = jnp.asarray(rng.normal(size=(3000, 256)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    mask = jnp.asarray((rng.random(3000) > 0.6).astype(np.int32))
    started = time.time()
    for metric in ("ip", "l2"):
        vo, io = exact_search_oracle(corpus, queries, 10, metric=metric)
        for impl in ("pallas", "pallas_fused", "pallas_fast"):
            vp, ip_ = exact_search(corpus, queries, 10, metric=metric, impl=impl)
            check(f"{impl}/{metric}", bool((np.asarray(ip_) == np.asarray(io)).all()))
    vo, io = exact_search_oracle(corpus, queries, 10, mask=mask, count=2500)
    vp, ip_ = exact_search(corpus, queries, 10, mask=mask, count=2500, impl="pallas")
    check("pallas/masked+count", bool((np.asarray(ip_) == np.asarray(io)).all()))

    # large-k (candidate_k-style) ApproxTopK path: the serving scan when
    # k > 64 on a big corpus.  Compiled-mode requirements: every index in
    # range (count-masked padding can NEVER surface), tail recall >= 0.98
    # vs the exact oracle at k=500.
    from photo_search_engine_tpu.ops.topk import approx_search_large_k

    big = jnp.asarray(rng.normal(size=(300_000, 256)).astype(np.float32))
    bq = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    vo, io = exact_search_oracle(big, bq, 500, count=299_000)
    va, ia = approx_search_large_k(big, bq, 500, count=299_000)
    ia_np = np.asarray(ia)
    in_range = bool((ia_np < 299_000).all() and (ia_np >= 0).all())
    rec = float(
        np.mean(
            [
                len(set(np.asarray(io)[i].tolist()) & set(ia_np[i].tolist())) / 500
                for i in range(8)
            ]
        )
    )
    check(f"approx large-k (in-range {in_range}, recall {rec:.3f})",
          in_range and rec >= 0.98)
    print(f"  ({time.time()-started:.0f}s)")

    # ---- int8 scan + exact rescore ----
    print("== int8 rescore ==")
    from photo_search_engine_tpu.ops import int8_search, quantize_rows

    # plant well-separated neighbors (int8 pool selection is quantized;
    # exact equality needs gaps > the int8 dot error — see tests)
    i8_corpus = np.asarray(corpus).copy()
    i8_corpus /= np.linalg.norm(i8_corpus, axis=1, keepdims=True)
    i8_queries = np.asarray(queries).copy()
    i8_queries /= np.linalg.norm(i8_queries, axis=1, keepdims=True)
    alphas = 0.95 - 0.03 * np.arange(10)
    free = rng.permutation(3000)
    for qi in range(i8_queries.shape[0]):
        q = i8_queries[qi]
        for j, slot in enumerate(free[qi * 10 : (qi + 1) * 10]):
            r = rng.normal(size=256)
            r -= (r @ q) * q
            r /= np.linalg.norm(r)
            i8_corpus[slot] = alphas[j] * q + np.sqrt(1 - alphas[j] ** 2) * r
    q8, sc = quantize_rows(jnp.asarray(i8_corpus))
    for metric in ("ip", "l2"):
        vo, io = exact_search_oracle(
            jnp.asarray(i8_corpus), jnp.asarray(i8_queries), 10, metric=metric
        )
        for feed in ("int8", "bf16"):
            vp, ip_ = int8_search(
                q8, sc, jnp.asarray(i8_corpus), jnp.asarray(i8_queries), 10,
                metric=metric, feed=feed,
            )
            check(
                f"int8/{metric}/feed={feed}",
                bool((np.asarray(ip_) == np.asarray(io)).all()),
            )
    vo, io = exact_search_oracle(
        jnp.asarray(i8_corpus), jnp.asarray(i8_queries), 10, mask=mask, count=2500
    )
    vp, ip_ = int8_search(
        q8, sc, jnp.asarray(i8_corpus), jnp.asarray(i8_queries), 10,
        mask=mask, count=2500,
    )
    # masked/count truth may include near-tied background rows; accept the
    # planted prefix matching plus >=90% overall agreement
    agree = float(np.mean(np.asarray(ip_) == np.asarray(io)))
    check(f"int8/masked+count (agreement {agree:.2f})", agree >= 0.9)

    # ---- grouped masks ----
    print("== grouped masks ==")
    table = np.zeros((3, 3000), np.int8)
    table[0, :] = 1
    table[1, ::2] = 1
    table[2, 100:400] = 1
    ids = jnp.asarray(np.arange(16) % 3, jnp.int32)
    vo, io = grouped_mask_oracle(corpus, queries, jnp.asarray(table), ids, 10)
    vp, ip_ = grouped_mask_search(
        corpus, queries, jnp.asarray(table), ids, 10, impl="pallas"
    )
    check("grouped_mask", bool((np.asarray(ip_) == np.asarray(io)).all()))

    # grouped ApproxTopK large-k route (filtered candidate_k-style scans):
    # compiled approx_max_k over per-query-masked scores; in-range +
    # tail-recall requirements as the plain approx case
    from photo_search_engine_tpu.ops.grouped_mask import grouped_approx_large_k

    gtab = np.zeros((2, 300_000), np.int8)
    gtab[0, :] = 1
    gtab[1, ::2] = 1
    gids = jnp.asarray(np.arange(8) % 2, jnp.int32)
    # reuses `big`/`bq` from the plain approx large-k case above
    vo, io = grouped_mask_oracle(
        big, bq, jnp.asarray(gtab), gids, 500, count=299_000
    )
    va, ia = grouped_approx_large_k(
        big, bq, jnp.asarray(gtab), gids, 500, count=299_000
    )
    ia_np = np.asarray(ia)
    in_range = bool((ia_np < 299_000).all() and (ia_np >= 0).all())
    # odd rows must never appear for the ::2 predicate queries
    odd_leak = bool((ia_np[1::2] % 2 == 1).any())
    rec = float(
        np.mean(
            [
                len(set(np.asarray(io)[i].tolist()) & set(ia_np[i].tolist())) / 500
                for i in range(8)
            ]
        )
    )
    check(
        f"grouped approx large-k (in-range {in_range}, no-leak {not odd_leak}, "
        f"recall {rec:.3f})",
        in_range and not odd_leak and rec >= 0.98,
    )

    from photo_search_engine_tpu.ops import grouped_int8_search

    gq8, gsc = quantize_rows(jnp.asarray(i8_corpus))
    vo, io = grouped_mask_oracle(
        jnp.asarray(i8_corpus), jnp.asarray(i8_queries), jnp.asarray(table), ids, 10
    )
    vp, ip_ = grouped_int8_search(
        gq8, gsc, jnp.asarray(i8_corpus), jnp.asarray(i8_queries),
        jnp.asarray(table), ids, 10,
    )
    agree = float(np.mean(np.asarray(ip_) == np.asarray(io)))
    # predicates carve the planted structure, so a few background near-tie
    # slots may flip inside the int8 nomination window
    check(f"grouped_int8 (agreement {agree:.2f})", agree >= 0.9)

    # ---- IVF (pallas vs lax path on the same index) ----
    print("== IVF ==")
    ivf_corpus = rng.normal(size=(20_000, 256)).astype(np.float32)
    ivf_corpus /= np.linalg.norm(ivf_corpus, axis=1, keepdims=True)
    index = IVFIndex.build(ivf_corpus, nlist=64, seed=0)
    ivf_queries = ivf_corpus[rng.choice(20_000, 8, replace=False)]
    v_lax, i_lax = index.search(ivf_queries, 10, nprobe=16, impl="lax")
    v_pl, i_pl = index.search(ivf_queries, 10, nprobe=16, impl="pallas")
    check(
        "ivf pallas==lax",
        bool((np.sort(i_lax, 1) == np.sort(i_pl, 1)).all()),
    )
    # l2 on UNNORMALIZED rows (regression: pallas path once merged raw ip)
    l2_corpus = ivf_corpus * rng.uniform(0.5, 3.0, size=(20_000, 1)).astype(np.float32)
    l2_index = IVFIndex.build(l2_corpus, nlist=64, metric="l2", seed=0)
    l2_queries = l2_corpus[rng.choice(20_000, 8, replace=False)]
    v_lax, i_lax = l2_index.search(l2_queries, 10, nprobe=16, impl="lax")
    v_pl, i_pl = l2_index.search(l2_queries, 10, nprobe=16, impl="pallas")
    check(
        "ivf l2 pallas==lax",
        bool((np.sort(i_lax, 1) == np.sort(i_pl, 1)).all()),
    )
    # int8 lists + exact rescore
    q_index = IVFIndex.build(ivf_corpus, nlist=64, seed=0, quantized=True)
    v_lax, i_lax = q_index.search(ivf_queries, 10, nprobe=64, impl="lax")
    v_q, i_q = q_index.search(ivf_queries, 10, nprobe=64, impl="pallas")
    overlap = float(np.mean([
        len(set(i_q[r].tolist()) & set(i_lax[r].tolist())) / 10
        for r in range(i_q.shape[0])
    ]))
    check(
        f"ivf int8 (overlap {overlap:.2f}, self-hit "
        f"{float(np.mean(i_q[:, 0] == i_lax[:, 0])):.2f})",
        overlap >= 0.9 and bool((i_q[:, 0] == i_lax[:, 0]).all()),
    )

    # ---- sharded (degenerate 1-chip mesh on TPU) ----
    print("== sharded (degenerate mesh) ==")
    from photo_search_engine_tpu.parallel import (
        make_mesh,
        sharded_exact_search,
        sharded_int8_search,
    )

    mesh = make_mesh(1)
    vals, idx = sharded_exact_search(
        corpus, queries, 10, mesh, counts=np.array([2500], np.int32)
    )
    vo, io = exact_search_oracle(corpus, queries, 10, count=2500)
    check("sharded degenerate", bool((np.asarray(idx) == np.asarray(io)).all()))

    # sharded ApproxTopK large-k route (the candidate_k-style serving
    # scan over a mesh): compiled approx_max_k INSIDE shard_map; same
    # in-range + tail-recall requirements as the unsharded case above
    vo, io = exact_search_oracle(big, bq, 500, count=299_000)
    va, ia = sharded_exact_search(
        big, bq, 500, mesh, counts=np.array([299_000], np.int32),
        impl="approx",
    )
    ia_np = np.asarray(ia)
    in_range = bool((ia_np < 299_000).all() and (ia_np >= 0).all())
    rec = float(
        np.mean(
            [
                len(set(np.asarray(io)[i].tolist()) & set(ia_np[i].tolist())) / 500
                for i in range(8)
            ]
        )
    )
    check(
        f"sharded approx large-k (in-range {in_range}, recall {rec:.3f})",
        in_range and rec >= 0.98,
    )

    i8q, i8sc = quantize_rows(jnp.asarray(i8_corpus))
    vo, io = exact_search_oracle(jnp.asarray(i8_corpus), jnp.asarray(i8_queries), 10)
    vals, idx = sharded_int8_search(
        i8q, i8sc, jnp.asarray(i8_corpus), jnp.asarray(i8_queries), 10, mesh
    )
    check("sharded int8 degenerate", bool((np.asarray(idx) == np.asarray(io)).all()))

    # sharded IVF on the degenerate mesh: compiled _ivf_pallas INSIDE
    # shard_map (the mesh-native probe kernel; parallel/sharded_ivf.py)
    from photo_search_engine_tpu.parallel.sharded import ShardedEmbeddingStore
    from photo_search_engine_tpu.parallel.sharded_ivf import ShardedIVFIndex

    sivf_rows = np.array(corpus[:2048], np.float32)
    sivf_rows /= np.linalg.norm(sivf_rows, axis=1, keepdims=True)
    store = ShardedEmbeddingStore(sivf_rows.shape[1], mesh, metric="cosine")
    sids = store.append(sivf_rows)
    sivf = ShardedIVFIndex.build(store, nlist=8, train_iters=3)
    q_unit = np.array(queries[:8], np.float32)
    q_unit /= np.linalg.norm(q_unit, axis=1, keepdims=True)
    _, got = sivf.search(q_unit, 10, nprobe=8)  # full probe == exact
    ref = np.argsort(-(q_unit @ sivf_rows.T), axis=1)[:, :10]
    ok = all(
        set(got[q].tolist()) == set(sids[ref[q]].tolist()) for q in range(8)
    )
    check("sharded ivf kernel (shard_map)", ok)

    # masked sharded IVF: slot-permuted filter bits ride inside the probe
    # kernel (round-3: cluster pruning survives filters on the mesh)
    keep = (rng.random(2048) < 0.5).astype(np.int32)
    shard_of = (sids // ShardedEmbeddingStore._ID_STRIDE).astype(np.int64)
    local_of = (sids % ShardedEmbeddingStore._ID_STRIDE).astype(np.int64)
    slot_bits = np.zeros(sivf.perms.shape, np.int32)
    for s in range(sivf.perms.shape[0]):
        sel = shard_of == s
        if not sel.any():
            continue
        local_bits = np.zeros(int(local_of[sel].max()) + 1, np.int32)
        local_bits[local_of[sel]] = keep[sel]
        live = sivf.perms[s] >= 0
        src = sivf.perms[s][live]
        inb = src < local_bits.shape[0]
        row_bits = np.zeros(int(live.sum()), np.int32)
        row_bits[inb] = local_bits[src[inb]]
        slot_bits[s, live] = row_bits
    _, mgot = sivf.search(
        q_unit, 10, nprobe=8, slot_mask=slot_bits.reshape(-1),
        mask_ratio=float(keep.mean()),
    )
    mscores = q_unit @ sivf_rows.T
    mscores[:, keep == 0] = -np.inf
    mref = np.argsort(-mscores, axis=1)[:, :10]
    ok = all(
        set(mgot[q].tolist()) == set(sids[mref[q]].tolist()) for q in range(8)
    )
    check("sharded ivf masked kernel (shard_map)", ok)

    # sharded IVF l2: merged in 2<q,c>-|c|² space, |q|² restored post-merge
    l2_rows = np.array(corpus[:2048], np.float32) * rng.uniform(
        0.5, 3.0, size=(2048, 1)
    ).astype(np.float32)
    l2_store = ShardedEmbeddingStore(l2_rows.shape[1], mesh, metric="l2")
    l2_sids = l2_store.append(l2_rows)
    l2_sivf = ShardedIVFIndex.build(l2_store, nlist=8, train_iters=3)
    l2_q = np.array(corpus[:8], np.float32)
    _, l2_got = l2_sivf.search(l2_q, 10, nprobe=8)
    l2_scores = (
        (l2_q**2).sum(1)[:, None]
        + (l2_rows**2).sum(1)[None, :]
        - 2.0 * (l2_q @ l2_rows.T)
    )
    l2_ref = np.argsort(l2_scores, axis=1)[:, :10]
    ok = all(
        set(l2_got[q].tolist()) == set(l2_sids[l2_ref[q]].tolist())
        for q in range(8)
    )
    check("sharded ivf l2 kernel (shard_map)", ok)

    # sharded grouped int8: per-query predicates, int8 nomination + exact
    # rescore per shard (parallel/sharded.py sharded_grouped_int8_search)
    from photo_search_engine_tpu.parallel.sharded import (
        sharded_grouped_int8_search,
        sharded_grouped_search,
    )

    gi_rows = np.array(corpus[:2048], np.float32)
    gi_rows /= np.linalg.norm(gi_rows, axis=1, keepdims=True)
    gq = np.array(queries[:8], np.float32)
    gq /= np.linalg.norm(gq, axis=1, keepdims=True)
    gtable = (rng.random((3, 2048)) < 0.5).astype(np.int8)
    gids_q = (np.arange(8) % 3).astype(np.int32)
    absmax = np.abs(gi_rows).max(axis=1, keepdims=True)
    gscale = (absmax / 127.0).astype(np.float32)
    gi8 = np.clip(
        np.round(gi_rows / np.maximum(gscale, 1e-30)), -127, 127
    ).astype(np.int8)
    _, gi_idx = sharded_grouped_int8_search(
        gi8, gscale[:, 0], gi_rows, gq, gtable, gids_q, 10, mesh
    )
    _, gref_idx = sharded_grouped_search(
        gi_rows, gq, gtable, gids_q, 10, mesh
    )
    gi_idx, gref_idx = np.asarray(gi_idx), np.asarray(gref_idx)
    agree = np.mean(
        [
            len(set(gi_idx[q].tolist()) & set(gref_idx[q].tolist())) / 10
            for q in range(8)
        ]
    )
    ok = agree >= 0.9 and all(
        gtable[gids_q[q], hit] for q in range(8) for hit in gi_idx[q] if hit >= 0
    )
    check(f"sharded grouped int8 (agreement {agree:.2f})", ok)

    print("\nall kernels verified" if not failures else f"\nFAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
