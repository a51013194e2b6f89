"""Per-query filtered exact search via grouped masks.

The base kernel (ops/topk.py) supports one shared corpus mask.  Batched
serving, however, mixes queries with DIFFERENT filters (different
season / time-of-day / date predicates).  Shipping a dense per-query
mask would cost Q×N bytes per batch (128 MB at the north-star shape), but
real batches draw from a handful of distinct predicates — so the filter
state is factored as:

* ``mask_table`` — [M, N] int8, one row per distinct predicate
  (M ≤ 8 typical; row 0 conventionally all-ones for unfiltered queries);
* ``mask_ids`` — [Q] int32, each query's predicate row.

Inside the kernel each corpus block selects every query's mask row with a
one-hot [BQ, M] × [M, BN] matmul — MXU work, no gathers.  Everything else
(local top-k extraction, two-phase merge) matches the exact kernel, and
results are bit-exact vs the oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photo_search_engine_tpu.ops.topk import (
    _APPROX_RECALL_TARGET,
    _LANE,
    _PALLAS_MAX_K,
    _dot_precision,
    _extract_block_topk,
    _extract_block_topk_fast,
    _on_tpu,
    _round_up,
    bucket_queries,
    default_block_n,
)


_MASK_BUCKET_MIN = 2


def bucket_mask_table(mask_table):
    """Pad the predicate table's row count up to the next power of two
    (≥ 2) with all-zero rows that no ``mask_ids`` entry references.

    ``n_masks`` is a static kernel parameter, so every distinct predicate
    count otherwise compiles a fresh kernel — the same compile-stall
    class ``bucket_queries`` fixes for the query axis (ops/topk.py).
    Bucketing bounds the shape set to log2 variants.  Accepts numpy or
    jax tables; preserves the input kind."""
    m = int(mask_table.shape[0])
    target = max(_MASK_BUCKET_MIN, 1 << max(m - 1, 0).bit_length())
    if target == m:
        return mask_table
    if isinstance(mask_table, np.ndarray):
        pad = np.zeros((target - m,) + mask_table.shape[1:], mask_table.dtype)
        return np.concatenate([mask_table, pad])
    return jnp.pad(mask_table, ((0, target - m), (0, 0)))


def grouped_mask_oracle(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    mask_table: jnp.ndarray,
    mask_ids: jnp.ndarray,
    k: int,
    *,
    count: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp reference: per-query masked inner-product top-k."""
    queries = jnp.atleast_2d(queries)
    n = corpus.shape[0]
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype),
        corpus,
        (((1,), (1,)), ((), ())),
        precision=_dot_precision(corpus.dtype),
        preferred_element_type=jnp.float32,
    )
    per_query_mask = jnp.take(mask_table, mask_ids, axis=0) > 0  # [Q, N]
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < (n if count is None else count)
    scores = jnp.where(jnp.logical_and(per_query_mask, valid), scores, -jnp.inf)
    vals, idx = jax.lax.top_k(scores, k)
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k",))
def _grouped_approx_impl(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    mask_table: jnp.ndarray,
    mask_ids: jnp.ndarray,
    count: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = corpus.shape[0]
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype),
        corpus,
        (((1,), (1,)), ((), ())),
        precision=_dot_precision(corpus.dtype),
        preferred_element_type=jnp.float32,
    )
    per_query_mask = jnp.take(mask_table, mask_ids, axis=0) > 0
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    scores = jnp.where(jnp.logical_and(per_query_mask, valid), scores, -jnp.inf)
    vals, idx = jax.lax.approx_max_k(
        scores, k, recall_target=_APPROX_RECALL_TARGET
    )
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx


def grouped_approx_large_k(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    mask_table: jnp.ndarray,
    mask_ids: jnp.ndarray,
    k: int,
    *,
    count: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ApproxTopK grouped-mask scan — same contract as
    ``grouped_mask_oracle`` (off-TPU ``approx_max_k`` computes exactly,
    so results match the oracle bit-for-bit there).  The grouped mirror
    of ``topk.approx_search_large_k``: the serving over-fetch
    (candidate_k up to 500) exceeds the grouped kernel's unrolled
    extraction, and at million scale the full sort the lax fallback
    pays loses 3-7× to ApproxTopK (docs/DESIGN.md crossover table).
    Routing lives in the stores; this function only runs when asked."""
    queries = jnp.atleast_2d(queries)
    n = corpus.shape[0]
    k = min(k, n) if n else 0
    if n == 0 or k == 0:
        q = queries.shape[0]
        return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
    # Bucket the query axis (see topk.approx_search_large_k): organic
    # micro-batch sizes otherwise compile one executable per batch size.
    # Padded rows point at mask row 0 and are sliced off; per-row results
    # are independent, so real rows are unchanged.
    mask_ids = jnp.asarray(mask_ids, jnp.int32)
    qn = queries.shape[0]
    qp = bucket_queries(qn)
    if qp != qn:
        queries = jnp.pad(queries, ((0, qp - qn), (0, 0)))
        mask_ids = jnp.pad(mask_ids, (0, qp - qn))
    count_arr = jnp.asarray(n if count is None else count, jnp.int32)
    vals, idx = _grouped_approx_impl(
        corpus,
        queries,
        jnp.asarray(mask_table),
        mask_ids,
        count_arr,
        k,
    )
    return vals[:qn], idx[:qn]


def _grouped_kernel(
    count_ref,     # SMEM (1, 1)
    q_ref,         # VMEM (BQ, D)
    c_ref,         # VMEM (BN, D)
    ids_ref,       # VMEM (BQ, LANE) int32 — per-query mask id in lane 0
    table_ref,     # VMEM (M, BN) — mask rows for this corpus block
    outv_ref,
    outi_ref,
    *,
    k: int,
    kp: int,
    bq: int,
    bn: int,
    n_masks: int,
    fast: bool = False,
):
    ni = pl.program_id(1)
    q = q_ref[:]
    scores = jax.lax.dot_general(
        q,
        c_ref[:],
        (((1,), (1,)), ((), ())),
        precision=_dot_precision(q.dtype),
        preferred_element_type=jnp.float32,
    )
    col = ni * bn + jax.lax.broadcasted_iota(jnp.int32, (bq, bn), 1)
    valid = col < count_ref[0, 0]

    # one-hot select each query's mask row: [BQ, M] @ [M, BN] on the MXU
    mask_cols = jax.lax.broadcasted_iota(jnp.int32, (bq, n_masks), 1)
    wanted = (mask_cols == ids_ref[:, 0:1]).astype(jnp.float32)
    per_query = jax.lax.dot_general(
        wanted,
        table_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, BN]
    valid = jnp.logical_and(valid, per_query > 0)
    scores = jnp.where(valid, scores, -jnp.inf)
    if fast:
        new_v, new_i = _extract_block_topk_fast(scores, ni * bn, k, kp, bq, bn)
    else:
        new_v, new_i = _extract_block_topk(scores, col, k, kp, bq, bn)
    outv_ref[:] = new_v
    outi_ref[:] = new_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_n", "n_masks", "interpret", "fast"),
)
def _grouped_impl(
    corpus: jnp.ndarray,      # (NP, DP)
    queries: jnp.ndarray,     # (QP, DP)
    mask_table: jnp.ndarray,  # (M, NP) int8
    mask_ids: jnp.ndarray,    # (QP,) int32
    count: jnp.ndarray,       # (1, 1)
    k: int,
    block_q: int,
    block_n: int,
    n_masks: int,
    interpret: bool,
    fast: bool = False,
):
    np_, dp = corpus.shape
    qp = queries.shape[0]
    kp = _round_up(max(k, 1), _LANE)
    nb = np_ // block_n
    ids_wide = jnp.broadcast_to(mask_ids[:, None], (qp, _LANE)).astype(jnp.int32)
    kernel = functools.partial(
        _grouped_kernel, k=k, kp=kp, bq=block_q, bn=block_n, n_masks=n_masks,
        fast=fast,
    )
    part_vals, part_idx = pl.pallas_call(
        kernel,
        grid=(qp // block_q, nb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda qi, ni: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_q, dp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_n, dp), lambda qi, ni: (ni, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q, _LANE), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_masks, block_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_q, kp), lambda qi, ni: (qi, ni), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q, kp), lambda qi, ni: (qi, ni), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, nb * kp), jnp.float32),
            jax.ShapeDtypeStruct((qp, nb * kp), jnp.int32),
        ),
        interpret=interpret,
    )(count, queries, corpus, ids_wide, mask_table)
    vals = part_vals.reshape(qp, nb, kp)[:, :, :k].reshape(qp, nb * k)
    idx = part_idx.reshape(qp, nb, kp)[:, :, :k].reshape(qp, nb * k)
    merged_vals, positions = jax.lax.top_k(vals, k)
    merged_idx = jnp.take_along_axis(idx, positions, axis=1)
    if fast:
        safe = jnp.clip(merged_idx, 0, np_ - 1)
        rows = jnp.take(corpus, safe, axis=0).astype(jnp.float32)
        exact = jnp.einsum(
            "qkd,qd->qk", rows, queries.astype(jnp.float32),
            precision=_dot_precision(corpus.dtype),
        )
        exact = jnp.where(jnp.isneginf(merged_vals), -jnp.inf, exact)
        merged_vals, order = jax.lax.top_k(exact, k)
        merged_idx = jnp.take_along_axis(merged_idx, order, axis=1)
    return merged_vals, merged_idx


def grouped_mask_search(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    mask_table: jnp.ndarray,  # [M, N] bool/int
    mask_ids: jnp.ndarray,    # [Q] int
    k: int,
    *,
    count: Optional[int] = None,
    impl: str = "auto",
    block_q: Optional[int] = None,
    block_n: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched per-query filtered top-k (inner-product metric).

    impl="pallas_fast" uses packed-key selection (see topk.py) with exact
    final rescoring.  Returns FAISS-style (distances desc, indices; -1
    for empty slots)."""
    queries = jnp.atleast_2d(queries)
    n, d = corpus.shape
    k = min(k, n) if n else 0
    if n == 0 or k == 0:
        q = queries.shape[0]
        return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
    mask_table = bucket_mask_table(mask_table)
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "lax"
    if impl != "lax" and k > _PALLAS_MAX_K:
        impl = "lax"
    if impl == "lax":
        return grouped_mask_oracle(
            corpus, queries, mask_table, mask_ids, k, count=count
        )

    interpret = not _on_tpu()
    bn = block_n or default_block_n(corpus.dtype, d)
    bq = min(block_q or 128, bucket_queries(queries.shape[0]))
    dp = _round_up(d, _LANE)
    np_ = _round_up(n, bn)
    qp = _round_up(queries.shape[0], bq)
    qn = queries.shape[0]
    n_masks = int(mask_table.shape[0])

    corpus_p = jnp.pad(corpus, ((0, np_ - n), (0, dp - d)))
    queries_p = jnp.pad(queries.astype(corpus.dtype), ((0, qp - qn), (0, dp - d)))
    table_p = jnp.pad(mask_table.astype(jnp.int8), ((0, 0), (0, np_ - n)))
    ids_p = jnp.pad(mask_ids.astype(jnp.int32), (0, qp - qn))
    count_arr = jnp.full((1, 1), n if count is None else count, jnp.int32)

    vals, idx = _grouped_impl(
        corpus_p, queries_p, table_p, ids_p, count_arr,
        k, bq, bn, n_masks, interpret, fast=(impl == "pallas_fast"),
    )
    vals = vals[:qn, :k]
    idx = idx[:qn, :k]
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx
