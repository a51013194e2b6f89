"""Fused corpus-scoring + top-k kernels (the FAISS-flat replacement).

Replaces ``faiss.IndexFlatIP`` / ``faiss.IndexFlatL2`` ``.search()``
(reference utils/vector_store.py:172-198) with TPU-native paths:

* ``exact_search_oracle`` — ``jnp.dot`` + ``jax.lax.top_k``.  The recall-gold
  reference implementation every kernel is tested against.
* ``exact_search`` (impl="pallas") — a Pallas kernel that tiles the corpus
  over HBM→VMEM blocks, scores each block on the MXU, and maintains a
  running per-query top-k in VMEM scratch.  Scores are never written to
  HBM: for a 1M×1536 corpus the kernel reads 3 GB of corpus and writes
  Q×k values.  A per-block threshold test (block max vs. current k-th
  best) skips the merge for blocks that cannot contribute, so steady-state
  cost is the MXU matmul + one VPU reduction per block.

Filter semantics (season / time-period / identity masks — the device-side
analogue of the reference's ES filter clauses, keyword_store.py:286-392)
enter as an optional ``mask`` operand folded into the scan.

Distance conventions follow FAISS flat indexes (vector_store.py:72-81):
  metric="cosine"/"ip" → returned ``distances`` are inner products, sorted
  descending (vectors must be L2-normalized for cosine; see
  ``l2_normalize``, parity with vector_store.py:83-90).
  metric="l2" → squared L2 distances, sorted ascending.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_PALLAS_MAX_K = 64
_INT_MAX = jnp.iinfo(jnp.int32).max


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-wise L2 normalization (cosine-metric ingest contract,
    reference vector_store.py:83-90)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dot_precision(dtype) -> jax.lax.Precision:
    """float32 operands score at full precision (oracle parity); bf16/int8
    operands use the fast MXU path."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype).itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )


_VMEM_CORPUS_BUDGET = 8 * 1024 * 1024  # double-buffered corpus block bytes


def default_block_n(dtype, dim: int = 1536) -> int:
    """Corpus rows per VMEM block, sized so the double-buffered block fits
    the ~16MB VMEM scope with headroom for queries + merge buffers.
    1024×1536 bf16 measured fastest at the north-star shape."""
    per_row = -(-dim // _LANE) * _LANE * jnp.dtype(dtype).itemsize
    rows = _VMEM_CORPUS_BUDGET // (2 * per_row)
    rows = max(128, min(1024, (rows // 128) * 128))
    return rows


def resolve_store_dtype(store_dtype) -> str:
    """Resolve the ``"auto"`` store-dtype sentinel to the platform's
    right corpus dtype: bfloat16 on TPU (halves the HBM bytes on the
    bandwidth-bound scans — measured 2.4× on the sharded IVF probe,
    docs/DESIGN.md §3), float32 elsewhere.  Mirrors
    ``VectorIndex._resolve_store_dtype`` so stores constructed directly
    (benches, tools) default like the serving stack does."""
    resolved = (str(store_dtype) if store_dtype else "float32").strip().lower()
    if resolved != "auto":
        return resolved
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


def bucket_queries(qn: int) -> int:
    """Next power of two ≥ max(8, qn) — the padded query count for a
    kernel call.  Rounding to the nearest 8 gave every distinct batch
    size its own compiled executable (16 shapes under a max_batch=128
    micro-batcher); at 1M rows each one is a multi-minute XLA/Mosaic
    compile on remote-attached runtimes, and a serving path that sees
    organic batch sizes stalls behind them.  Powers of two bound the
    shape set to {8, 16, 32, 64, 128, ...} at ≤2× padded query work —
    nearly free, since the corpus read dominates these scans."""
    bucket = 8
    while bucket < qn:
        bucket *= 2
    return bucket


# ---------------------------------------------------------------------------
# Oracle (jnp + lax.top_k)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _oracle_impl(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    count: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    k: int,
    metric: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = corpus.shape[0]
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype),
        corpus,
        (((1,), (1,)), ((), ())),
        precision=_dot_precision(corpus.dtype),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), axis=1, keepdims=True)
        cn = jnp.sum(jnp.square(corpus.astype(jnp.float32)), axis=1)[None, :]
        scores = -(qn + cn - 2.0 * scores)
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    if mask is not None:
        valid = jnp.logical_and(valid, mask[None, :] > 0)
    scores = jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(scores, k)
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx


def exact_search_oracle(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    count: Optional[int] = None,
    mask: Optional[jnp.ndarray] = None,
    metric: str = "cosine",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference implementation; see ``exact_search`` for the contract."""
    queries = jnp.atleast_2d(queries)
    n = corpus.shape[0]
    k = min(k, n) if n else 0
    if n == 0 or k == 0:
        q = queries.shape[0]
        return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
    count_arr = jnp.asarray(n if count is None else count, jnp.int32)
    vals, idx = _oracle_impl(corpus, queries, count_arr, mask, k, metric)
    if metric == "l2":
        vals = jnp.where(jnp.isneginf(vals), jnp.inf, -vals)
    return vals, idx


# Large-candidate path: the searcher over-fetches candidate_k up to 500
# (reference searcher.py:771-820), beyond the fused kernel's unrolled
# k<=64 extraction.  On TPU, XLA's ApproxTopK (jax.lax.approx_max_k) at
# recall_target 0.99 beats a full sort at 1M rows; the head of the
# candidate list is effectively exact and the tail (which only feeds
# fusion/threshold statistics) tolerates 1% misses.  Gated to large
# corpora so behavioral tests on album-scale data stay bit-exact, and
# overridable via TOPK_EXACT_LARGE_K=1.
_APPROX_MIN_ROWS = 262_144
_APPROX_RECALL_TARGET = 0.99


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _approx_large_k_impl(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    count: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    k: int,
    metric: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = corpus.shape[0]
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype),
        corpus,
        (((1,), (1,)), ((), ())),
        precision=_dot_precision(corpus.dtype),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), axis=1, keepdims=True)
        cn = jnp.sum(jnp.square(corpus.astype(jnp.float32)), axis=1)[None, :]
        scores = -(qn + cn - 2.0 * scores)
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < count
    if mask is not None:
        valid = jnp.logical_and(valid, mask[None, :] > 0)
    scores = jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.approx_max_k(
        scores, k, recall_target=_APPROX_RECALL_TARGET
    )
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx


def _use_approx_large_k(n: int) -> bool:
    import os

    return (
        _on_tpu()
        and n >= _APPROX_MIN_ROWS
        and os.environ.get("TOPK_EXACT_LARGE_K", "") not in {"1", "true"}
    )


def approx_search_large_k(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    count: Optional[int] = None,
    mask: Optional[jnp.ndarray] = None,
    metric: str = "cosine",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ApproxTopK large-k scan — same contract as ``exact_search_oracle``
    (on CPU, ``approx_max_k`` computes exactly, so results match the
    oracle bit-for-bit off-TPU)."""
    queries = jnp.atleast_2d(queries)
    n = corpus.shape[0]
    k = min(k, n) if n else 0
    if n == 0 or k == 0:
        q = queries.shape[0]
        return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
    # Bucket the query axis like every other serving kernel (pallas exact,
    # int8, grouped, IVF): the micro-batcher produces organic batch sizes
    # (1, 2, 3, ...) and each distinct shape is a fresh XLA compile — a
    # multi-second stall on remote-attached runtimes that showed up as the
    # p99 8-13s tail in the round-5 load tests while p90 sat at ~0.7-1.7s
    # (docs/CHIP_SESSION_r05.log).  Zero-padded rows are sliced off below;
    # row results are independent, so real rows are unchanged.
    qn = queries.shape[0]
    qp = bucket_queries(qn)
    if qp != qn:
        queries = jnp.pad(queries, ((0, qp - qn), (0, 0)))
    count_arr = jnp.asarray(n if count is None else count, jnp.int32)
    vals, idx = _approx_large_k_impl(corpus, queries, count_arr, mask, k, metric)
    vals, idx = vals[:qn], idx[:qn]
    if metric == "l2":
        vals = jnp.where(jnp.isneginf(vals), jnp.inf, -vals)
    return vals, idx


# ---------------------------------------------------------------------------
# Pallas kernels
#
# Two implementations, both bit-exact vs the oracle:
#   * two-phase (default, impl="pallas"): phase A emits each block's local
#     top-k to HBM with NO cross-block dependency, so DMA/MXU/VPU pipeline
#     perfectly across blocks; phase B is a tiny lax.top_k merge over
#     [Q, NB*k].  15% faster than the fused variant at 1M×1536 (5.3ms vs
#     6.2ms per 128-query batch ≈ 71% of v5e HBM peak).
#   * fused running-top-k (impl="pallas_fused"): single pass keeping the
#     global top-k in VMEM scratch with a per-block threshold skip; scores
#     and partials never touch HBM.  Kept for ablation and for memory-
#     constrained deployments (no [Q, NB*128] partial buffers).
# ---------------------------------------------------------------------------


def _extract_block_topk(scores, col, k, kp, bq, bn):
    """Block-local top-k extraction shared by every kernel variant.

    k rounds of max → first-occurrence select → eliminate (all 2-D VPU
    ops).  First-occurrence tie-breaking + ascending block order is what
    makes the two-phase merge bit-exact vs lax.top_k; any change here
    must keep tests/test_topk.py and the grouped/IVF variants in sync.
    Returns ([bq, kp] values, [bq, kp] indices) padded with -inf/INT_MAX.
    """
    colw = jax.lax.broadcasted_iota(jnp.int32, (bq, bn), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (bq, kp), 1)
    new_v = jnp.full((bq, kp), -jnp.inf, jnp.float32)
    new_i = jnp.full((bq, kp), _INT_MAX, jnp.int32)
    comb = scores
    for slot in range(k):
        m = jnp.max(comb, axis=1, keepdims=True)
        at_max = comb == m
        first = jnp.min(jnp.where(at_max, colw, bn), axis=1, keepdims=True)
        onehot = colw == first
        sel = jnp.sum(jnp.where(onehot, col, 0), axis=1, keepdims=True)
        new_v = jnp.where(colk == slot, m, new_v)
        new_i = jnp.where(colk == slot, sel, new_i)
        comb = jnp.where(onehot, -jnp.inf, comb)
    return new_v, new_i


_FAST_MAX_BN = 2048  # packed lane ids carry at most 11 bits


def _extract_block_topk_fast(scores, col_base, k, kp, bq, bn):
    """Packed-key extraction: ~2 VPU passes per round instead of ~7.

    The f32 score is mapped to a totally-ordered int32 key (sign-flip
    trick), its low lane-id bits replaced by ``lm - lane`` — so every key
    is UNIQUE, argmax collapses to max, and the winning lane falls out of
    the max value itself.  The lane field is 10 bits for bn ≤ 1024 and 11
    bits for bn ≤ 2048 (``_FAST_MAX_BN``); selection ordering is exact
    except inside a ±2⁻¹³ (resp. ±2⁻¹²) relative quantization window
    (ties break to the smaller lane, matching the exact path).  Values
    returned are the QUANTIZED scores — callers needing exact distances
    re-score the k winners (the two-phase fast wrapper and the int8
    rescore path both do).
    """
    lane_bits = max(10, (bn - 1).bit_length())
    if bn > _FAST_MAX_BN:
        raise ValueError(f"packed-key extraction requires bn <= {_FAST_MAX_BN}")
    lm = jnp.int32((1 << lane_bits) - 1)
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    keys = bits ^ jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(bits, 31), 1
    )  # flip all-but-sign for negatives → total order matches float order
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, bn), 1)
    keys = (keys & ~lm) | (lm - lane)
    colk = jax.lax.broadcasted_iota(jnp.int32, (bq, kp), 1)
    new_v = jnp.full((bq, kp), -jnp.inf, jnp.float32)
    new_i = jnp.full((bq, kp), _INT_MAX, jnp.int32)
    int_min = jnp.iinfo(jnp.int32).min
    for slot in range(k):
        m = jnp.max(keys, axis=1, keepdims=True)          # [bq, 1]
        keys = jnp.where(keys == m, int_min, keys)        # unique → 1 elim
        win_lane = lm - (m & lm)
        score_bits = m | lm
        # invert the sign-flip mapping (quantized upward to the window top)
        score_bits = score_bits ^ jax.lax.shift_right_logical(
            jax.lax.shift_right_arithmetic(score_bits, 31), 1
        )
        quantized = jax.lax.bitcast_convert_type(score_bits, jnp.float32)
        sel = col_base + win_lane
        new_v = jnp.where(colk == slot, quantized, new_v)
        new_i = jnp.where(colk == slot, sel, new_i)
    return new_v, new_i


def _block_topk_kernel(
    count_ref,  # SMEM (1, 1) int32 — number of live corpus rows
    q_ref,      # VMEM (BQ, D)
    c_ref,      # VMEM (BN, D) corpus block
    *rest,
    k: int,
    kp: int,
    bq: int,
    bn: int,
    metric: str,
    has_mask: bool,
    fast: bool = False,
):
    """Phase A: local top-k of one corpus block (independent per block)."""
    offset = 0
    cn_ref = rest[offset] if metric == "l2" else None
    offset += 1 if metric == "l2" else 0
    mask_ref = rest[offset] if has_mask else None
    offset += 1 if has_mask else 0
    outv_ref, outi_ref = rest[offset : offset + 2]

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
    if metric == "l2":
        qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        scores = -(qn + cn_ref[:] - 2.0 * scores)
    if has_mask:
        valid = jnp.logical_and(valid, mask_ref[:] > 0)
    scores = jnp.where(valid, scores, -jnp.inf)
    if fast:
        new_v, new_i = _extract_block_topk_fast(scores, ni * bn, k, kp, bq, bn)
    else:
        new_v, new_i = _extract_block_topk(scores, col, k, kp, bq, bn)
    outv_ref[:] = new_v
    outi_ref[:] = new_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_q", "block_n", "interpret", "has_mask", "fast"),
)
def _pallas_twophase_impl(
    corpus: jnp.ndarray,   # (NP, DP) — padded
    queries: jnp.ndarray,  # (QP, DP) — padded
    count: jnp.ndarray,    # (1, 1) int32
    cnorms: jnp.ndarray,   # (1, NP) float32 (l2 only)
    mask: jnp.ndarray,     # (1, NP) int32
    k: int,
    metric: str,
    block_q: int,
    block_n: int,
    interpret: bool,
    has_mask: bool,
    fast: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    np_, dp = corpus.shape
    qp = queries.shape[0]
    kp = _round_up(max(k, 1), _LANE)
    nb = np_ // block_n
    grid = (qp // block_q, nb)

    in_specs = [
        pl.BlockSpec((1, 1), lambda qi, ni: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_q, dp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, dp), lambda qi, ni: (ni, 0), memory_space=pltpu.VMEM),
    ]
    operands = [count, queries, corpus]
    if metric == "l2":
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM)
        )
        operands.append(cnorms)
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM)
        )
        operands.append(mask)

    kernel = functools.partial(
        _block_topk_kernel,
        k=k, kp=kp, bq=block_q, bn=block_n, metric=metric, has_mask=has_mask,
        fast=fast,
    )
    part_vals, part_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_q, kp), lambda qi, ni: (qi, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, kp), lambda qi, ni: (qi, ni), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, nb * kp), jnp.float32),
            jax.ShapeDtypeStruct((qp, nb * kp), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * dp,
            bytes_accessed=np_ * dp * corpus.dtype.itemsize + qp * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    # Phase B: merge the k live slots of every block.  Earlier blocks come
    # first and block-local extraction already orders ties by smaller index,
    # so lax.top_k's stable smallest-index tie rule is preserved globally.
    vals = part_vals.reshape(qp, nb, kp)[:, :, :k].reshape(qp, nb * k)
    idx = part_idx.reshape(qp, nb, kp)[:, :, :k].reshape(qp, nb * k)
    merged_vals, positions = jax.lax.top_k(vals, k)
    merged_idx = jnp.take_along_axis(idx, positions, axis=1)
    if fast:
        # selection used quantized keys; re-score the k winners exactly and
        # re-order (cheap: Q*k rows)
        safe = jnp.clip(merged_idx, 0, np_ - 1)
        rows = jnp.take(corpus, safe, axis=0).astype(jnp.float32)  # [QP,k,D]
        exact = jnp.einsum(
            "qkd,qd->qk", rows, queries.astype(jnp.float32),
            precision=_dot_precision(corpus.dtype),
        )
        if metric == "l2":
            qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), 1, keepdims=True)
            cn = jnp.sum(jnp.square(rows), axis=2)
            exact = -(qn + cn - 2.0 * exact)
        exact = jnp.where(jnp.isneginf(merged_vals), -jnp.inf, exact)
        merged_vals, order = jax.lax.top_k(exact, k)
        merged_idx = jnp.take_along_axis(merged_idx, order, axis=1)
    return merged_vals, merged_idx


def _topk_kernel(
    count_ref,  # SMEM (1, 1) int32 — number of live corpus rows
    q_ref,      # VMEM (BQ, D)
    c_ref,      # VMEM (BN, D) corpus block
    *rest,
    k: int,
    kp: int,
    bq: int,
    bn: int,
    metric: str,
    has_mask: bool,
):
    offset = 0
    cn_ref = rest[offset] if metric == "l2" else None
    offset += 1 if metric == "l2" else 0
    mask_ref = rest[offset] if has_mask else None
    offset += 1 if has_mask else 0
    outv_ref, outi_ref, rv_ref, ri_ref = rest[offset : offset + 4]

    ni = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(ni == 0)
    def _init():
        rv_ref[:] = jnp.full((bq, kp), -jnp.inf, jnp.float32)
        ri_ref[:] = jnp.full((bq, kp), _INT_MAX, jnp.int32)

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
    if metric == "l2":
        qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        scores = -(qn + cn_ref[:] - 2.0 * scores)
    if has_mask:
        valid = jnp.logical_and(valid, mask_ref[:] > 0)
    scores = jnp.where(valid, scores, -jnp.inf)

    # Merge only when this block can displace a current top-k entry.
    @pl.when(jnp.max(scores) >= jnp.min(rv_ref[:, k - 1 : k]))
    def _merge():
        width = kp + bn
        comb_v = jnp.concatenate([rv_ref[:], scores], axis=1)
        comb_i = jnp.concatenate([ri_ref[:], col], axis=1)
        colw = jax.lax.broadcasted_iota(jnp.int32, (bq, width), 1)
        colk = jax.lax.broadcasted_iota(jnp.int32, (bq, kp), 1)
        new_v = jnp.full((bq, kp), -jnp.inf, jnp.float32)
        new_i = jnp.full((bq, kp), _INT_MAX, jnp.int32)
        # k rounds of (max, first-occurrence select, eliminate).  Running
        # entries precede the block in `comb_*`, and earlier blocks hold
        # smaller corpus indices, so first-occurrence tie-breaking matches
        # lax.top_k's smallest-index-wins rule exactly.
        for j in range(k):
            m = jnp.max(comb_v, axis=1, keepdims=True)
            at_max = comb_v == m
            first = jnp.min(jnp.where(at_max, colw, width), axis=1, keepdims=True)
            onehot = colw == first
            sel_i = jnp.sum(jnp.where(onehot, comb_i, 0), axis=1, keepdims=True)
            new_v = jnp.where(colk == j, m, new_v)
            new_i = jnp.where(colk == j, sel_i, new_i)
            comb_v = jnp.where(onehot, -jnp.inf, comb_v)
        rv_ref[:] = new_v
        ri_ref[:] = new_i

    @pl.when(ni == nb - 1)
    def _emit():
        outv_ref[:] = rv_ref[:]
        outi_ref[:] = ri_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_q", "block_n", "interpret", "has_mask"),
)
def _pallas_impl(
    corpus: jnp.ndarray,   # (NP, DP) — padded
    queries: jnp.ndarray,  # (QP, DP) — padded
    count: jnp.ndarray,    # (1, 1) int32
    cnorms: jnp.ndarray,   # (1, NP) float32 (l2 only; zeros otherwise)
    mask: jnp.ndarray,     # (1, NP) int32 (all ones when has_mask=False)
    k: int,
    metric: str,
    block_q: int,
    block_n: int,
    interpret: bool,
    has_mask: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    np_, dp = corpus.shape
    qp = queries.shape[0]
    kp = _round_up(max(k, 1), _LANE)
    grid = (qp // block_q, np_ // block_n)

    in_specs = [
        pl.BlockSpec((1, 1), lambda qi, ni: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_q, dp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, dp), lambda qi, ni: (ni, 0), memory_space=pltpu.VMEM),
    ]
    operands = [count, queries, corpus]
    if metric == "l2":
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM)
        )
        operands.append(cnorms)
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda qi, ni: (0, ni), memory_space=pltpu.VMEM)
        )
        operands.append(mask)

    kernel = functools.partial(
        _topk_kernel,
        k=k,
        kp=kp,
        bq=block_q,
        bn=block_n,
        metric=metric,
        has_mask=has_mask,
    )
    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_q, kp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, kp), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, kp), jnp.float32),
            jax.ShapeDtypeStruct((qp, kp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, kp), jnp.float32),
            pltpu.VMEM((block_q, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * dp,
            bytes_accessed=np_ * dp * corpus.dtype.itemsize + qp * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out_vals, out_idx


def exact_search(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    count: Optional[int] = None,
    mask: Optional[jnp.ndarray] = None,
    metric: str = "cosine",
    impl: str = "auto",
    block_q: Optional[int] = None,
    block_n: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN over ``corpus`` for a batch of ``queries``.

    Args:
      corpus: ``[N, D]`` embedding matrix (rows beyond ``count`` ignored).
      queries: ``[Q, D]`` or ``[D]``.
      k: results per query (clamped to N).
      count: live-row count (for capacity-padded stores); default N.
      mask: optional ``[N]`` filter; rows with ``mask <= 0`` are excluded.
      metric: "cosine" | "ip" (inner product, descending) or "l2"
        (squared distance, ascending).
      impl: "auto" (pallas on TPU, oracle elsewhere) | "pallas"
        (two-phase, default device path) | "pallas_fused" (running
        top-k in VMEM, no HBM partials) | "lax".

    Returns:
      ``(distances [Q, k], indices [Q, k])`` — FAISS-flat conventions;
      missing slots (k > valid rows) hold index ``-1``.
    """
    queries = jnp.atleast_2d(queries)
    n, d = corpus.shape
    k = min(k, n) if n else 0
    if n == 0 or k == 0:
        q = queries.shape[0]
        return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)

    if impl == "auto":
        impl = "pallas" if _on_tpu() else "lax"
    if impl != "lax" and k > _PALLAS_MAX_K:
        # the in-kernel extraction loop is unrolled k times; large candidate
        # sets (searcher candidate_k up to ~1000) would explode compile time
        # and VPU work, so they take the XLA path (scores materialize, which
        # is fine at large k / small Q).  exact_search stays bit-exact vs
        # the oracle by contract; the serving store routes large-k scans to
        # ApproxTopK separately (approx_search_large_k, EmbeddingStore).
        impl = "lax"
    if impl == "lax":
        return exact_search_oracle(
            corpus, queries, k, count=count, mask=mask, metric=metric
        )

    interpret = not _on_tpu()
    bn = block_n or default_block_n(corpus.dtype, d)
    bq = block_q or 128
    qn = queries.shape[0]
    bq = min(bq, bucket_queries(qn))

    dp = _round_up(d, _LANE)
    np_ = _round_up(n, bn)
    qp = _round_up(qn, bq)
    corpus_p = jnp.pad(corpus, ((0, np_ - n), (0, dp - d)))
    queries_p = jnp.pad(queries.astype(corpus.dtype), ((0, qp - qn), (0, dp - d)))
    count_arr = jnp.full((1, 1), n if count is None else count, jnp.int32)
    if metric == "l2":
        cnorms = jnp.sum(
            jnp.square(corpus_p.astype(jnp.float32)), axis=1
        )[None, :]
    else:
        cnorms = jnp.zeros((1, np_), jnp.float32)
    has_mask = mask is not None
    if has_mask:
        mask_p = jnp.pad(mask.astype(jnp.int32), (0, np_ - n))[None, :]
    else:
        mask_p = jnp.ones((1, np_), jnp.int32)

    if impl == "pallas_fast" and bn > _FAST_MAX_BN:
        bn = _FAST_MAX_BN  # packed lane ids carry at most 11 bits
    if impl == "pallas_fused":
        run = functools.partial(_pallas_impl)
    elif impl == "pallas_fast":
        run = functools.partial(_pallas_twophase_impl, fast=True)
    else:
        run = functools.partial(_pallas_twophase_impl)
    vals, idx = run(
        corpus_p,
        queries_p,
        count_arr,
        cnorms,
        mask_p,
        k,
        "l2" if metric == "l2" else "ip",
        bq,
        bn,
        interpret,
        has_mask,
    )
    vals = vals[:qn, :k]
    idx = idx[:qn, :k]
    empty = jnp.isneginf(vals)
    idx = jnp.where(empty, -1, idx)
    if metric == "l2":
        vals = jnp.where(empty, jnp.inf, -vals)
    return vals, idx
