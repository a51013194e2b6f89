"""IVF coarse-quantized index for million-scale corpora.

The reference's only approximate index is HNSW (utils/vector_store.py:72-81),
a pointer-chasing graph with no efficient TPU analogue.  The TPU-native
approximate path (BASELINE.md north star, SURVEY.md §7.7) is IVF:

* ``train_kmeans`` — Lloyd iterations on device (assignment matmul on the
  MXU, one-hot reduction for centroid sums).
* Balanced cluster-major layout: every cluster gets a fixed row capacity
  ``L`` (slack × mean size); overflow rows spill to their next-nearest
  cluster with space, so HBM overhead is bounded and the kernel's block
  shape is static.
* ``ivf_search`` — stage 1 scores queries against centroids and picks
  ``nprobe`` lists per query; stage 2 scans ONLY the union of probed
  clusters via a scalar-prefetch Pallas kernel (the grid's block index
  map reads the selected-cluster ids, so unprobed clusters are never
  DMA'd), with per-query probe masks and the same running-top-k merge as
  the exact kernel.  Stored vectors are full precision by default, so
  recall loss comes only from cluster pruning (exact search stays the
  recall oracle); ``quantized=True`` adds an int8 list shadow (the
  FAISS IVF-SQ8 analogue) that nominates candidates for an exact rescore
  — a memory option (¼ of f32 list HBM), see docs/DESIGN.md §4.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photo_search_engine_tpu.ops import quantized as quant_ops
from photo_search_engine_tpu.ops.topk import (
    _extract_block_topk,
    bucket_queries,
    resolve_store_dtype,
)

_LANE = 128
_INT_MAX = jnp.iinfo(jnp.int32).max


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


# ---------------------------------------------------------------------------
# k-means training (device)
# ---------------------------------------------------------------------------

# Cap on the k-means training subsample.  Per-list sampling alone is not
# enough: at nlist=4096 × 256/list it reaches the full 1M corpus, and one
# Lloyd iteration over that many rows is minutes of device time for no
# recall benefit (64+ samples/list is plenty — FAISS warns below ~39).
_TRAIN_SAMPLE_CAP = 262_144


@functools.partial(jax.jit, static_argnames=("nlist", "chunk"))
def _lloyd_step(
    data: jnp.ndarray, centroids: jnp.ndarray, nlist: int, chunk: int = 65_536
):
    """One Lloyd iteration; the assignment runs in row chunks.

    The naive form materializes ``(S, nlist)`` score and one-hot f32
    matrices — 16 GB EACH at S=1M, nlist=4096 — and OOMs the chip.
    Chunking bounds live temporaries at ``(chunk, nlist)`` while the
    per-cluster sums/counts accumulate across chunks in a ``lax.scan``.
    """
    x = data.astype(jnp.float32)
    cents = centroids.astype(jnp.float32)
    n, d = x.shape
    cn = jnp.sum(jnp.square(cents), axis=1)[None, :]

    def block(xc, lv):
        scores = jax.lax.dot_general(
            xc, cents, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        assign = jnp.argmax(2.0 * scores - cn, axis=1)
        onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32) * lv
        sums = jax.lax.dot_general(
            onehot, xc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return sums, jnp.sum(onehot, axis=0)

    if n <= chunk:  # album-scale fast path: one block, no scan
        sums, counts = block(x, jnp.ones((n, 1), jnp.float32))
    else:
        nb = -(-n // chunk)
        xp = jnp.pad(x, ((0, nb * chunk - n), (0, 0)))
        live = (
            (jnp.arange(nb * chunk) < n).astype(jnp.float32).reshape(nb, chunk, 1)
        )
        xs = xp.reshape(nb, chunk, d)

        def body(carry, inp):
            s, c = carry
            bs, bc = block(*inp)
            return (s + bs, c + bc), jnp.float32(0)

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
            (xs, live),
        )
    new_cents = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cents)
    return new_cents, counts


def train_kmeans(
    data: np.ndarray,
    nlist: int,
    iters: int = 10,
    seed: int = 0,
    sample_per_list: int = 256,
) -> np.ndarray:
    """Train ``nlist`` centroids with Lloyd iterations on device.

    Training subsamples to ``nlist * sample_per_list`` rows, capped at
    ``_TRAIN_SAMPLE_CAP`` (FAISS-style practice) so training cost is
    independent of corpus size and bounded at large ``nlist``."""
    data = np.asarray(data, np.float32)
    n = data.shape[0]
    nlist = min(nlist, n)
    rng = np.random.default_rng(seed)
    sample_size = min(n, max(nlist, min(nlist * sample_per_list, _TRAIN_SAMPLE_CAP)))
    sample = data[rng.choice(n, size=sample_size, replace=False)]
    centroids = jnp.asarray(sample[rng.choice(sample_size, size=nlist, replace=False)])
    sample_dev = jnp.asarray(sample)
    for _ in range(iters):
        centroids, _ = _lloyd_step(sample_dev, centroids, nlist)
    return np.asarray(centroids)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_chunk(chunk_data: jnp.ndarray, centroids: jnp.ndarray, chunk: int):
    del chunk
    x = chunk_data.astype(jnp.float32)
    cents = centroids.astype(jnp.float32)
    scores = jax.lax.dot_general(
        x, cents, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    cn = jnp.sum(jnp.square(cents), axis=1)[None, :]
    adjusted = 2.0 * scores - cn
    # top-3 nearest for spill candidates
    vals, idx = jax.lax.top_k(adjusted, min(3, cents.shape[0]))
    return idx


def assign_clusters(data: np.ndarray, centroids: np.ndarray, chunk: int = 131072) -> np.ndarray:
    """Top-3 nearest centroids per row (device, chunked) → [N, 3] int32."""
    data = np.asarray(data, np.float32)
    cents = jnp.asarray(centroids, jnp.float32)
    n = data.shape[0]
    outs = []
    for start in range(0, n, chunk):
        part = jnp.asarray(data[start : start + chunk])
        outs.append(np.asarray(_assign_chunk(part, cents, chunk)))
    ranked = np.concatenate(outs) if outs else np.zeros((0, 1), np.int32)
    if ranked.shape[1] < 3:  # tiny nlist: repeat the only choices
        ranked = np.concatenate([ranked] * 3, axis=1)[:, :3]
    return ranked


def balanced_layout(
    ranked: np.ndarray, nlist: int, slack: float = 1.5
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Place each row into its nearest cluster with remaining capacity
    (capacity = slack × mean size); truly overflowing rows round-robin
    into any cluster with space.  Returns (cluster_of_row, perm rows in
    cluster-major order with -1 padding, capacity L).

    Uses the native C++ placement core when available (native/src/
    ivf_layout.cc — ~100× faster than this Python loop at 1M rows)."""
    n = ranked.shape[0]
    capacity = max(1, int(np.ceil(slack * n / nlist)))
    capacity = _round_up(capacity, _LANE)  # lane alignment for kernel blocks

    native = _native_layout(ranked, n, nlist, capacity)
    if native is not None:
        return native

    fill = np.zeros(nlist, np.int64)
    cluster_of_row = np.full(n, -1, np.int64)
    spill = []
    for row in range(n):
        placed = False
        for choice in ranked[row]:
            if fill[choice] < capacity:
                cluster_of_row[row] = choice
                fill[choice] += 1
                placed = True
                break
        if not placed:
            spill.append(row)
    for row in spill:
        target = int(np.argmin(fill))
        cluster_of_row[row] = target
        fill[target] += 1
    capacity = max(capacity, int(fill.max()))
    capacity = _round_up(capacity, _LANE)
    perm = np.full(nlist * capacity, -1, np.int64)
    cursor = np.zeros(nlist, np.int64)
    for row in range(n):
        cluster = cluster_of_row[row]
        perm[cluster * capacity + cursor[cluster]] = row
        cursor[cluster] += 1
    return cluster_of_row, perm, capacity


def _native_layout(
    ranked: np.ndarray, n: int, nlist: int, capacity: int
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    try:
        from photo_search_engine_tpu.native import get_library
    except Exception:
        return None
    lib = get_library()
    if lib is None or n == 0:
        return None
    import ctypes

    ranked32 = np.ascontiguousarray(ranked[:, :3], np.int32)
    cluster_of_row = np.empty(n, np.int64)
    perm = np.empty(nlist * capacity, np.int64)
    placed = lib.pse_balanced_layout(
        ranked32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        nlist,
        capacity,
        cluster_of_row.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if placed != n:  # pathological input; let Python handle it
        return None
    return cluster_of_row, perm, capacity


# ---------------------------------------------------------------------------
# Stage-2 Pallas kernel: scan only selected clusters
# ---------------------------------------------------------------------------

def _ivf_kernel(
    sel_ref,        # scalar-prefetch [S] int32 — selected cluster ids
    count_ref,      # SMEM (1,1) — number of genuinely selected clusters
    q_ref,          # VMEM (BQ, D)
    c_ref,          # VMEM (L, D) — rows of cluster sel[j]
    probe_ref,      # VMEM (BQ, nlist) int32 — per-query probe flags
    valid_ref,      # VMEM (1, L) int32 — live rows of cluster sel[j]
    *rest,
    k: int,
    kp: int,
    bq: int,
    lrows: int,
    precision,
    metric: str = "ip",
    int8: bool = False,
    int8_feed: str = "int8",
):
    offset = 0
    if int8:
        qs_ref = rest[offset]
        cs_ref = rest[offset + 1]
        offset += 2
    cn_ref = rest[offset] if metric == "l2" else None
    offset += 1 if metric == "l2" else 0
    outv_ref, outi_ref, rv_ref, ri_ref = rest[offset : offset + 4]

    j = pl.program_id(1)
    n_sel = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        rv_ref[:] = jnp.full((bq, kp), -jnp.inf, jnp.float32)
        ri_ref[:] = jnp.full((bq, kp), _INT_MAX, jnp.int32)

    cluster_id = sel_ref[j]
    is_live_block = j < count_ref[0, 0]

    if int8:
        # feed pinned at IVFIndex construction (mirrors EmbeddingStore's
        # self.int8_feed) and threaded here as a jit-static arg — reading
        # the INT8_FEED env inside the kernel body would bake whichever
        # value was set at first compile into the jit cache and silently
        # ignore later toggles.  IVF list blocks are small, so the bf16
        # dequant copy always fits the probe kernel's VMEM plan.
        acc = quant_ops._quant_block_dot(q_ref[:], c_ref[:], int8_feed)
        scores = acc * qs_ref[:] * cs_ref[:]
    else:
        scores = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
    if metric == "l2":
        # the per-query norm is rank-invariant, so merge by 2<q,c> - |c|²;
        # the wrapper subtracts |q|² afterwards to restore -(squared l2)
        scores = 2.0 * scores - cn_ref[:]
    col = cluster_id * lrows + jax.lax.broadcasted_iota(jnp.int32, (bq, lrows), 1)
    # per-query probe flag for this cluster: one-hot select along nlist
    nlist = probe_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, nlist), 1)
    row_probe = jnp.sum(
        jnp.where(lane == cluster_id, probe_ref[:], 0), axis=1, keepdims=True
    )
    keep = jnp.logical_and(valid_ref[:] > 0, row_probe > 0)
    keep = jnp.logical_and(keep, is_live_block)
    scores = jnp.where(keep, scores, -jnp.inf)

    @pl.when(jnp.max(scores) >= jnp.min(rv_ref[:, k - 1 : k]))
    def _merge():
        comb_v = jnp.concatenate([rv_ref[:], scores], axis=1)
        comb_i = jnp.concatenate([ri_ref[:], col], axis=1)
        new_v, new_i = _extract_block_topk(
            comb_v, comb_i, k, kp, bq, kp + lrows
        )
        rv_ref[:] = new_v
        ri_ref[:] = new_i

    @pl.when(j == n_sel - 1)
    def _emit():
        outv_ref[:] = rv_ref[:]
        outi_ref[:] = ri_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "bq", "lrows", "s_max", "interpret", "metric", "int8", "int8_feed",
    ),
)
def _ivf_pallas(
    corpus_ivf: jnp.ndarray,   # [nlist * L, DP] (int8 when int8=True)
    queries: jnp.ndarray,      # [QP, DP] (int8 when int8=True)
    selected: jnp.ndarray,     # [S] int32
    sel_count: jnp.ndarray,    # (1,1) int32
    probe_matrix: jnp.ndarray, # [QP, nlist] int32
    row_valid: jnp.ndarray,    # [1, nlist * L] int32
    cnorms: jnp.ndarray,       # [1, nlist * L] f32 (l2 only)
    qscales: jnp.ndarray,      # [QP, 1] f32 (int8 only)
    cscales: jnp.ndarray,      # [1, nlist * L] f32 (int8 only)
    k: int,
    bq: int,
    lrows: int,
    s_max: int,
    interpret: bool,
    metric: str = "ip",
    int8: bool = False,
    int8_feed: str = "int8",
):
    qp, dp = queries.shape
    kp = _round_up(max(k, 1), _LANE)
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(corpus_ivf.dtype).itemsize >= 4
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _ivf_kernel, k=k, kp=kp, bq=bq, lrows=lrows, precision=precision,
        metric=metric, int8=int8, int8_feed=int8_feed,
    )
    in_specs = [
        pl.BlockSpec((1, 1), lambda qi, j, sel: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((bq, dp), lambda qi, j, sel: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (lrows, dp), lambda qi, j, sel: (sel[j], 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (bq, probe_matrix.shape[1]),
            lambda qi, j, sel: (qi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, lrows), lambda qi, j, sel: (0, sel[j]), memory_space=pltpu.VMEM
        ),
    ]
    operands = [queries, corpus_ivf, probe_matrix, row_valid]
    if int8:
        in_specs.append(
            pl.BlockSpec((bq, 1), lambda qi, j, sel: (qi, 0), memory_space=pltpu.VMEM)
        )
        operands.append(qscales)
        in_specs.append(
            pl.BlockSpec(
                (1, lrows), lambda qi, j, sel: (0, sel[j]), memory_space=pltpu.VMEM
            )
        )
        operands.append(cscales)
    if metric == "l2":
        in_specs.append(
            pl.BlockSpec(
                (1, lrows), lambda qi, j, sel: (0, sel[j]), memory_space=pltpu.VMEM
            )
        )
        operands.append(cnorms)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp // bq, s_max),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bq, kp), lambda qi, j, sel: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, kp), lambda qi, j, sel: (qi, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, kp), jnp.float32),
            pltpu.VMEM((bq, kp), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((qp, kp), jnp.float32),
            jax.ShapeDtypeStruct((qp, kp), jnp.int32),
        ),
        interpret=interpret,
    )(selected, sel_count, *operands)


def tune_nprobe_by_doubling(
    search_at,
    nlist: int,
    target_recall: float,
    *,
    start_nprobe: int = 8,
    max_nprobe: Optional[int] = None,
) -> Tuple[int, float]:
    """Shared autotune loop: smallest power-of-two nprobe whose recall@k
    against the full-probe result reaches ``target_recall``.

    ``search_at(nprobe) -> ids`` runs the probed search; both the
    single-device ``IVFIndex.tune_nprobe`` and the mesh adapter delegate
    here so their recall accounting cannot diverge."""
    cap = min(nlist, max_nprobe or nlist)
    oracle_ids = search_at(nlist)

    def recall_of(ids) -> float:
        hits = 0.0
        for got, want in zip(ids, oracle_ids):
            want_set = {int(w) for w in want if w >= 0}
            if not want_set:
                continue
            hits += len({int(g) for g in got if g >= 0} & want_set) / len(
                want_set
            )
        return hits / max(len(oracle_ids), 1)

    nprobe = max(1, min(start_nprobe, cap))
    best = recall_of(search_at(nprobe))
    while best < target_recall and nprobe < cap:
        nprobe = min(2 * nprobe, cap)
        best = recall_of(search_at(nprobe))
    return nprobe, best


# Donating the corpus updates the layout in place (no multi-GB copy per
# incremental append).
@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(corpus: jnp.ndarray, slots: jnp.ndarray, rows: jnp.ndarray):
    return corpus.at[slots].set(rows.astype(corpus.dtype))


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_valid(row_valid: jnp.ndarray, slots: jnp.ndarray):
    return row_valid.at[0, slots].set(1)


@jax.jit
def _row_norms(corpus: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(corpus.astype(jnp.float32)), axis=1)[None, :]


# ---------------------------------------------------------------------------
# IVFIndex
# ---------------------------------------------------------------------------

class IVFIndex:
    """Cluster-pruned exact-scoring index (layout + search)."""

    def __init__(
        self,
        centroids: np.ndarray,
        corpus_ivf: np.ndarray,   # [nlist * L, D] float32, padding rows zero
        perm: np.ndarray,         # [nlist * L] original row id or -1
        capacity: int,
        *,
        metric: str = "ip",
        store_dtype: str = "float32",
        quantized: bool = False,
    ) -> None:
        self.quantized = quant_ops.resolve_store_quantized(quantized)
        # int8 MXU feed pinned at construction (mirrors
        # EmbeddingStore.int8_feed) so the env knob cannot be silently
        # frozen by whichever value was live at the first kernel compile
        self.int8_feed = quant_ops.resolve_int8_feed(None)
        self.centroids = np.asarray(centroids, np.float32)
        self.nlist = self.centroids.shape[0]
        self.capacity = int(capacity)
        self.perm = np.asarray(perm, np.int64)
        self.metric = metric
        dim = corpus_ivf.shape[1]
        self.dim = dim
        dp = _round_up(dim, _LANE)
        # clean pre-allocation ceiling check for the cluster-major layout
        # (slack x corpus rows in store dtype + optional int8 shadow) —
        # core/capacity.py; docs/OPERATIONS.md "Single-chip capacity"
        from photo_search_engine_tpu.core import capacity as capacity_mod

        capacity_mod.check_store_allocation(
            corpus_ivf.shape[0],
            0,
            dp,
            jnp.dtype(resolve_store_dtype(store_dtype)).itemsize,
            self.quantized,
            what="IVF layout allocation",
        )
        padded = np.zeros((corpus_ivf.shape[0], dp), np.float32)
        padded[:, :dim] = corpus_ivf
        self._corpus = jnp.asarray(
            padded, jnp.dtype(resolve_store_dtype(store_dtype))
        )
        self._centroids_dev = jnp.asarray(
            np.pad(self.centroids, ((0, 0), (0, dp - dim)))
        )
        self._row_valid = jnp.asarray((self.perm >= 0).astype(np.int32))[None, :]
        self._dp = dp
        self._fill = self._fill_from_perm()

    def _fill_from_perm(self) -> np.ndarray:
        return (self.perm.reshape(self.nlist, self.capacity) >= 0).sum(axis=1)

    def _ensure_quantized(self) -> None:
        """Build the int8 list shadow lazily (chunked — a whole-layout
        quantize materializes an f32 temp the size of the layout)."""
        if getattr(self, "_corpus_i8", None) is not None:
            return
        from photo_search_engine_tpu.ops.quantized import quantize_rows

        total = self._corpus.shape[0]
        chunk = 131072
        i8_parts, sc_parts = [], []
        for start in range(0, total, chunk):
            qc, sc = quantize_rows(self._corpus[start : start + chunk])
            i8_parts.append(qc)
            sc_parts.append(sc)
        self._corpus_i8 = jnp.concatenate(i8_parts)
        self._cscales = jnp.concatenate(sc_parts)[None, :]

    def _corpus_norms(self) -> jnp.ndarray:
        """[1, nlist*L] squared row norms (l2 kernel operand), cached and
        invalidated by incremental appends."""
        cached = getattr(self, "_cnorms", None)
        if cached is None:
            # jitted so cast+square+sum fuse into one pass — the eager form
            # materializes a corpus-sized f32 temp and OOMs at 1M×1536
            cached = _row_norms(self._corpus)
            self._cnorms = cached
        return cached

    # -- construction ---------------------------------------------------
    @classmethod
    def build(
        cls,
        corpus: np.ndarray,
        nlist: int,
        *,
        metric: str = "ip",
        store_dtype: str = "float32",
        train_iters: int = 10,
        slack: float = 1.5,
        seed: int = 0,
        quantized: bool = False,
    ) -> "IVFIndex":
        corpus = np.asarray(corpus, np.float32)
        n = corpus.shape[0]
        nlist = max(1, min(nlist, n))
        centroids = train_kmeans(corpus, nlist, iters=train_iters, seed=seed)
        ranked = assign_clusters(corpus, centroids)
        _, perm, capacity = balanced_layout(ranked, nlist, slack=slack)
        laid_out = np.zeros((nlist * capacity, corpus.shape[1]), np.float32)
        live = perm >= 0
        laid_out[live] = corpus[perm[live]]
        return cls(
            centroids, laid_out, perm, capacity, metric=metric,
            store_dtype=store_dtype, quantized=quantized,
        )

    @classmethod
    def build_on_device(
        cls,
        corpus_dev: jnp.ndarray,
        nlist: int,
        *,
        metric: str = "ip",
        train_iters: int = 10,
        slack: float = 1.5,
        seed: int = 0,
        quantized: bool = False,
    ) -> "IVFIndex":
        """Device-resident build: the corpus never round-trips to the host.
        Only the [N, 3] assignment table (12 MB at 1M rows) is fetched and
        the [nlist*L] permutation (8 MB) uploaded; the cluster-major layout
        is produced by one device gather.  This matters on hosts where
        device↔host transfers are slow relative to HBM."""
        n, dim = corpus_dev.shape
        nlist = max(1, min(nlist, n))
        rng = np.random.default_rng(seed)
        sample_size = min(n, max(nlist, min(nlist * 256, _TRAIN_SAMPLE_CAP)))
        sample_ids = jnp.asarray(rng.choice(n, size=sample_size, replace=False))
        sample = jnp.take(corpus_dev, sample_ids, axis=0).astype(jnp.float32)
        centroids = jnp.take(
            sample, jnp.asarray(rng.choice(sample_size, size=nlist, replace=False)), axis=0
        )
        for _ in range(train_iters):
            centroids, _ = _lloyd_step(sample, centroids, nlist)

        ranked_parts = []
        chunk = 131072
        for start in range(0, n, chunk):
            part = jax.lax.dynamic_slice_in_dim(
                corpus_dev, start, min(chunk, n - start), axis=0
            )
            ranked_parts.append(np.asarray(_assign_chunk(part, centroids, chunk)))
        ranked = np.concatenate(ranked_parts)
        if ranked.shape[1] < 3:
            ranked = np.concatenate([ranked] * 3, axis=1)[:, :3]
        _, perm, capacity = balanced_layout(ranked, nlist, slack=slack)

        # chunked gather with donated in-place writes: a single whole-layout
        # gather holds corpus + layout + gather temp simultaneously and
        # OOMs a 16GB chip at 1M×1536 f32 (slack 1.5 → 9GB layout)
        dp = _round_up(dim, _LANE)
        total = nlist * capacity
        from photo_search_engine_tpu.core import capacity as capacity_mod

        # layout coexists with the source corpus during the gather
        capacity_mod.check_store_allocation(
            total,
            n,
            dp,
            jnp.dtype(corpus_dev.dtype).itemsize,
            False,
            what="device-resident IVF build",
        )
        perm_np = np.clip(perm, 0, n - 1).astype(np.int32)
        live_np = (perm >= 0)
        laid_out = jnp.zeros((total, dp), corpus_dev.dtype)
        chunk = 131072
        for start in range(0, total, chunk):
            stop = min(start + chunk, total)
            sl = jnp.asarray(perm_np[start:stop])
            live = jnp.asarray(
                live_np[start:stop].astype(corpus_dev.dtype)
            )[:, None]
            rows_block = jnp.take(corpus_dev, sl, axis=0) * live
            if dp != dim:
                rows_block = jnp.pad(rows_block, ((0, 0), (0, dp - dim)))
            laid_out = _scatter_rows(
                laid_out,
                jnp.arange(start, stop, dtype=jnp.int32),
                rows_block,
            )
        index = cls.__new__(cls)
        index.centroids = np.asarray(centroids)
        index.nlist = nlist
        index.capacity = int(capacity)
        index.perm = np.asarray(perm, np.int64)
        index.metric = metric
        index.dim = dim
        index._dp = dp
        index._corpus = laid_out
        index.quantized = bool(quantized)
        # __init__ is bypassed here — pin the feed exactly like it does,
        # or every kernel call site reading self.int8_feed breaks
        index.int8_feed = quant_ops.resolve_int8_feed(None)
        index._centroids_dev = jnp.pad(
            centroids.astype(jnp.float32), ((0, 0), (0, dp - dim))
        )
        index._row_valid = jnp.asarray((index.perm >= 0).astype(np.int32))[None, :]
        index._fill = index._fill_from_perm()
        return index

    # -- persistence -------------------------------------------------------
    def state(self) -> dict:
        """Host-side trained state: everything needed to restore the index
        WITHOUT re-running k-means/assignment/placement.  The layout array
        itself is NOT included — it is a deterministic gather of the corpus
        through ``perm`` (``from_state`` re-materializes it), so the
        persisted footprint is centroids + perm (~37 MB at 1M×1536,
        nlist=4096) instead of the 1.5×-corpus layout (~9 GB)."""
        return {
            "centroids": self.centroids,
            "perm": self.perm,
            "capacity": np.int64(self.capacity),
            "metric": self.metric,
        }

    @classmethod
    def from_state(
        cls,
        corpus: np.ndarray,
        state: dict,
        *,
        store_dtype: str = "float32",
        quantized: bool = False,
    ) -> "IVFIndex":
        """Restore a trained index from ``state()`` + the corpus rows (in
        original insertion order).  No training: this is the TPU-native
        analogue of ``faiss.read_index`` (reference
        utils/vector_store.py:239-249) — a restart answers its first IVF
        query without the 15–27 s k-means at 1M rows."""
        corpus = np.asarray(corpus, np.float32)
        centroids = np.asarray(state["centroids"], np.float32)
        perm = np.asarray(state["perm"], np.int64)
        capacity = int(state["capacity"])
        metric = str(state.get("metric", "ip"))
        nlist = centroids.shape[0]
        if perm.shape[0] != nlist * capacity:
            raise ValueError("IVF state perm/capacity mismatch")
        live = perm >= 0
        if live.any() and int(perm[live].max()) >= corpus.shape[0]:
            raise ValueError("IVF state references rows beyond the corpus")
        laid_out = np.zeros((nlist * capacity, corpus.shape[1]), np.float32)
        laid_out[live] = corpus[perm[live]]
        return cls(
            centroids, laid_out, perm, capacity, metric=metric,
            store_dtype=store_dtype, quantized=quantized,
        )

    # -- incremental append ----------------------------------------------
    def append(self, vectors: np.ndarray, row_ids: np.ndarray) -> bool:
        """Add rows to existing lists without retraining (the FAISS
        ``IndexIVF.add`` analogue — faiss assigns to the nearest trained
        centroid and appends to that list).  Here lists have a fixed
        capacity (static kernel blocks), so each row takes its nearest of
        3 clusters with free slots, spilling to the emptiest otherwise.

        Returns False when the layout is out of free slots — the caller
        should rebuild with a fresh (larger) layout.
        """
        vectors = np.asarray(vectors, np.float32)
        row_ids = np.asarray(row_ids, np.int64)
        m = vectors.shape[0]
        if m == 0:
            return True
        if int(self._fill.sum()) + m > self.nlist * self.capacity:
            return False
        ranked = assign_clusters(vectors, self.centroids)
        slots = np.empty(m, np.int64)
        for r in range(m):
            target = -1
            for choice in ranked[r]:
                if self._fill[choice] < self.capacity:
                    target = int(choice)
                    break
            if target < 0:
                target = int(np.argmin(self._fill))
                if self._fill[target] >= self.capacity:
                    return False  # everything full (can't happen after the
                    # sum guard above, but keep the invariant explicit)
            slots[r] = target * self.capacity + self._fill[target]
            self._fill[target] += 1
        self.perm[slots] = row_ids
        padded = np.zeros((m, self._dp), np.float32)
        padded[:, : self.dim] = vectors
        # pad the batch to bound scatter recompiles; duplicate slot writes
        # carry identical values, so the scatter stays deterministic
        mp = _round_up(m, 8)
        slots_p = np.concatenate([slots, np.full(mp - m, slots[0], np.int64)])
        rows_p = np.concatenate([padded, np.tile(padded[:1], (mp - m, 1))])
        self._corpus = _scatter_rows(
            self._corpus, jnp.asarray(slots_p, jnp.int32), jnp.asarray(rows_p)
        )
        self._row_valid = _set_valid(
            self._row_valid, jnp.asarray(slots_p, jnp.int32)
        )
        self._cnorms = None  # l2 norm cache covers the old rows only
        self._corpus_i8 = None  # int8 shadow rebuilt lazily on next search
        self._cscales = None
        return True

    # -- nprobe autotune --------------------------------------------------
    def tune_nprobe(
        self,
        queries: np.ndarray,
        k: int,
        target_recall: float = 0.98,
        *,
        start_nprobe: int = 8,
        max_nprobe: Optional[int] = None,
    ) -> Tuple[int, float]:
        """Smallest power-of-two ``nprobe`` whose recall@k on the given
        query sample reaches ``target_recall``, measured against the
        full-probe (nprobe = nlist) result — i.e. against exact search over
        the live rows, isolating the cluster-pruning loss.  Returns
        ``(nprobe, achieved_recall)``.

        This is the missing half of the FAISS workflow: faiss ships the
        knob (``IndexIVF.nprobe``) and leaves tuning to the user; here the
        serving layer can ask for a recall target instead (the reference's
        flat indexes have recall 1.0 by construction, so matching its
        quality budget means tuning nprobe, not hoping).  Cost: one exact
        full-probe pass plus one probed pass per doubling, on the sample
        only."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        total_live = int((self.perm >= 0).sum())
        k = max(1, min(k, total_live))
        return tune_nprobe_by_doubling(
            lambda nprobe: self.search(queries, k, nprobe=nprobe)[1],
            self.nlist,
            target_recall,
            start_nprobe=start_nprobe,
            max_nprobe=max_nprobe,
        )

    # -- filters ----------------------------------------------------------
    def supports_masked_search(self) -> bool:
        """Masked (per-row filtered) probing is supported for every metric:
        the filter folds into the kernel's row-validity operand, so
        ``index_type=ivf`` keeps cluster pruning under time filters instead
        of falling back to a full exact scan (the reference composes ES
        filters with ANN recall — utils/keyword_store.py:286-392 and the
        searcher over-fetch at core/searcher.py:814-817)."""
        return True

    _MASK_LRU_SIZE = 16

    def _slot_mask(self, mask: np.ndarray) -> Tuple[jnp.ndarray, float]:
        """Original-row-order filter bits → device [1, nlist*L] slot mask
        (LRU-cached by content), plus the live-row selectivity ratio."""
        from collections import OrderedDict
        import hashlib
        import threading

        bits = np.asarray(mask).astype(np.int32, copy=False)
        live = self.perm >= 0
        slot_bits = np.zeros(self.perm.shape[0], np.int32)
        src = np.clip(self.perm[live], 0, bits.shape[0] - 1)
        slot_bits[live] = bits[src]
        n_live = int(live.sum())
        ratio = float(slot_bits.sum()) / max(n_live, 1)
        # pipelined micro-batches hit this LRU from concurrent threads;
        # dict.setdefault is atomic under the GIL so the lazily created
        # lock is unique even when two threads race the first call
        lock = self.__dict__.setdefault("_mask_lru_lock", threading.Lock())
        with lock:
            lru = self.__dict__.setdefault("_mask_lru", OrderedDict())
        digest = hashlib.blake2b(slot_bits.tobytes(), digest_size=16).digest()
        key = (digest, slot_bits.shape[0])
        with lock:
            cached = lru.get(key)
            if cached is not None:
                lru.move_to_end(key)
                return cached, ratio
        dev = jnp.asarray(slot_bits)[None, :]
        with lock:
            lru[key] = dev
            while len(lru) > self._MASK_LRU_SIZE:
                lru.popitem(last=False)
        return dev, ratio

    @staticmethod
    def _inflate_nprobe(nprobe: int, ratio: float, nlist: int) -> int:
        """Selective filters thin out probed lists; widen the probe set by
        ~1/selectivity (the IVF analogue of the reference's candidate_k
        over-fetch, core/searcher.py:814-817), rounded to a power of two so
        recompiles stay bounded, capped at nlist."""
        boost = int(np.ceil(1.0 / max(ratio, 1e-3)))
        target = min(nlist, nprobe * min(boost, 16))
        eff = nprobe
        while eff < target:
            eff *= 2
        return min(eff, nlist)

    # -- probing --------------------------------------------------------
    def _probe(self, queries: jnp.ndarray, nprobe: int):
        """Stage 1: per-query probed clusters + union selection."""
        nprobe = max(1, min(nprobe, self.nlist))
        scores = jax.lax.dot_general(
            queries.astype(jnp.float32),
            self._centroids_dev,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Rank probes by nearest centroid (2s − ‖c‖², the per-query-constant
        # part of −L2 dropped) for BOTH metrics: rows were ASSIGNED to their
        # L2-nearest centroid (_lloyd_step/_assign_chunk), and raw IP
        # disagrees with that geometry when centroid norms vary — IP
        # ranking favors large-norm (tight) clusters.  On near-uniform
        # synthetic manifolds the norms are nearly equal and both rankings
        # coincide (measured: no recall change at 1M/intrinsic-32); on
        # skewed real corpora the nearest-centroid form is the safe one.
        cn = jnp.sum(jnp.square(self._centroids_dev), 1)[None, :]
        scores = 2.0 * scores - cn
        _, probe_ids = jax.lax.top_k(scores, nprobe)  # [Q, nprobe]
        q = queries.shape[0]
        probe_matrix = jnp.zeros((q, self.nlist), jnp.int32)
        probe_matrix = jax.vmap(lambda row, ids: row.at[ids].set(1))(
            probe_matrix, probe_ids
        )
        any_probe = jnp.sum(probe_matrix, axis=0)  # [nlist]
        s_max = min(self.nlist, q * nprobe)
        # order clusters by probe popularity; the first `sel_count` are live
        selected = jnp.argsort(-any_probe)[:s_max].astype(jnp.int32)
        sel_count = jnp.sum((any_probe > 0).astype(jnp.int32))
        return probe_matrix, selected, sel_count, s_max

    # -- device-only search (benchmark / composition surface) -----------
    def device_search_fn(self, k: int, nprobe: int, batch: int):
        """A jittable ``fn(queries_dev) -> (vals, slot_idx)`` running probe +
        stage-2 kernel entirely on device (no host conversions), for
        dependency-chained benchmarking and fusion into larger jits.
        Stored arrays are bound as explicit arguments — closing over
        multi-GB device arrays turns them into jaxpr constants and stalls
        compilation (see docs/DESIGN.md)."""
        nprobe = max(1, min(nprobe, self.nlist))
        total_live = int((self.perm >= 0).sum())
        k = min(k, total_live)
        bq = min(128, _round_up(batch, 8))
        s_max = min(self.nlist, batch * nprobe)
        nlist, capacity = self.nlist, self.capacity
        metric = "l2" if self.metric == "l2" else "ip"
        interpret = jax.default_backend() != "tpu"
        cnorms = (
            self._corpus_norms()
            if metric == "l2"
            else jnp.zeros((1, nlist * capacity), jnp.float32)
        )
        quantized = self.quantized and k <= 64
        if quantized:
            self._ensure_quantized()
            corpus_i8, cscales = self._corpus_i8, self._cscales
        else:
            # 1-element dummies keep the jit signature uniform
            corpus_i8 = jnp.zeros((1, 1), jnp.int8)
            cscales = jnp.zeros((1, 1), jnp.float32)
        dp = self._dp
        int8_feed = self.int8_feed  # closure-bound: jit statics must not read env

        @jax.jit
        def run(corpus, corpus_i8, cscales, cents, row_valid, cnorms, queries):
            queries = jnp.pad(
                queries, ((0, 0), (0, dp - queries.shape[1]))
            )
            scores = jax.lax.dot_general(
                queries.astype(jnp.float32), cents, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # nearest-centroid probe ranking for both metrics — must match
            # the L2 assignment geometry (see _probe)
            cn = jnp.sum(jnp.square(cents), 1)[None, :]
            scores = 2.0 * scores - cn
            _, probe_ids = jax.lax.top_k(scores, nprobe)
            probe_matrix = jnp.zeros((batch, nlist), jnp.int32)
            probe_matrix = jax.vmap(lambda row, ids: row.at[ids].set(1))(
                probe_matrix, probe_ids
            )
            any_probe = jnp.sum(probe_matrix, axis=0)
            selected = jnp.argsort(-any_probe)[:s_max].astype(jnp.int32)
            sel_count = jnp.sum((any_probe > 0).astype(jnp.int32))
            qp = _round_up(batch, bq)
            queries_p = jnp.pad(
                queries.astype(corpus.dtype), ((0, qp - batch), (0, 0))
            )
            probe_p = jnp.pad(probe_matrix, ((0, qp - batch), (0, 0)))
            if quantized:
                k_kern = min(max(2 * k, 20), 64, capacity)
                qf = queries_p.astype(jnp.float32)
                qs = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0
                q_i8 = jnp.clip(
                    jnp.round(qf / jnp.maximum(qs, 1e-30)), -127, 127
                ).astype(jnp.int8)
                vals, idx = _ivf_pallas(
                    corpus_i8, q_i8, selected, jnp.reshape(sel_count, (1, 1)),
                    probe_p, row_valid, cnorms, qs, cscales,
                    k_kern, bq, capacity, s_max,
                    interpret=interpret, metric=metric, int8=True,
                    int8_feed=int8_feed,
                )
                ci = idx[:batch, :k_kern]
                live = jnp.logical_not(jnp.isneginf(vals[:batch, :k_kern]))
                rows = jnp.take(
                    corpus, jnp.clip(ci, 0, corpus.shape[0] - 1), axis=0
                )
                exact = jnp.einsum(
                    "qd,qcd->qc", queries[:batch].astype(corpus.dtype), rows,
                    preferred_element_type=jnp.float32,
                )
                if metric == "l2":
                    qn = jnp.sum(
                        jnp.square(queries[:batch].astype(jnp.float32)), 1,
                        keepdims=True,
                    )
                    cn = jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=2)
                    exact = -(qn + cn - 2.0 * exact)
                exact = jnp.where(live, exact, -jnp.inf)
                vals, order = jax.lax.top_k(exact, k)
                idx = jnp.take_along_axis(ci, order, axis=1)
                return vals, idx
            vals, idx = _ivf_pallas(
                corpus, queries_p, selected, jnp.reshape(sel_count, (1, 1)),
                probe_p, row_valid, cnorms,
                jnp.ones((qp, 1), jnp.float32),
                jnp.ones((1, nlist * capacity), jnp.float32),
                k, bq, capacity, s_max,
                interpret=interpret, metric=metric,
            )
            vals = vals[:batch, :k]
            idx = idx[:batch, :k]
            if metric == "l2":
                qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), 1, keepdims=True)
                vals = jnp.where(jnp.isneginf(vals), vals, vals - qn)
            return vals, idx

        return functools.partial(
            run, self._corpus, corpus_i8, cscales, self._centroids_dev,
            self._row_valid, cnorms,
        )

    # -- search ---------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int = 64,
        *,
        mask: Optional[np.ndarray] = None,  # original-row-order filter bits
        impl: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances, ORIGINAL row ids), -1 for missing slots.

        ``mask`` filters by original row id WITHOUT losing cluster pruning:
        the bits permute into the slot layout, fold into the kernel's
        row-validity operand, and the probe width inflates by ~1/selectivity
        (see ``_inflate_nprobe``)."""
        queries = jnp.atleast_2d(jnp.asarray(queries, self._corpus.dtype))
        q, dim = queries.shape
        queries = jnp.pad(queries, ((0, 0), (0, self._dp - dim)))
        total_live = int((self.perm >= 0).sum())
        k = min(k, total_live)
        if k == 0:
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        row_valid = self._row_valid
        if mask is not None:
            slot_mask, ratio = self._slot_mask(mask)
            row_valid = row_valid * slot_mask
            nprobe = self._inflate_nprobe(nprobe, ratio, self.nlist)
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "lax"
        if impl == "pallas" and self.quantized and k > 64:
            impl = "lax"  # the int8 nomination pool is capped at 64
        if impl == "pallas":
            # VMEM guard: the kernel double-buffers one whole cluster block
            # plus the probe matrix; oversized layouts (huge L×D or nlist)
            # fall back to the XLA path.  Sub-blocking clusters is future
            # work for very large dims.
            itemsize = jnp.dtype(self._corpus.dtype).itemsize
            block_bytes = 2 * self.capacity * self._dp * itemsize
            probe_bytes = 2 * 128 * self.nlist * 4
            if block_bytes + probe_bytes > 12 * 1024 * 1024:
                impl = "lax"

        # bucket the probed row count so the centroid probe and the kernel
        # compile a bounded shape set under organic serving batch sizes
        # (ops/topk.bucket_queries rationale); padded zero queries probe
        # arbitrary clusters and their rows slice off below
        bq = min(128, bucket_queries(q))
        qp = _round_up(q, bq)
        queries_pad = jnp.pad(queries, ((0, qp - q), (0, 0)))
        probe_matrix, selected, sel_count, s_max = self._probe(queries_pad, nprobe)

        if impl == "lax":
            scores = jax.lax.dot_general(
                queries, self._corpus, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST
                if jnp.dtype(self._corpus.dtype).itemsize >= 4
                else jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            if self.metric == "l2":
                qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), 1, keepdims=True)
                cn = jnp.sum(jnp.square(self._corpus.astype(jnp.float32)), 1)[None, :]
                scores = -(qn + cn - 2.0 * scores)
            cluster_of_slot = (
                jnp.arange(self.nlist * self.capacity, dtype=jnp.int32) // self.capacity
            )
            probed = jnp.take(probe_matrix[:q], cluster_of_slot, axis=1) > 0
            keep = jnp.logical_and(probed, row_valid > 0)
            scores = jnp.where(keep, scores, -jnp.inf)
            vals, idx = jax.lax.top_k(scores, k)
        else:
            queries_p = queries_pad
            probe_p = probe_matrix
            cnorms = (
                self._corpus_norms()
                if self.metric == "l2"
                else jnp.zeros((1, self.nlist * self.capacity), jnp.float32)
            )
            metric = "l2" if self.metric == "l2" else "ip"
            interpret = jax.default_backend() != "tpu"
            if self.quantized:
                # int8 list scan nominating 2k candidates, then an exact
                # rescore from the full-precision layout (same two-tier
                # pattern as ops/quantized.py)
                self._ensure_quantized()
                k_kern = min(max(2 * k, 20), 64, self.capacity)
                qf = queries_p.astype(jnp.float32)
                qs = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0
                q_i8 = jnp.clip(
                    jnp.round(qf / jnp.maximum(qs, 1e-30)), -127, 127
                ).astype(jnp.int8)
                vals, idx = _ivf_pallas(
                    self._corpus_i8,
                    q_i8,
                    selected,
                    jnp.reshape(sel_count, (1, 1)),
                    probe_p,
                    row_valid,
                    cnorms,
                    qs,
                    self._cscales,
                    k_kern,
                    bq,
                    self.capacity,
                    s_max,
                    interpret=interpret,
                    metric=metric,
                    int8=True,
                    int8_feed=self.int8_feed,
                )
                ci = idx[:q, :k_kern]
                live = jnp.logical_not(jnp.isneginf(vals[:q, :k_kern]))
                rows = jnp.take(
                    self._corpus, jnp.clip(ci, 0, self._corpus.shape[0] - 1), axis=0
                )
                exact = jnp.einsum(
                    "qd,qcd->qc",
                    queries[:q].astype(self._corpus.dtype),
                    rows,
                    preferred_element_type=jnp.float32,
                )
                if metric == "l2":
                    qn = jnp.sum(
                        jnp.square(queries[:q].astype(jnp.float32)), 1, keepdims=True
                    )
                    cn = jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=2)
                    exact = -(qn + cn - 2.0 * exact)
                exact = jnp.where(live, exact, -jnp.inf)
                vals, order = jax.lax.top_k(exact, k)
                idx = jnp.take_along_axis(ci, order, axis=1)
            else:
                vals, idx = _ivf_pallas(
                    self._corpus,
                    queries_p,
                    selected,
                    jnp.reshape(sel_count, (1, 1)),
                    probe_p,
                    row_valid,
                    cnorms,
                    jnp.ones((qp, 1), jnp.float32),
                    jnp.ones((1, self.nlist * self.capacity), jnp.float32),
                    k,
                    bq,
                    self.capacity,
                    s_max,
                    interpret=interpret,
                    metric=metric,
                )
                vals = vals[:q, :k]
                idx = idx[:q, :k]
                if self.metric == "l2":
                    # kernel merged by 2<q,c> - |c|²; subtract |q|² to
                    # restore -(squared l2), matching the lax convention
                    qn = jnp.sum(jnp.square(queries[:q].astype(jnp.float32)), 1,
                                 keepdims=True)
                    vals = jnp.where(jnp.isneginf(vals), vals, vals - qn)

        vals_np = np.asarray(vals)
        idx_np = np.asarray(idx)
        empty = ~np.isfinite(vals_np) if self.metric == "ip" else np.isneginf(vals_np)
        original = np.where(
            (idx_np >= 0) & ~empty, self.perm[np.clip(idx_np, 0, len(self.perm) - 1)], -1
        )
        if self.metric == "l2":
            vals_np = np.where(empty, np.inf, -vals_np)
        else:
            vals_np = np.where(empty, -np.inf, vals_np)
        return vals_np, original
