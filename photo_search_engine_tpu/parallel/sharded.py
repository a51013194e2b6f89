"""Sharded retrieval over a device mesh.

Design (BASELINE.md north star; SURVEY.md §5 distributed-comm statement):
* the embedding matrix is sharded on the row axis across the ``data``
  mesh axis (1 chip = degenerate mesh, same code path);
* each chip runs the fused scoring+top-k kernel on its shard → partial
  (values, local indices);
* local indices are rebased to global row ids, partials are
  ``all_gather``-ed over ICI (tiny: D×Q×k values), and a final top-k
  merges them — replicated on every chip.

Also provides the sharded k-means step (the IVF coarse-quantizer
training step): data-parallel assignment on each shard + ``psum`` of
per-centroid sums/counts — this is the framework's "training step" and
what ``__graft_entry__.dryrun_multichip`` exercises.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from photo_search_engine_tpu.ops import quantized as quant_ops
from photo_search_engine_tpu.ops import topk as topk_ops

DATA_AXIS = "data"


def _is_multi_controller(mesh: Mesh) -> bool:
    """True when the mesh spans devices this process cannot address (a
    ``jax.distributed`` multi-controller job — the DCN topology)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _stage(mesh: Mesh, x, spec: P, dtype=None):
    """Place a host array directly onto the mesh with an explicit sharding.

    Host data must NEVER go through ``jnp.asarray``/``jnp.full`` here: those
    commit to the *default* backend, which on some hosts is a TPU plugin the
    CPU-mesh path must not touch (and may be broken — e.g. a libtpu version
    mismatch).  jax.Array inputs are assumed already placed by the caller
    (pulling a sharded corpus back to host to re-place it would cost
    minutes/GB on this relay).

    Multi-controller meshes (multi-host/DCN): every controller passes the
    same full host value (SPMD replicated logic), and each process uploads
    ONLY the slice its own devices hold —
    ``make_array_from_process_local_data`` slices the addressable portion,
    so no controller ever touches a remote device (SURVEY.md §5)."""
    if isinstance(x, jax.Array):
        return x
    arr = np.asarray(x, dtype) if dtype is not None else np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if _is_multi_controller(mesh):
        return jax.make_array_from_process_local_data(
            sharding, arr, global_shape=arr.shape
        )
    return jax.device_put(arr, sharding)


@functools.lru_cache(maxsize=None)
def _row_updater(mesh: Mesh, ndim: int):
    """Donated per-shard tail write: each shard applies a
    ``dynamic_update_slice`` of its chunk at its own start offset —
    the sharded analogue of core/embedding_store._update_slice_jit."""
    spec = P(DATA_AXIS, None) if ndim == 2 else P(DATA_AXIS)

    @functools.partial(jax.jit, donate_argnums=(0,))
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )
    def upd(buf, chunk, starts):
        s = jax.lax.axis_index(DATA_AXIS)
        idx = (starts[s], 0) if ndim == 2 else (starts[s],)
        return jax.lax.dynamic_update_slice(buf, chunk.astype(buf.dtype), idx)

    return upd


def _shard_block_n(shard_rows: int, dim: int = 1536) -> int:
    """Largest int8 kernel block that divides the shard capacity (so the
    per-shard pad inside shard_map is a no-op instead of a shard copy),
    capped at the resolved feed's VMEM budget (the bf16 feed holds a
    dequantized copy of the block — ops/quantized.default_block_n_int8)."""
    cap = quant_ops.default_block_n_int8(
        dim, quant_ops.resolve_int8_feed(None)
    )
    for bn in (2048, 1024, 512, 256, 128):
        if bn <= cap and shard_rows % bn == 0:
            return bn
    return None  # let int8_search pick (it will pad the shard)


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _local_topk(
    corpus_shard: jnp.ndarray,
    queries: jnp.ndarray,
    counts: jnp.ndarray,  # [n_shards] live rows per shard
    k: int,
    metric: str,
    impl: str,
    axis: str,
    mask_shard: Optional[jnp.ndarray] = None,  # [shard_rows] int; >0 = keep
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shard_id = jax.lax.axis_index(axis)
    shard_rows = corpus_shard.shape[0]
    count = counts[shard_id]
    k = min(k, shard_rows)  # a shard can contribute at most shard_rows hits
    if impl == "approx":
        # large-candidate route (store-level routing decision, the
        # sharded mirror of EmbeddingStore's ApproxTopK path): XLA
        # ApproxTopK per shard at recall_target 0.99 instead of the full
        # sort the lax fallback pays at k > the kernel's unrolled max —
        # measured 3.2-6.8x at 1M/candidate_k=500 (docs/DESIGN.md).  The
        # head is effectively exact; the tail only feeds fusion/threshold
        # statistics.  Off-TPU approx_max_k computes exactly.
        vals, idx = topk_ops.approx_search_large_k(
            corpus_shard, queries, k, count=count, mask=mask_shard,
            metric=metric,
        )
        if metric == "l2":
            empty = jnp.isposinf(vals)
            vals = jnp.where(empty, -jnp.inf, -vals)
    elif impl == "pallas":
        # the live-count mask must ride INSIDE the scan (padding rows score
        # 0 for ip and would displace real hits before any post-mask)
        vals, idx = topk_ops.exact_search(
            corpus_shard, queries, k, count=count, mask=mask_shard,
            metric=metric, impl="pallas",
        )
        if metric == "l2":
            # merge ranks by descending score; exact_search returned
            # ascending distances (+inf for empty slots) — re-negate.
            empty = jnp.isposinf(vals)
            vals = jnp.where(empty, -jnp.inf, -vals)
    else:
        scores = jax.lax.dot_general(
            queries.astype(corpus_shard.dtype),
            corpus_shard,
            (((1,), (1,)), ((), ())),
            precision=topk_ops._dot_precision(corpus_shard.dtype),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), 1, keepdims=True)
            cn = jnp.sum(jnp.square(corpus_shard.astype(jnp.float32)), 1)[None, :]
            scores = -(qn + cn - 2.0 * scores)
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = rows < count
        if mask_shard is not None:
            valid = jnp.logical_and(valid, mask_shard[None, :] > 0)
        scores = jnp.where(valid, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)
        idx = jnp.where(jnp.isneginf(vals), -1, idx)
    global_idx = jnp.where(idx >= 0, idx + shard_id * shard_rows, -1)
    return vals, global_idx


def _merge_partials(
    vals: jnp.ndarray, idx: jnp.ndarray, k: int, axis: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # all_gather over ICI: [n_shards, Q, k] — tiny payload
    all_vals = jax.lax.all_gather(vals, axis)
    all_idx = jax.lax.all_gather(idx, axis)
    n_shards, q, kk = all_vals.shape
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q, n_shards * kk)
    flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, n_shards * kk)
    merged_vals, positions = jax.lax.top_k(flat_vals, k)
    merged_idx = jnp.take_along_axis(flat_idx, positions, axis=1)
    merged_idx = jnp.where(jnp.isneginf(merged_vals), -1, merged_idx)
    return merged_vals, merged_idx


def sharded_exact_search(
    corpus: jnp.ndarray,   # [n_shards * shard_rows, D] (row-sharded or host)
    queries: jnp.ndarray,  # [Q, D]
    k: int,
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,  # live rows per shard
    metric: str = "ip",
    impl: str = "auto",
    axis: str = DATA_AXIS,
    mask: Optional[np.ndarray] = None,  # [total_rows] corpus-layout filter
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN over a row-sharded corpus; returns replicated
    (distances, global indices) with FAISS conventions.  ``mask`` rides
    inside each shard's scan (the ES-filter analogue, sharded).

    ``impl="approx"`` opts into the per-shard ApproxTopK large-candidate
    scan (recall_target 0.99 on the tail; exact off-TPU) — the routing
    decision lives in ``ShardedEmbeddingStore.search``, mirroring the
    unsharded store; this function stays exact unless explicitly asked."""
    n_shards = mesh.shape[axis]
    total_rows, dim = corpus.shape
    if total_rows % n_shards:
        raise ValueError(
            f"corpus rows {total_rows} must divide evenly over {n_shards} shards"
        )
    shard_rows = total_rows // n_shards
    if counts is None:
        counts = np.full((n_shards,), shard_rows, np.int32)
    counts_arr = _stage(mesh, counts, P(), np.int32)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "lax"
    corpus = _stage(mesh, corpus, P(DATA_AXIS, None))
    if not isinstance(queries, jax.Array):
        queries = np.atleast_2d(np.asarray(queries))
    queries = jnp.atleast_2d(_stage(mesh, queries, P()))
    k = min(k, total_rows)
    kernel_metric = "ip" if metric == "cosine" else metric
    has_mask = mask is not None
    mask_arr = _stage(mesh, mask, P(axis), np.int32) if has_mask else None

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()) + ((P(axis),) if has_mask else ()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(corpus_shard, queries_rep, counts_rep, *rest):
        vals, idx = _local_topk(
            corpus_shard, queries_rep, counts_rep, k, kernel_metric, impl, axis,
            mask_shard=rest[0] if rest else None,
        )
        return _merge_partials(vals, idx, k, axis)

    args = (corpus, queries, counts_arr) + ((mask_arr,) if has_mask else ())
    vals, idx = jax.jit(run)(*args)
    if metric == "l2":
        empty = jnp.isneginf(vals)
        vals = jnp.where(empty, jnp.inf, -vals)
    return vals, idx


def sharded_int8_search(
    corpus_i8: jnp.ndarray,   # [n_shards * shard_rows, D] int8 (row-sharded)
    scales: jnp.ndarray,      # [n_shards * shard_rows] f32 per-row scales
    corpus_ref: jnp.ndarray,  # [n_shards * shard_rows, D] full-precision rows
    queries: jnp.ndarray,     # [Q, D] f32
    k: int,
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,
    metric: str = "ip",
    axis: str = DATA_AXIS,
    mask: Optional[np.ndarray] = None,  # [total_rows] corpus-layout filter
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded int8-scan + exact-rescore k-NN (ops/quantized.py per shard,
    all_gather merge of the exactly-rescored partials over ICI).  Same
    conventions as ``sharded_exact_search``."""
    n_shards = mesh.shape[axis]
    total_rows, dim = corpus_i8.shape
    if total_rows % n_shards:
        raise ValueError(
            f"corpus rows {total_rows} must divide evenly over {n_shards} shards"
        )
    shard_rows = total_rows // n_shards
    if counts is None:
        counts = np.full((n_shards,), shard_rows, np.int32)
    counts_arr = _stage(mesh, counts, P(), np.int32)
    corpus_i8 = _stage(mesh, corpus_i8, P(DATA_AXIS, None))
    scales = _stage(mesh, scales, P(DATA_AXIS), np.float32)
    corpus_ref = _stage(mesh, corpus_ref, P(DATA_AXIS, None))
    if not isinstance(queries, jax.Array):
        queries = np.atleast_2d(np.asarray(queries, np.float32))
    queries = jnp.atleast_2d(_stage(mesh, queries, P())).astype(jnp.float32)
    k = min(k, total_rows)
    kernel_metric = "ip" if metric == "cosine" else metric
    block_n = _shard_block_n(shard_rows, dim)
    has_mask = mask is not None
    mask_arr = _stage(mesh, mask, P(axis), np.int32) if has_mask else None

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None), P(), P())
        + ((P(axis),) if has_mask else ()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(i8_shard, scales_shard, ref_shard, queries_rep, counts_rep, *rest):
        shard_id = jax.lax.axis_index(axis)
        count = counts_rep[shard_id]
        k_local = min(k, shard_rows)
        vals, idx = quant_ops.int8_search(
            i8_shard,
            scales_shard,
            ref_shard,
            queries_rep,
            k_local,
            count=count,
            mask=rest[0] if rest else None,
            metric=kernel_metric,
            block_n=block_n,
        )
        if kernel_metric == "l2":
            # merge ranks by descending score; re-negate ascending distances
            empty = jnp.isposinf(vals)
            vals = jnp.where(empty, -jnp.inf, -vals)
        global_idx = jnp.where(idx >= 0, idx + shard_id * shard_rows, -1)
        return _merge_partials(vals, global_idx, k, axis)

    args = (corpus_i8, scales, corpus_ref, queries, counts_arr) + (
        (mask_arr,) if has_mask else ()
    )
    vals, idx = jax.jit(run)(*args)
    if metric == "l2":
        empty = jnp.isneginf(vals)
        vals = jnp.where(empty, jnp.inf, -vals)
    return vals, idx


def sharded_grouped_search(
    corpus: jnp.ndarray,      # [n_shards * shard_rows, D] row-sharded
    queries: jnp.ndarray,     # [Q, D]
    mask_table: np.ndarray,   # [M, total_rows] corpus-layout predicates
    mask_ids: np.ndarray,     # [Q] predicate row per query
    k: int,
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,
    impl: str = "auto",
    axis: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query filtered top-k over the sharded corpus: each shard runs
    the grouped-mask kernel (ops/grouped_mask.py) on its row slice of the
    predicate table, partials merge over ICI.  Inner-product metric (the
    serving micro-batcher's filtered path)."""
    n_shards = mesh.shape[axis]
    total_rows, _ = corpus.shape
    if total_rows % n_shards:
        raise ValueError(
            f"corpus rows {total_rows} must divide evenly over {n_shards} shards"
        )
    shard_rows = total_rows // n_shards
    if counts is None:
        counts = np.full((n_shards,), shard_rows, np.int32)
    counts_arr = _stage(mesh, counts, P(), np.int32)
    corpus = _stage(mesh, corpus, P(DATA_AXIS, None))
    if not isinstance(queries, jax.Array):
        queries = np.atleast_2d(np.asarray(queries))
    queries = jnp.atleast_2d(_stage(mesh, queries, P()))
    from photo_search_engine_tpu.ops import grouped_mask as grouped_ops

    # bucket M before staging so the outer jit (keyed on the table shape)
    # retraces at most log2 times, not once per distinct predicate count
    mask_table = grouped_ops.bucket_mask_table(np.asarray(mask_table))
    table = _stage(mesh, mask_table, P(None, axis), np.int8)
    ids = _stage(mesh, mask_ids, P(), np.int32)
    k = min(k, total_rows)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(None, axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(corpus_shard, queries_rep, table_shard, ids_rep, counts_rep):
        shard_id = jax.lax.axis_index(axis)
        count = counts_rep[shard_id]
        if impl == "approx":
            # per-shard grouped ApproxTopK (the grouped mirror of the
            # _local_topk approx branch); exact off-TPU
            vals, idx = grouped_ops.grouped_approx_large_k(
                corpus_shard, queries_rep, table_shard, ids_rep,
                min(k, shard_rows), count=count,
            )
        else:
            vals, idx = grouped_ops.grouped_mask_search(
                corpus_shard, queries_rep, table_shard, ids_rep,
                min(k, shard_rows), count=count, impl=impl,
            )
        global_idx = jnp.where(idx >= 0, idx + shard_id * shard_rows, -1)
        return _merge_partials(vals, global_idx, k, axis)

    return jax.jit(run)(corpus, queries, table, ids, counts_arr)


def sharded_grouped_int8_search(
    corpus_i8: jnp.ndarray,   # [n_shards * shard_rows, D] int8 (row-sharded)
    scales: jnp.ndarray,      # [n_shards * shard_rows] f32 per-row scales
    corpus_ref: jnp.ndarray,  # [n_shards * shard_rows, D] full-precision rows
    queries: jnp.ndarray,     # [Q, D] f32
    mask_table: np.ndarray,   # [M, total_rows] corpus-layout predicates
    mask_ids: np.ndarray,     # [Q] predicate row per query
    k: int,
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,
    axis: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query filtered int8-scan + exact-rescore over the sharded corpus:
    the int8 sibling of ``sharded_grouped_search`` — each shard runs
    ops/quantized.grouped_int8_search on its row slice (int8 nomination +
    exact rescore from the full-precision shard), partials merge over ICI.
    Inner-product metric (the quantized micro-batcher's filtered path)."""
    n_shards = mesh.shape[axis]
    total_rows, _ = corpus_i8.shape
    if total_rows % n_shards:
        raise ValueError(
            f"corpus rows {total_rows} must divide evenly over {n_shards} shards"
        )
    shard_rows = total_rows // n_shards
    if counts is None:
        counts = np.full((n_shards,), shard_rows, np.int32)
    counts_arr = _stage(mesh, counts, P(), np.int32)
    corpus_i8 = _stage(mesh, corpus_i8, P(DATA_AXIS, None))
    scales = _stage(mesh, scales, P(DATA_AXIS), np.float32)
    corpus_ref = _stage(mesh, corpus_ref, P(DATA_AXIS, None))
    if not isinstance(queries, jax.Array):
        queries = np.atleast_2d(np.asarray(queries, np.float32))
    queries = jnp.atleast_2d(_stage(mesh, queries, P())).astype(jnp.float32)
    from photo_search_engine_tpu.ops import grouped_mask as grouped_ops

    # see sharded_grouped_search: bound outer-jit retraces on M
    mask_table = grouped_ops.bucket_mask_table(np.asarray(mask_table))
    table = _stage(mesh, mask_table, P(None, axis), np.int8)
    ids = _stage(mesh, mask_ids, P(), np.int32)
    k = min(k, total_rows)
    block_n = _shard_block_n(shard_rows, corpus_i8.shape[1])

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None), P(), P(None, axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(i8_shard, scales_shard, ref_shard, queries_rep, table_shard, ids_rep, counts_rep):
        shard_id = jax.lax.axis_index(axis)
        count = counts_rep[shard_id]
        vals, idx = quant_ops.grouped_int8_search(
            i8_shard,
            scales_shard,
            ref_shard,
            queries_rep,
            table_shard,
            ids_rep,
            min(k, shard_rows),
            count=count,
            block_n=block_n,
        )
        global_idx = jnp.where(idx >= 0, idx + shard_id * shard_rows, -1)
        return _merge_partials(vals, global_idx, k, axis)

    return jax.jit(run)(
        corpus_i8, scales, corpus_ref, queries, table, ids, counts_arr
    )


def sharded_kmeans_step(
    corpus: jnp.ndarray,     # [rows, D] row-sharded over mesh
    centroids: jnp.ndarray,  # [nlist, D] replicated
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,
    axis: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Lloyd iteration, data-parallel: local assignment on each shard,
    ``psum`` of per-centroid sums/counts over ICI, replicated update.
    Empty centroids keep their previous position.

    Returns (new_centroids [nlist, D] f32, assignment_counts [nlist])."""
    n_shards = mesh.shape[axis]
    total_rows, dim = corpus.shape
    if total_rows % n_shards:
        raise ValueError("corpus rows must divide evenly over shards")
    shard_rows = total_rows // n_shards
    nlist = centroids.shape[0]
    if counts is None:
        counts = np.full((n_shards,), shard_rows, np.int32)
    counts_arr = _stage(mesh, counts, P(), np.int32)
    corpus = _stage(mesh, corpus, P(DATA_AXIS, None))
    centroids = _stage(mesh, centroids, P())

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(corpus_shard, cents, counts_rep):
        shard_id = jax.lax.axis_index(axis)
        live = counts_rep[shard_id]
        x = corpus_shard.astype(jnp.float32)
        scores = jax.lax.dot_general(
            x, cents.astype(jnp.float32), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        cn = jnp.sum(jnp.square(cents.astype(jnp.float32)), axis=1)[None, :]
        # nearest by (squared) L2: argmax of 2<x,c> - |c|^2
        assign = jnp.argmax(2.0 * scores - cn, axis=1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0],), 0)
        valid = rows < live
        onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
        onehot = onehot * valid[:, None].astype(jnp.float32)
        local_sums = jax.lax.dot_general(
            onehot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [nlist, D]
        local_counts = jnp.sum(onehot, axis=0)  # [nlist]
        sums = jax.lax.psum(local_sums, axis)
        totals = jax.lax.psum(local_counts, axis)
        new_cents = jnp.where(
            totals[:, None] > 0, sums / jnp.maximum(totals[:, None], 1.0),
            cents.astype(jnp.float32),
        )
        return new_cents, totals

    return jax.jit(step)(corpus, centroids, counts_arr)


class ShardedEmbeddingStore:
    """Row-sharded corpus placed over a mesh with the search entry point.

    Capacity per shard stays equal (padding rows masked via per-shard
    counts), so appends never re-layout existing shards: new rows go to
    the shard with the fewest live rows (round-robin fill)."""

    def __init__(
        self,
        dimension: int,
        mesh: Optional[Mesh] = None,
        *,
        metric: str = "cosine",
        store_dtype: str = "float32",
        shard_block: int = 1024,
        quantized: bool = False,
    ) -> None:
        self.dimension = int(dimension)
        self.mesh = mesh or make_mesh()
        self.metric = metric
        self.store_dtype = jnp.dtype(topk_ops.resolve_store_dtype(store_dtype))
        self.shard_block = int(shard_block)
        self.quantized = quant_ops.resolve_store_quantized(quantized)
        self.n_shards = self.mesh.shape[DATA_AXIS]
        self._host_shards = [
            np.zeros((0, self.dimension), np.float32) for _ in range(self.n_shards)
        ]
        self._device: Optional[jnp.ndarray] = None
        self._device_i8: Optional[jnp.ndarray] = None
        self._scales: Optional[jnp.ndarray] = None
        self._dirty = True
        # per-shard live rows already present in the device buffer; lets
        # _sync upload only the appended tail instead of the whole corpus
        self._synced_counts: Optional[np.ndarray] = None

    @property
    def counts(self) -> np.ndarray:
        return np.array([shard.shape[0] for shard in self._host_shards], np.int32)

    @property
    def count(self) -> int:
        return int(self.counts.sum())

    # Stable id encoding: shard * _ID_STRIDE + local row.  Independent of
    # the (growing) device capacity, so ids stored by callers stay valid
    # across appends and re-syncs.
    _ID_STRIDE = 1 << 40

    def append(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows; returns stable global row ids.

        Placement is the balanced greedy fill (each row to the shard with
        the fewest live rows, ties to the lowest shard id) — computed
        vectorized: a water-fill decides how many rows each shard takes,
        then one lexsort recovers the greedy row→slot order, and each
        shard gets ONE concatenate for its whole batch (the round-1
        per-row argmin+concatenate loop was O(rows²) host copying)."""
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        n_new = vectors.shape[0]
        if n_new == 0:
            return np.zeros((0,), np.int64)
        if self.metric == "cosine":
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            vectors = np.where(norms > 0, vectors / np.maximum(norms, 1e-30), vectors)
        counts = self.counts.astype(np.int64)
        take = np.zeros(self.n_shards, np.int64)
        # water-fill: raise the lowest level until n_new rows are placed
        level = counts + take
        remaining = n_new
        while remaining > 0:
            low = level.min()
            at_low = np.flatnonzero(level == low)
            above = level[level > low]
            step = (int(above.min()) - int(low)) if above.size else remaining
            fill = min(step * at_low.size, remaining)
            per, extra = divmod(fill, at_low.size)
            take[at_low] += per
            take[at_low[:extra]] += 1  # greedy ties go to lowest shard ids
            level = counts + take
            remaining -= fill
        # greedy order = slots sorted by (local level, shard id)
        slot_shard = np.repeat(np.arange(self.n_shards, dtype=np.int64), take)
        slot_local = np.concatenate(
            [counts[s] + np.arange(take[s], dtype=np.int64)
             for s in range(self.n_shards)]
        ) if n_new else np.zeros((0,), np.int64)
        order = np.lexsort((slot_shard, slot_local))
        # input row j lands in slot order[j]
        ids = slot_shard[order] * self._ID_STRIDE + slot_local[order]
        for s in range(self.n_shards):
            if take[s]:
                sel = slot_shard[order] == s
                # within one shard the greedy order is local-ascending,
                # so the selected input rows are already in position order
                self._host_shards[s] = np.concatenate(
                    [self._host_shards[s], vectors[sel]]
                )
        self._dirty = True
        return ids

    def _shard_capacity_hint(self) -> int:
        rows = max((s.shape[0] for s in self._host_shards), default=0)
        return max(self.shard_block, -(-rows // self.shard_block) * self.shard_block)

    @staticmethod
    def _quantize_host(rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side mirror of ops/quantized.quantize_rows (symmetric
        per-row absmax) — keeps _sync off the default JAX backend."""
        absmax = np.abs(rows).max(axis=1, keepdims=True) if rows.size else \
            np.zeros((rows.shape[0], 1), np.float32)
        scale = absmax / 127.0
        q = np.clip(
            np.round(rows / np.maximum(scale, 1e-30)), -127, 127
        ).astype(np.int8)
        return q, scale[:, 0].astype(np.float32)

    def _sync(self) -> Tuple[jnp.ndarray, int]:
        """Mirror host shards into the device buffer.

        Incremental path (the common serving case — rows were appended,
        capacity unchanged): upload ONLY the per-shard tail chunks and
        write them with a donated per-shard ``dynamic_update_slice``
        (shard_map), like the single-device store's append
        (core/embedding_store.py:137-160).  Full re-upload happens only on
        first sync, capacity growth, or row removal."""
        capacity = self._shard_capacity_hint()
        if (
            not self._dirty
            and self._device is not None
            and self._device.shape[0] == capacity * self.n_shards
        ):
            return self._device, capacity
        counts = self.counts.astype(np.int64)
        full = (
            self._device is None
            or self._device.shape[0] != capacity * self.n_shards
            or self._synced_counts is None
            or np.any(counts < self._synced_counts)
        )
        if not full:
            deltas = counts - self._synced_counts
            max_d = int(deltas.max())
            if max_d == 0:
                self._dirty = False
                return self._device, capacity
            # the zero-padded chunk must fit below capacity on every shard
            # (dynamic_update_slice would clamp the start and corrupt rows)
            if np.any(self._synced_counts + max_d > capacity):
                full = True
        if full:
            stacked = np.zeros(
                (self.n_shards * capacity, self.dimension), np.float32
            )
            for shard_id, shard in enumerate(self._host_shards):
                stacked[shard_id * capacity : shard_id * capacity + shard.shape[0]] = shard
            self._device = _stage(
                self.mesh, stacked.astype(self.store_dtype), P(DATA_AXIS, None)
            )
            if self.quantized:
                q, scales = self._quantize_host(stacked)
                self._device_i8 = _stage(self.mesh, q, P(DATA_AXIS, None))
                self._scales = _stage(self.mesh, scales, P(DATA_AXIS))
        else:
            chunk = np.zeros((self.n_shards * max_d, self.dimension), np.float32)
            for s in range(self.n_shards):
                if deltas[s]:
                    chunk[s * max_d : s * max_d + deltas[s]] = self._host_shards[s][
                        self._synced_counts[s] : counts[s]
                    ]
            starts = _stage(
                self.mesh, self._synced_counts.astype(np.int32), P()
            )
            upd2 = _row_updater(self.mesh, 2)
            self._device = upd2(
                self._device,
                _stage(self.mesh, chunk.astype(self.store_dtype), P(DATA_AXIS, None)),
                starts,
            )
            if self.quantized:
                q, scales = self._quantize_host(chunk)
                self._device_i8 = upd2(
                    self._device_i8, _stage(self.mesh, q, P(DATA_AXIS, None)), starts
                )
                self._scales = _row_updater(self.mesh, 1)(
                    self._scales, _stage(self.mesh, scales, P(DATA_AXIS)), starts
                )
        self._synced_counts = counts.copy()
        self._dirty = False
        return self._device, capacity

    def layout_mask(
        self, stable_ids: np.ndarray, bits: np.ndarray
    ) -> np.ndarray:
        """Corpus-layout ([n_shards * capacity]) filter from (stable id,
        keep-bit) pairs — the shape ``search(mask=...)`` expects."""
        _, capacity = self._sync()
        out = np.zeros(self.n_shards * capacity, np.int32)
        stable_ids = np.asarray(stable_ids, np.int64)
        shard = stable_ids // self._ID_STRIDE
        local = stable_ids % self._ID_STRIDE
        out[shard * capacity + local] = np.asarray(bits, np.int32)
        return out

    def search(
        self,
        queries: np.ndarray,
        k: int,
        impl: str = "auto",
        *,
        mask: Optional[np.ndarray] = None,  # corpus-layout, see layout_mask
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances, stable global row ids); -1 for empty slots."""
        if self.count == 0:
            q = np.atleast_2d(queries).shape[0]
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        corpus, capacity = self._sync()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = np.where(norms > 0, queries / np.maximum(norms, 1e-30), queries)
        if impl == "int8" and not self.quantized:
            raise ValueError(
                "impl='int8' requires ShardedEmbeddingStore(quantized=True)"
            )
        if impl == "int8" and min(k, self.count) <= quant_ops._INT8_MAX_K:
            vals, idx = sharded_int8_search(
                self._device_i8,
                self._scales,
                corpus,
                queries,  # staged onto the mesh by sharded_int8_search
                min(k, self.count),
                self.mesh,
                counts=self.counts,
                metric=self.metric,
                mask=mask,
            )
        else:
            route_impl = "auto" if impl == "int8" else impl
            if (
                impl in ("auto", "int8")
                and min(k, self.count) > topk_ops._PALLAS_MAX_K
                and topk_ops._use_approx_large_k(capacity)
                and not getattr(self, "_approx_large_k_broken", False)
            ):
                # serving over-fetch (candidate_k up to 500) exceeds the
                # fused kernel's unrolled extraction (and the int8
                # nomination bound); the per-shard ApproxTopK beats the
                # full sort the lax fallback pays — the same store-level
                # routing (incl. the TOPK_EXACT_LARGE_K=1 override inside
                # _use_approx_large_k) as EmbeddingStore.search
                route_impl = "approx"
            try:
                vals, idx = sharded_exact_search(
                    corpus,
                    queries,  # staged onto the mesh; kernels cast to store dtype
                    min(k, self.count),
                    self.mesh,
                    counts=self.counts,
                    metric=self.metric,
                    impl=route_impl,
                    mask=mask,
                )
            except Exception:  # noqa: BLE001 — fail-soft to the exact sort
                if route_impl != "approx":
                    raise
                # ApproxTopK availability varies by backend/stack; degrade
                # to the exact sort, not a 500 (same rule as the unsharded
                # store's _approx_large_k_broken latch)
                print("[WARN] sharded ApproxTopK unavailable; exact sort")
                self._approx_large_k_broken = True
                vals, idx = sharded_exact_search(
                    corpus,
                    queries,
                    min(k, self.count),
                    self.mesh,
                    counts=self.counts,
                    metric=self.metric,
                    impl="auto" if impl == "int8" else impl,
                    mask=mask,
                )
        return np.asarray(vals), self._rebase(np.asarray(idx, np.int64), capacity)

    def _rebase(self, raw: np.ndarray, capacity: int) -> np.ndarray:
        """Transient (capacity-relative) device indices → stable ids."""
        shard = raw // capacity
        local = raw % capacity
        return np.where(raw >= 0, shard * self._ID_STRIDE + local, -1)

    def grouped_search(
        self,
        queries: np.ndarray,
        k: int,
        mask_table: np.ndarray,  # [M, n_shards * capacity] corpus layout
        mask_ids: np.ndarray,    # [Q]
        *,
        impl: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched per-query filtered top-k over the mesh (distinct
        predicate per query, one sharded scan).  Inner-product/cosine.
        ``impl='int8'`` runs the int8 nomination + exact-rescore grouped
        kernel per shard (requires ``quantized=True``)."""
        if self.count == 0:
            q = np.atleast_2d(queries).shape[0]
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        corpus, capacity = self._sync()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = np.where(norms > 0, queries / np.maximum(norms, 1e-30), queries)
        if impl == "int8" and not self.quantized:
            raise ValueError(
                "impl='int8' requires ShardedEmbeddingStore(quantized=True)"
            )
        if impl == "int8" and min(k, self.count) <= quant_ops._INT8_MAX_K:
            vals, idx = sharded_grouped_int8_search(
                self._device_i8,
                self._scales,
                corpus,
                queries,
                np.asarray(mask_table, np.int8),
                np.asarray(mask_ids, np.int32),
                min(k, self.count),
                self.mesh,
                counts=self.counts,
            )
        else:
            route_impl = "auto" if impl == "int8" else impl
            if (
                impl in ("auto", "int8")
                and min(k, self.count) > topk_ops._PALLAS_MAX_K
                and topk_ops._use_approx_large_k(capacity)
                and not getattr(self, "_approx_large_k_broken", False)
            ):
                # grouped mirror of the search() ApproxTopK routing —
                # same gate, override, and fail-soft latch (int8 + large k
                # routes here too: the grouped int8 kernel's nomination
                # bound is k<=64)
                route_impl = "approx"
            try:
                vals, idx = sharded_grouped_search(
                    corpus,
                    queries,
                    np.asarray(mask_table, np.int8),
                    np.asarray(mask_ids, np.int32),
                    min(k, self.count),
                    self.mesh,
                    counts=self.counts,
                    impl=route_impl,
                )
            except Exception:  # noqa: BLE001 — fail-soft to the exact sort
                if route_impl != "approx":
                    raise
                print("[WARN] sharded grouped ApproxTopK unavailable; exact sort")
                self._approx_large_k_broken = True
                vals, idx = sharded_grouped_search(
                    corpus,
                    queries,
                    np.asarray(mask_table, np.int8),
                    np.asarray(mask_ids, np.int32),
                    min(k, self.count),
                    self.mesh,
                    counts=self.counts,
                    impl="auto" if impl == "int8" else impl,
                )
        return np.asarray(vals), self._rebase(np.asarray(idx, np.int64), capacity)

    def global_id_to_shard_local(self, global_id: int) -> Tuple[int, int]:
        return global_id // self._ID_STRIDE, global_id % self._ID_STRIDE

    def reconstruct(self, global_id: int) -> np.ndarray:
        shard_id, local = self.global_id_to_shard_local(int(global_id))
        return self._host_shards[shard_id][local].copy()

    # ------------------------------------------------------------------
    # Checkpoint / resume (SURVEY.md §5: the TPU-scale analogue of the
    # reference's FAISS-binary + sidecar persistence — one .npy per shard
    # plus a manifest, so multi-host deployments can write/read shards in
    # parallel and resume with per-shard granularity.)
    # ------------------------------------------------------------------
    def save(self, directory: str, *, format: str = "npy") -> None:
        import json
        import os

        os.makedirs(directory, exist_ok=True)
        if format == "orbax":
            self._save_orbax(directory)
        elif format == "npy":
            for shard_id, shard in enumerate(self._host_shards):
                with open(
                    os.path.join(directory, f"shard_{shard_id:04d}.npy"), "wb"
                ) as f:
                    np.save(f, shard)
        else:
            raise ValueError("format must be npy or orbax")
        manifest = {
            "format_version": 1,
            "format": format,
            "dimension": self.dimension,
            "metric": self.metric,
            "store_dtype": str(self.store_dtype),
            "shard_block": self.shard_block,
            "n_shards": self.n_shards,
            "counts": self.counts.tolist(),
        }
        with open(os.path.join(directory, "manifest.json"), "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)

    # Orbax/tensorstore path: writes the DEVICE-RESIDENT sharded array
    # directly (each host writes its own shards in a multi-host deployment,
    # no host gather) — the TPU-idiomatic checkpoint layer (SURVEY.md §5).
    # The .npy path stays the default: exact f32, no extra deps on read.
    def _orbax_dir(self, directory: str) -> str:
        import os

        return os.path.join(os.path.abspath(directory), "corpus_orbax")

    def _save_orbax(self, directory: str) -> None:
        import orbax.checkpoint as ocp

        corpus, _ = self._sync()
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as checkpointer:
            checkpointer.save(
                self._orbax_dir(directory),
                {"corpus": corpus},
                force=True,
            )

    def _load_orbax_shards(self, directory, saved_shards, counts):
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as checkpointer:
            restored = checkpointer.restore(self._orbax_dir(directory))
        corpus = np.asarray(restored["corpus"], np.float32)
        if saved_shards <= 0 or corpus.shape[0] % saved_shards:
            raise ValueError("orbax checkpoint shape inconsistent with manifest")
        capacity = corpus.shape[0] // saved_shards
        shards = []
        for shard_id in range(saved_shards):
            live = int(counts[shard_id]) if shard_id < len(counts) else capacity
            start = shard_id * capacity
            shards.append(
                np.ascontiguousarray(corpus[start : start + live], np.float32)
            )
        return shards

    def load(self, directory: str, *, allow_reshard: bool = False) -> bool:
        """Restore shards from a checkpoint directory.

        When the checkpoint's shard count differs from this mesh, rows are
        re-split round-robin — which REASSIGNS every stable id (ids encode
        shard*2^40+local).  Because callers persist those ids, a silent
        re-shard would reconstruct the wrong vectors, so it requires an
        explicit ``allow_reshard=True`` opt-in; otherwise a mismatch
        raises."""
        import json
        import os

        manifest_path = os.path.join(directory, "manifest.json")
        if not os.path.exists(manifest_path):
            return False
        with open(manifest_path, "r", encoding="utf-8") as f:
            manifest = json.load(f)
        if manifest.get("dimension") != self.dimension:
            raise ValueError("checkpoint dimension differs; rebuild the store")
        saved_shards = int(manifest.get("n_shards", 0))
        counts = manifest.get("counts") or []
        if manifest.get("format") == "orbax":
            shards = self._load_orbax_shards(directory, saved_shards, counts)
        else:
            shards = []
            for shard_id in range(saved_shards):
                path = os.path.join(directory, f"shard_{shard_id:04d}.npy")
                if not os.path.exists(path):
                    raise ValueError(f"checkpoint shard missing: {path}")
                with open(path, "rb") as f:
                    shards.append(np.load(f))
        for shard, count in zip(shards, counts):
            if shard.shape[0] != count:
                raise ValueError("checkpoint shard count mismatch; rebuild")
        if saved_shards == self.n_shards:
            self._host_shards = shards
        else:
            if not allow_reshard:
                raise ValueError(
                    f"checkpoint has {saved_shards} shards but mesh has "
                    f"{self.n_shards}; re-sharding reassigns every stable id "
                    "— pass allow_reshard=True only if no persisted ids "
                    "reference this store"
                )
            # re-shard: mesh size changed between save and load
            rows = np.concatenate([s for s in shards if s.size]) if shards else \
                np.zeros((0, self.dimension), np.float32)
            self._host_shards = [
                np.zeros((0, self.dimension), np.float32) for _ in range(self.n_shards)
            ]
            if rows.size:
                splits = np.array_split(rows, self.n_shards)
                self._host_shards = [np.ascontiguousarray(s, np.float32) for s in splits]
        self._dirty = True
        self._synced_counts = None  # host shards replaced: force full upload
        return True
