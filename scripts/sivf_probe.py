#!/usr/bin/env python
"""Root-cause probe for the sharded-IVF degenerate-mesh overhead.

chip_session part B measured unsharded IVF 2.67 ms/batch vs sharded
6.42 ms/batch (+140.8%) on a 1-device mesh at 262k x 1536, nlist=512,
nprobe=16, q=128 (docs/CHIP_SESSION_r04.log).  Same kernel, same grid —
this isolates WHERE the extra time goes by timing, in ONE session:

  A. the unsharded IVFIndex.device_search_fn   (the 2.67 ms baseline)
  B. the ShardedIVFIndex._program on mesh(1)   (the 6.42 ms path)
  C. B's exact inner computation WITHOUT shard_map (same operands,
     same probe stage, same kernel call, no collective wrapper)

and printing the two layouts' block heights (capacity vs lrows), the
prime suspect since kernel time scales with them.

First capture (f32 store default, 2026-08-18): A 2.63 ms, B 5.78 ms,
C 6.57 ms, lrows_ratio 1.00, wrapper_cost -0.79 ms — i.e. shard_map is
FREE and the whole gap is the inner scan reading an f32 layout (2× the
HBM bytes) while the unsharded baseline corpus is bf16.  The store now
defaults to STORE_DTYPE=auto resolution here (bf16 on TPU), matching
both the baseline and the serving stack; SP_STORE_DTYPE=float32
reproduces the original artifact.

Run on the real chip: python scripts/sivf_probe.py
Knobs: SP_ROWS (262144), SP_DIM (1536), SP_NLIST (512), SP_NPROBE (16),
SP_Q (128), SP_ITERS (30), SP_STORE_DTYPE (auto).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    if not os.getenv("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "data",
            "xla_cache",
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from jax.sharding import Mesh, PartitionSpec as P
    from photo_search_engine_tpu.models.ivf import (
        IVFIndex, _ivf_pallas, bucket_queries,
    )
    from photo_search_engine_tpu.parallel.sharded import (
        DATA_AXIS, ShardedEmbeddingStore, _stage,
    )
    from photo_search_engine_tpu.parallel.sharded_ivf import ShardedIVFIndex

    rows = int(os.getenv("SP_ROWS", 262144))
    dim = int(os.getenv("SP_DIM", 1536))
    nlist = int(os.getenv("SP_NLIST", 512))
    nprobe = int(os.getenv("SP_NPROBE", 16))
    q = int(os.getenv("SP_Q", 128))
    iters = int(os.getenv("SP_ITERS", 30))
    dtype = jnp.bfloat16

    print(
        f"backend: {jax.default_backend()}  rows={rows} dim={dim} "
        f"nlist={nlist} nprobe={nprobe} q={q} iters={iters}", flush=True,
    )

    rng = np.random.default_rng(0)
    corpus_host = rng.standard_normal((rows, dim), dtype=np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=1, keepdims=True)
    qstack_host = rng.standard_normal((iters + 2, q, dim), dtype=np.float32)
    qstack_host /= np.linalg.norm(qstack_host, axis=2, keepdims=True)
    dev0 = jax.devices()[0]

    def finite_sum(v):
        return jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0))

    def timed(fn, *args):
        """bench.py chained-scan differencing (see docs/DESIGN.md §5).
        Both scan lengths MUST compile before the measured window — the
        n=iters+2 program is a distinct executable."""
        t0 = time.time()
        fn(*args, n=2).block_until_ready()
        fn(*args, n=iters + 2).block_until_ready()
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        fn(*args, n=2).block_until_ready()
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(*args, n=iters + 2).block_until_ready()
        tn = time.perf_counter() - t0
        return max((tn - t2) / iters, 1e-9) * 1e3, compile_s

    # ---- A. unsharded ---------------------------------------------------
    ivf_index = IVFIndex.build_on_device(
        jax.device_put(corpus_host.astype(dtype), dev0), nlist=nlist
    )
    print(f"unsharded capacity: {ivf_index.capacity}", flush=True)
    sfn = ivf_index.device_search_fn(10, nprobe, q)
    run_u, bound_u = sfn.func, sfn.args
    ivf_qstack = jax.device_put(qstack_host.astype(jnp.float32), dev0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_unsharded(bound, qstack, n):
        def body(carry, queries):
            queries = queries + carry.astype(queries.dtype) * 0
            vals, _ = run_u(*bound, queries)
            return finite_sum(vals), 0
        carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
        return carry

    ms_a, cs = timed(chained_unsharded, bound_u, ivf_qstack)
    print(f"A unsharded: {ms_a:.2f} ms/batch  [compile {cs:.0f}s]", flush=True)

    # ---- B. sharded program on mesh(1) ----------------------------------
    mesh = Mesh(np.asarray(jax.devices()[:1]), (DATA_AXIS,))
    store = ShardedEmbeddingStore(
        dim, mesh, metric="cosine",
        store_dtype=os.getenv("SP_STORE_DTYPE", "auto"),
    )
    step = max(1, rows // 8)
    for i in range(0, rows, step):
        store.append(corpus_host[i : i + step])
    t0 = time.time()
    sivf = ShardedIVFIndex.build(store, nlist=nlist, train_iters=5)
    print(
        f"sharded lrows: {sivf.lrows}  [build {time.time()-t0:.0f}s]",
        flush=True,
    )

    bq = min(128, bucket_queries(q))
    qp = -(-q // bq) * bq
    s_max = min(sivf.nlist, qp * nprobe)
    run_s = sivf._program(10, bq, qp, nprobe, s_max, has_mask=False)
    qs_pad = np.zeros((iters + 2, qp, sivf.dp), np.float32)
    qs_pad[:, :q, :dim] = qstack_host
    qstack_s = _stage(mesh, qs_pad, P(), np.float32)
    q_live = _stage(mesh, np.full((1, 1), q, np.int32), P(), np.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_sharded(layout, valid, cents, qstack, q_live, n):
        def body(carry, queries):
            queries = queries + carry.astype(queries.dtype) * 0
            vals, _ = run_s(layout, valid, cents, queries, q_live)
            return finite_sum(vals), 0
        carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
        return carry

    ms_b, cs = timed(
        chained_sharded, sivf._layout, sivf._row_valid, sivf._cents_dev,
        qstack_s, q_live,
    )
    print(f"B sharded(mesh 1): {ms_b:.2f} ms/batch  [compile {cs:.0f}s]",
          flush=True)

    # ---- C. B's inner computation, NO shard_map --------------------------
    # Identical operands and math to ShardedIVFIndex._program's `run`
    # (stage-1 probe in f32, probe-matrix one-hot, argsort union, q_live
    # row zeroing, the same _ivf_pallas call), executed as a plain jit on
    # the same staged arrays — the only thing removed is the shard_map /
    # all_gather wrapper.
    lrows, dp = sivf.lrows, sivf.dp
    k_local = min(10, nlist * lrows)

    def run_c(layout_shard, valid_shard, cents, queries_rep, q_live):
        qf = queries_rep.astype(jnp.float32)
        scores = jax.lax.dot_general(
            qf, cents, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cn = jnp.sum(jnp.square(cents), axis=1)[None, :]
        _, probe_ids = jax.lax.top_k(2.0 * scores - cn, nprobe)
        probe_matrix = jnp.zeros((qp, nlist), jnp.int32)
        probe_matrix = jax.vmap(lambda row, ids: row.at[ids].set(1))(
            probe_matrix, probe_ids
        )
        row_live = (
            jax.lax.broadcasted_iota(jnp.int32, (qp, 1), 0) < q_live[0, 0]
        ).astype(jnp.int32)
        probe_matrix = probe_matrix * row_live
        any_probe = jnp.sum(probe_matrix, axis=0)
        selected = jnp.argsort(-any_probe)[:s_max].astype(jnp.int32)
        sel_count = jnp.reshape(
            jnp.sum((any_probe > 0).astype(jnp.int32)), (1, 1)
        )
        valid_row = valid_shard[None, :]
        vals, slots = _ivf_pallas(
            layout_shard,
            queries_rep.astype(layout_shard.dtype),
            selected, sel_count, probe_matrix, valid_row,
            jnp.zeros((1, nlist * lrows), jnp.float32),
            jnp.ones((qp, 1), jnp.float32),
            jnp.ones((1, nlist * lrows), jnp.float32),
            k_local, bq, lrows, s_max,
            interpret=False, metric="ip", int8=False,
        )
        return vals[:, :k_local], slots[:, :k_local]

    layout_1dev = jax.device_put(np.asarray(sivf._layout), dev0)
    valid_1dev = jax.device_put(np.asarray(sivf._row_valid), dev0)
    cents_1dev = jax.device_put(np.asarray(sivf._cents_dev), dev0)
    qstack_c = jax.device_put(qs_pad, dev0)
    qlive_c = jax.device_put(np.full((1, 1), q, np.int32), dev0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_c(layout, valid, cents, qstack, q_live, n):
        def body(carry, queries):
            queries = queries + carry.astype(queries.dtype) * 0
            vals, _ = run_c(layout, valid, cents, queries, q_live)
            return finite_sum(vals), 0
        carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
        return carry

    ms_c, cs = timed(
        chained_c, layout_1dev, valid_1dev, cents_1dev, qstack_c, qlive_c,
    )
    print(f"C sharded-inner, no shard_map: {ms_c:.2f} ms/batch  "
          f"[compile {cs:.0f}s]", flush=True)

    print(
        f"verdict: lrows_ratio={sivf.lrows / ivf_index.capacity:.2f}  "
        f"wrapper_cost={ms_b - ms_c:.2f} ms  "
        f"inner_vs_unsharded={ms_c - ms_a:.2f} ms", flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
