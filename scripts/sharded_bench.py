#!/usr/bin/env python
"""Mesh overhead characterization: sharded vs unsharded search kernels.

Round-3 verdict weak item 3: the shard_map path (row-sharded exact scan +
all_gather merge, `parallel/sharded.py`; mesh-native IVF probe,
`parallel/sharded_ivf.py`) was proven correct but never characterized.
This measures, with the dependency-chained lax.scan differencing
methodology (bench.py — naive loop timings inflate >10x on this relay):

* unsharded exact top-k vs `sharded_exact_search` internals on an
  n-device mesh (n=1 on the real chip = the pure mesh/merge overhead;
  n=1,2,4,8 on the virtual CPU mesh = the scaling shape);
* unsharded `IVFIndex` probe kernel vs the `ShardedIVFIndex` program.

Run on the real chip:    python scripts/sharded_bench.py
Run on the 8-CPU mesh:   SB_PLATFORM=cpu SB_DEVICES=8 SB_MESHES=1,2,4,8 \
                           SB_ROWS=65536 SB_DIM=256 SB_IVF_ROWS=65536 \
                           python scripts/sharded_bench.py
Knobs: SB_ROWS (exact corpus), SB_IVF_ROWS, SB_DIM, SB_Q, SB_K, SB_ITERS,
SB_NLIST, SB_NPROBE, SB_MESHES (comma list), SB_SKIP_IVF=1.
Prints one human section + one machine JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _env_int(name: str, default: int) -> int:
    return int(os.getenv(name, default))


def main() -> int:
    # device-count flag must land before jax initializes
    n_virtual = os.getenv("SB_DEVICES")
    if n_virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n_virtual}"
        ).strip()

    import numpy as np
    import jax

    # JAX_PLATFORMS env is ignored on this machine (axon sitecustomize);
    # config.update after import is the working CPU override
    if os.getenv("SB_PLATFORM", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    if not os.getenv("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "data", "xla_cache"
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception as exc:  # pragma: no cover
            print(f"# cache disabled: {exc}")

    from photo_search_engine_tpu.ops.topk import (
        bucket_queries,
        exact_search,
        exact_search_oracle,
        l2_normalize,
    )
    from photo_search_engine_tpu.parallel.sharded import (
        _local_topk,
        _merge_partials,
        _stage,
        DATA_AXIS,
        make_mesh,
        ShardedEmbeddingStore,
    )
    from photo_search_engine_tpu.parallel.sharded_ivf import ShardedIVFIndex
    from photo_search_engine_tpu.models.ivf import IVFIndex
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    on_tpu = jax.default_backend() == "tpu"
    n_dev = len(jax.devices())
    rows = _env_int("SB_ROWS", 1_000_000 if on_tpu else 65_536)
    ivf_rows = _env_int("SB_IVF_ROWS", 262_144 if on_tpu else 65_536)
    dim = _env_int("SB_DIM", 1536 if on_tpu else 256)
    q = _env_int("SB_Q", 128)
    k = _env_int("SB_K", 10)
    iters = _env_int("SB_ITERS", 30 if on_tpu else 10)
    nlist = _env_int("SB_NLIST", 512 if on_tpu else 128)
    nprobe = _env_int("SB_NPROBE", 16)
    meshes = [int(m) for m in os.getenv("SB_MESHES", "1").split(",")]
    skip_ivf = os.getenv("SB_SKIP_IVF", "") in {"1", "true"}
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    assert q == bucket_queries(q), "SB_Q must be a power of two >= 8"
    print(
        f"backend: {jax.default_backend()} x{n_dev}  rows={rows} "
        f"ivf_rows={ivf_rows} dim={dim} q={q} k={k} iters={iters} "
        f"meshes={meshes} dtype={dtype.__name__}"
    )
    results = {"rows": rows, "dim": dim, "q": q, "k": k, "backend":
               jax.default_backend(), "meshes": {}}

    def timed(fn, *args):
        """Chained-scan differenced ms/batch; fn(args, n) -> scalar."""
        t0 = time.time()
        float(fn(*args, 2))
        float(fn(*args, iters + 2))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        float(fn(*args, 2))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(*args, iters + 2))
        t_long = time.perf_counter() - t0
        ms = max((t_long - t_short) / iters, 1e-9) * 1e3
        return ms, compile_s

    def finite_sum(vals):
        return jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0)).astype(
            jnp.float32
        )

    # ---- corpora (host once; staged per mesh) ----
    rng = np.random.default_rng(0)
    corpus_host = rng.normal(size=(rows, dim)).astype(np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=1, keepdims=True)
    qstack_host = rng.normal(size=(iters + 2, q, dim)).astype(np.float32)
    qstack_host /= np.linalg.norm(qstack_host, axis=2, keepdims=True)

    # ---- unsharded exact baseline ----
    impl = "pallas" if on_tpu else "lax"
    dev0 = jax.devices()[0]
    corpus_dev = jax.device_put(corpus_host.astype(dtype), dev0)
    qstack_dev = jax.device_put(qstack_host.astype(dtype), dev0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_unsharded(corpus, qstack, n):
        def body(carry, queries):
            queries = queries + carry.astype(queries.dtype) * 0
            if impl == "lax":
                vals, _ = exact_search_oracle(corpus, queries, k, metric="ip")
            else:
                vals, _ = exact_search(
                    corpus, queries, k, metric="ip", impl="pallas"
                )
            return finite_sum(vals), 0
        carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
        return carry

    ms0, cs = timed(chained_unsharded, corpus_dev, qstack_dev)
    print(f"unsharded exact ({impl}): {ms0:.2f} ms/batch "
          f"({q / ms0 * 1e3:.0f} QPS)  [compile {cs:.0f}s]")
    results["unsharded_exact_ms"] = round(ms0, 3)

    # ---- unsharded IVF baseline ----
    if not skip_ivf:
        ivf_host = corpus_host[:ivf_rows]
        ivf_index = IVFIndex.build_on_device(
            jax.device_put(ivf_host.astype(dtype), dev0), nlist=nlist
        )
        sfn = ivf_index.device_search_fn(k, nprobe, q)
        run_u, bound_u = sfn.func, sfn.args
        ivf_qstack = jax.device_put(qstack_host.astype(jnp.float32), dev0)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained_ivf_unsharded(bound, qstack, n):
            def body(carry, queries):
                queries = queries + carry.astype(queries.dtype) * 0
                vals, _ = run_u(*bound, queries)
                return finite_sum(vals), 0
            carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
            return carry

        ms_ivf0, cs = timed(chained_ivf_unsharded, bound_u, ivf_qstack)
        print(f"unsharded ivf (nlist={nlist} nprobe={nprobe}): "
              f"{ms_ivf0:.2f} ms/batch ({q / ms_ivf0 * 1e3:.0f} QPS)  "
              f"[compile {cs:.0f}s]")
        results["unsharded_ivf_ms"] = round(ms_ivf0, 3)

    # ---- sharded per mesh size ----
    for n_shards in meshes:
        if n_shards > n_dev:
            print(f"mesh {n_shards}: skipped (only {n_dev} devices)")
            continue
        mesh = make_mesh(n_shards)
        entry = {}

        # exact: the same _local_topk + _merge_partials the production
        # sharded_exact_search wraps (parallel/sharded.py), staged once,
        # inside a chained scan
        assert rows % n_shards == 0
        shard_rows = rows // n_shards
        counts = _stage(
            mesh, np.full((n_shards,), shard_rows, np.int32), P(), np.int32
        )
        corpus_m = _stage(mesh, corpus_host.astype(dtype), P(DATA_AXIS, None))
        qstack_m = _stage(mesh, qstack_host.astype(dtype), P())

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run_exact(corpus_shard, queries_rep, counts_rep):
            vals, idx = _local_topk(
                corpus_shard, queries_rep, counts_rep, k, "ip", impl,
                DATA_AXIS,
            )
            return _merge_partials(vals, idx, k, DATA_AXIS)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained_sharded(corpus, qstack, counts, n):
            def body(carry, queries):
                queries = queries + carry.astype(queries.dtype) * 0
                vals, _ = run_exact(corpus, queries, counts)
                return finite_sum(vals), 0
            carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
            return carry

        ms, cs = timed(chained_sharded, corpus_m, qstack_m, counts)
        entry["exact_ms"] = round(ms, 3)
        entry["exact_overhead_pct"] = round((ms / ms0 - 1.0) * 100, 1)
        entry["exact_speedup"] = round(ms0 / ms, 2)
        print(
            f"mesh {n_shards}: sharded exact {ms:.2f} ms/batch "
            f"({q / ms * 1e3:.0f} QPS, {entry['exact_overhead_pct']:+.1f}% "
            f"vs unsharded, speedup {entry['exact_speedup']}x)  "
            f"[compile {cs:.0f}s]"
        )

        # IVF: the ShardedIVFIndex program inside a chained scan
        if not skip_ivf:
            # "auto" → bf16 on TPU, matching both the unsharded baseline
            # corpus above and the serving stack's STORE_DTYPE=auto default;
            # the raw float32 default here cost +140.8% pure HBM traffic in
            # the first round-4 capture (docs/DESIGN.md §3 mesh-overhead note)
            store = ShardedEmbeddingStore(
                dim, mesh, metric="cosine", store_dtype="auto"
            )
            step = max(1, ivf_rows // 8)
            for i in range(0, ivf_rows, step):
                store.append(corpus_host[i : i + step])
            t0 = time.time()
            sivf = ShardedIVFIndex.build(store, nlist=nlist, train_iters=5)
            print(f"mesh {n_shards}: sharded ivf build {time.time()-t0:.0f}s")
            bq = min(128, bucket_queries(q))
            qp = -(-q // bq) * bq
            s_max = min(sivf.nlist, qp * nprobe)
            run_sivf = sivf._program(k, bq, qp, nprobe, s_max, has_mask=False)
            qs_pad = np.zeros((iters + 2, qp, sivf.dp), np.float32)
            qs_pad[:, :q, :dim] = qstack_host
            qstack_ivf = _stage(mesh, qs_pad, P(), np.float32)
            q_live = _stage(mesh, np.full((1, 1), q, np.int32), P(), np.int32)

            @functools.partial(jax.jit, static_argnames=("n",))
            def chained_sivf(layout, valid, cents, qstack, q_live, n):
                def body(carry, queries):
                    queries = queries + carry.astype(queries.dtype) * 0
                    vals, _ = run_sivf(layout, valid, cents, queries, q_live)
                    return finite_sum(vals), 0
                carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
                return carry

            ms_i, cs = timed(
                chained_sivf, sivf._layout, sivf._row_valid, sivf._cents_dev,
                qstack_ivf, q_live,
            )
            entry["ivf_ms"] = round(ms_i, 3)
            entry["ivf_overhead_pct"] = round(
                (ms_i / results["unsharded_ivf_ms"] - 1.0) * 100, 1
            )
            print(
                f"mesh {n_shards}: sharded ivf {ms_i:.2f} ms/batch "
                f"({q / ms_i * 1e3:.0f} QPS, {entry['ivf_overhead_pct']:+.1f}%"
                f" vs unsharded)  [compile {cs:.0f}s]"
            )
        results["meshes"][str(n_shards)] = entry

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
