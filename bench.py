"""Headline benchmark: exact-search throughput at the BASELINE.md north-star
scale (1M × 1536-d vectors, top-10, batch 128) on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

``vs_baseline`` is against the north-star target of 10k QPS on a v5e-8
(BASELINE.md targets table) — i.e. value / 10000.  The reference itself
publishes no search-throughput numbers (SURVEY.md §6).

Methodology: N dependency-chained search iterations inside ONE jitted
``lax.scan`` whose final scalar depends on every iteration, timed at two
N values and differenced.  This cancels dispatch/fetch latency and
defeats async-dispatch pipelining artifacts (on some remote-attached
device runtimes, ``block_until_ready`` on queued results returns early,
inflating naive loop timings by >10x — measured on this machine).

Scale knobs via env: BENCH_ROWS, BENCH_DIM, BENCH_Q, BENCH_K, BENCH_ITERS.
Variant via BENCH_IMPL (or the BENCH_FAST=1 / BENCH_INT8=1 aliases):
  exact — bit-exact two-phase kernel (27.7k QPS at the north-star shape)
  fast  — packed-key selection, the off-TPU default (33k QPS; final
          scores exact-rescored, index agreement 99.96% — flips only
          inside 2^-13-relative tie windows, i.e. equal-value ties)
  int8  — int8-scan + exact-rescore (ops/quantized.py; 47-68k QPS by
          compile session; exact on realistic-gap data, recall@10 =
          0.996 on iid noise — the adversarial distribution).  The TPU
          DEFAULT, matching STORE_QUANTIZED=auto serving.
  ivf   — coarse-quantized small-batch path (models/ivf.py; defaults
          batch 8, BENCH_IVF_NPROBE=16, BENCH_IVF_NLIST=1024; 0.41 ms
          at the north-star corpus)
"""

from __future__ import annotations

import functools
import json
import os


def main() -> None:
    import threading
    import time

    import jax
    import jax.numpy as jnp

    # Backend-acquisition watchdog: when the TPU relay is wedged,
    # jax.devices() HANGS inside a C call (>240 s measured) rather than
    # erroring — a SIGALRM handler never fires because the main thread
    # never returns to the interpreter, and the driver's round-end bench
    # run would hang forever.  Probe the backend on a daemon thread and
    # hard-exit with a parseable JSON line if it doesn't come up in time.
    # Only backend acquisition is bounded — compiles after it may
    # legitimately take many minutes.
    backend_up = threading.Event()

    def _probe():
        jax.devices()  # the call that hangs on a wedged relay
        backend_up.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not backend_up.wait(int(os.getenv("BENCH_BACKEND_TIMEOUT_S", 600))):
        print(
            json.dumps(
                {
                    "metric": "backend_unavailable",
                    "value": 0,
                    "unit": "qps",
                    "vs_baseline": 0,
                    "error": "jax backend acquisition timed out (relay down?)",
                }
            ),
            flush=True,  # os._exit skips stdio flush; keep the line when piped
        )
        os._exit(1)

    # Persistent compile cache (BENCH_CACHE=0 disables): pins the compiled
    # schedule across bench sessions — the int8 kernel's 47-68k QPS
    # compile-session variance freezes to ±0.2% (docs/ABLATION_INT8.md).
    # The native JAX_COMPILATION_CACHE_DIR env var wins if set.
    if os.getenv("BENCH_CACHE", "1") not in {"0", "false", "no"} and not os.getenv(
        "JAX_COMPILATION_CACHE_DIR"
    ):
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "data", "xla_cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception as exc:
            print(f"# bench cache disabled: {exc}")

    from photo_search_engine_tpu.ops.topk import _pallas_twophase_impl, l2_normalize

    rows = int(os.getenv("BENCH_ROWS", 1_000_000))
    dim = int(os.getenv("BENCH_DIM", 1536))
    n_queries = int(os.getenv("BENCH_Q", 256))
    k = int(os.getenv("BENCH_K", 10))
    iters = int(os.getenv("BENCH_ITERS", 40))
    on_tpu = jax.default_backend() == "tpu"
    variant = os.getenv("BENCH_IMPL", "").strip().lower()
    if not variant:
        if os.getenv("BENCH_INT8", "") in {"1", "true", "yes"}:
            variant = "int8"
        elif os.getenv("BENCH_FAST", "") in {"1", "true", "yes"}:
            variant = "fast"
        elif os.getenv("BENCH_EXACT", "") in {"1", "true", "yes"}:
            variant = "exact"
        else:
            # follow the serving default (STORE_QUANTIZED=auto): the int8
            # scan + exact rescore tier on TPU, bf16 packed-key elsewhere
            variant = "int8" if on_tpu else "fast"
    fast = variant == "fast"
    int8 = variant == "int8"
    ivf = variant == "ivf"
    if ivf and "BENCH_Q" not in os.environ:
        n_queries = 8  # IVF is the small-batch/low-latency path
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    block_n = 1024 if dtype == jnp.bfloat16 else 512
    block_q = min(256, max(8, -(-n_queries // 8) * 8))
    # the exact/fast variants call _pallas_twophase_impl directly, which
    # expects a query count divisible by block_q (its grid uses floor
    # division — a ragged BENCH_Q would silently drop queries and inflate
    # QPS).  Pad up; padded rows do real work, so they count in the rate.
    if n_queries % block_q:
        n_queries = -(-n_queries // block_q) * block_q
        print(f"# BENCH_Q padded to {n_queries} (block_q {block_q})")
    if dim % 128 and variant in ("exact", "fast", ""):
        raise SystemExit(
            f"BENCH_DIM={dim} must be a multiple of 128 for the exact/fast "
            "variants (they call the kernel impl directly, no pad wrapper)"
        )
    # int8 shadow blocks are 2048 rows; align capacity to both so neither
    # path re-pads (a re-pad copies the whole corpus inside the scan)
    align = 2048 if int8 else block_n
    capacity = -(-rows // align) * align

    # Assemble the corpus IN PLACE: generate bounded chunks and write each
    # into a pre-allocated buffer via a DONATED dynamic_update_slice.  The
    # old jnp.concatenate held every chunk plus the result simultaneously —
    # 2x the corpus, which is 24.6 GB at 4M x 1536 bf16 and OOM'd the
    # round-5 capacity bench (docs/CHIP_SESSION_r05.log bench_4m).  With
    # donation the transient is one chunk + its normalize temps (<1.5 GB).
    # Chunk index and row offset are traced, so each distinct chunk shape
    # compiles once, not once per chunk.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _fill(buf, chunk, row):
        return jax.lax.dynamic_update_slice(buf, chunk, (row, jnp.int32(0)))

    def _sync(arr):
        # true barrier: a D2H fetch of one element cannot complete until
        # the producing computation ran (block_until_ready returns early
        # on this relay — see module docstring).  Without it the dispatch
        # queue runs ahead and keeps many chunk temps live at once.
        float(arr[0, 0].astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("m",))
    def _gen_chunk(i, m):
        return l2_normalize(jax.random.normal(jax.random.PRNGKey(i), (m, dim), dtype))

    chunk_rows = min(capacity, 131072)
    corpus = jnp.zeros((capacity, dim), dtype)
    row = 0
    i = 0
    while row < capacity:
        m = min(chunk_rows, capacity - row)
        corpus = _fill(corpus, _gen_chunk(jnp.int32(i), m), jnp.int32(row))
        _sync(corpus)
        row += m
        i += 1

    count = jnp.full((1, 1), rows, jnp.int32)
    cnorms = jnp.zeros((1, capacity), jnp.float32)
    mask = jnp.ones((1, capacity), jnp.int32)
    q_dtype = jnp.float32 if int8 else dtype
    qstack = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(99), (iters + 2, n_queries, dim), q_dtype)
    )

    if int8:
        from photo_search_engine_tpu.ops.quantized import int8_search, quantize_rows

        # quantize chunk-by-chunk into a pre-allocated donated buffer:
        # whole-corpus quantization materializes f32 temps the size of the
        # corpus and OOMs a 16GB chip at 1M; near the bf16+int8 capacity
        # ceiling (~3.35M rows, docs/OPERATIONS.md) even an 1/8-corpus
        # chunk + concat double-buffer does not fit, so chunks are 64k
        # rows and the shadow is assembled in place like the corpus above
        @functools.partial(jax.jit, static_argnames=("m",))
        def _quant_chunk(corpus, row, m):
            return quantize_rows(
                jax.lax.dynamic_slice(corpus, (row, jnp.int32(0)), (m, dim))
            )

        corpus_i8 = jnp.zeros((capacity, dim), jnp.int8)
        sc_parts = []
        row = 0
        while row < capacity:
            m = min(65536, capacity - row)
            qc, sc = _quant_chunk(corpus, jnp.int32(row), m)
            corpus_i8 = _fill(corpus_i8, qc, jnp.int32(row))
            sc_parts.append(sc)
            _sync(corpus_i8)
            row += m
        scales = jnp.concatenate(sc_parts)
        del sc_parts

        # corpus_i8/scales MUST be explicit args: closing over multi-GB
        # device arrays embeds them as jaxpr constants, and XLA's constant
        # folding of even a no-op pad over them stalls compilation for tens
        # of minutes
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained_int8(corpus_i8, scales, corpus, qstack, n):
            def body(carry, queries):
                queries = queries + carry.astype(queries.dtype) * 0  # serialize
                vals, idx = int8_search(
                    corpus_i8, scales, corpus, queries, k,
                    count=rows, block_q=block_q,
                )
                return jnp.sum(vals).astype(jnp.float32), 0
            carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
            return carry

        chained = functools.partial(chained_int8, corpus_i8, scales)
    elif ivf:
        from photo_search_engine_tpu.models.ivf import IVFIndex

        nprobe = int(os.getenv("BENCH_IVF_NPROBE", 16))
        ivf_quant = os.getenv("BENCH_IVF_QUANTIZED", "") in {"1", "true", "yes"}
        index = IVFIndex.build_on_device(
            corpus, nlist=int(os.getenv("BENCH_IVF_NLIST", 1024)),
            quantized=ivf_quant,
        )
        search_fn = index.device_search_fn(k, nprobe, n_queries)
        # unpack the bound device arrays into explicit jit args (the
        # closed-over-constant trap again — see the int8 branch)
        run, bound = search_fn.func, search_fn.args

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained_ivf(bound, qstack, n):
            def body(carry, queries):
                queries = queries + carry.astype(queries.dtype) * 0  # serialize
                vals, idx = run(*bound, queries)
                return jnp.sum(vals).astype(jnp.float32), 0
            carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
            return carry

        def chained(corpus_unused, qstack, n):
            return chained_ivf(bound, qstack, n)
    else:
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(corpus, qstack, n):
            def body(carry, queries):
                queries = queries + carry.astype(queries.dtype) * 0  # serialize
                vals, idx = _pallas_twophase_impl(
                    corpus, queries, count, cnorms, mask,
                    k, "ip", block_q, block_n, not on_tpu, False, fast=fast,
                )
                return jnp.sum(vals[:, :k]).astype(jnp.float32), 0
            carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
            return carry

    # warm both shapes (compile)
    float(chained(corpus, qstack, 2))
    float(chained(corpus, qstack, iters + 2))

    started = time.perf_counter()
    float(chained(corpus, qstack, 2))
    t_short = time.perf_counter() - started
    started = time.perf_counter()
    float(chained(corpus, qstack, iters + 2))
    t_long = time.perf_counter() - started
    per_batch = max((t_long - t_short) / iters, 1e-9)
    qps = n_queries / per_batch

    print(
        json.dumps(
            {
                "metric": (
                    f"{'ivf_int8' if ivf and os.getenv('BENCH_IVF_QUANTIZED') else 'ivf' if ivf else 'int8_rescore' if int8 else 'packedkey' if fast else 'exact'}"
                    f"_search_qps_{rows//1000}k_x_{dim}d_top{k}_batch{n_queries}"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 10_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
