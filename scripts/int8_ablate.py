#!/usr/bin/env python
"""int8-kernel block-shape ablation at the north-star shape (1M x 1536).

The int8 scan's throughput historically varied 47-68k QPS between remote
compile sessions with identical code (README footnote 1).  This script
measures every (block_q, block_n) variant in ONE session with the
chained-scan methodology (bench.py:10-17), so variants are comparable and
the fast schedule — if block-shape-reachable — can be adopted as the
default rather than left to compiler scheduling luck.

Run on the real chip:  python scripts/int8_ablate.py
Env: ABLATE_ROWS / ABLATE_DIM / ABLATE_ITERS to rescale.
ABLATE_FEEDS=1 switches to the round-5 MXU-feed A/B (native int8 dot vs
dequantize-in-VMEM bf16 dot, each at its own VMEM-budgeted block) —
the restructure the round-4 verdict asked for after this script proved
block/grid knobs can't reach the 68k regime.
Prints one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from photo_search_engine_tpu.ops.quantized import int8_search, quantize_rows
    from photo_search_engine_tpu.ops.topk import l2_normalize

    rows = int(os.getenv("ABLATE_ROWS", 1_000_000))
    dim = int(os.getenv("ABLATE_DIM", 1536))
    iters = int(os.getenv("ABLATE_ITERS", 40))
    n_queries = 256
    k = 10

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # Optional compiler-param injection (one variant per PROCESS so each
    # gets a fresh compile): ABLATE_DS="parallel,arbitrary" sets grid
    # dimension_semantics; ABLATE_VMEM=<bytes> sets vmem_limit_bytes.
    ds = tuple(s for s in os.getenv("ABLATE_DS", "").split(",") if s)
    vmem = int(os.getenv("ABLATE_VMEM", "0")) or None
    if ds or vmem:
        from jax.experimental import pallas as pl_mod
        from jax.experimental.pallas import tpu as pltpu

        params = pltpu.CompilerParams(
            dimension_semantics=ds or None, vmem_limit_bytes=vmem
        )
        orig_call = pl_mod.pallas_call

        def patched(kernel, **kw):
            kw.setdefault("compiler_params", params)
            return orig_call(kernel, **kw)

        pl_mod.pallas_call = patched
        print(json.dumps({"injected": {"ds": ds, "vmem": vmem}}), flush=True)

    # capacity divisible by every block_n variant (and the lane width)
    if ds or vmem:
        variants = [{"block_q": 256, "block_n": 2048}]
    elif os.getenv("ABLATE_FEEDS", "") in {"1", "true", "yes"}:
        variants = [
            {"block_q": 256, "block_n": 2048, "feed": "int8"},
            {"block_q": 256, "block_n": 1024, "feed": "bf16"},
            {"block_q": 256, "block_n": 1024, "feed": "int8"},
            {"block_q": 128, "block_n": 1024, "feed": "bf16"},
            {"block_q": 256, "block_n": 2048, "feed": "bf16"},
        ]
    else:
        variants = [
            {"block_q": 256, "block_n": 2048},  # current default
            {"block_q": 256, "block_n": 1024},
            {"block_q": 256, "block_n": 1536},
            {"block_q": 128, "block_n": 2048},
            {"block_q": 128, "block_n": 1024},
        ]
    align = 2048 * 3  # lcm(2048, 1024, 1536)
    capacity = -(-rows // align) * align

    chunks = []
    for i in range(8):
        chunks.append(
            l2_normalize(
                jax.random.normal(jax.random.PRNGKey(i), (capacity // 8, dim), dtype)
            )
        )
    corpus = jnp.concatenate(chunks)
    del chunks
    corpus.block_until_ready()

    step = capacity // 8
    i8_parts, sc_parts = [], []
    for i in range(8):
        qc, sc = quantize_rows(corpus[i * step : (i + 1) * step])
        i8_parts.append(qc)
        sc_parts.append(sc)
    corpus_i8 = jnp.concatenate(i8_parts)
    scales = jnp.concatenate(sc_parts)
    del i8_parts, sc_parts
    corpus_i8.block_until_ready()

    qstack = l2_normalize(
        jax.random.normal(
            jax.random.PRNGKey(99), (iters + 2, n_queries, dim), jnp.float32
        )
    )

    @functools.partial(jax.jit, static_argnames=("n", "bq", "bn", "feed"))
    def chained(corpus_i8, scales, corpus, qstack, n, bq, bn, feed):
        def body(carry, queries):
            queries = queries + carry.astype(queries.dtype) * 0  # serialize
            vals, _ = int8_search(
                corpus_i8, scales, corpus, queries, k,
                count=rows, block_q=bq, block_n=bn, feed=feed,
            )
            return jnp.sum(vals).astype(jnp.float32), 0

        carry, _ = jax.lax.scan(body, jnp.float32(0), qstack[:n])
        return carry

    results = []
    for v in variants:
        bq, bn, feed = v["block_q"], v["block_n"], v.get("feed", "int8")
        float(chained(corpus_i8, scales, corpus, qstack, 2, bq, bn, feed))
        float(chained(corpus_i8, scales, corpus, qstack, iters + 2, bq, bn, feed))
        started = time.perf_counter()
        float(chained(corpus_i8, scales, corpus, qstack, 2, bq, bn, feed))
        t_short = time.perf_counter() - started
        started = time.perf_counter()
        float(chained(corpus_i8, scales, corpus, qstack, iters + 2, bq, bn, feed))
        t_long = time.perf_counter() - started
        per_batch = max((t_long - t_short) / iters, 1e-9)
        row = {
            "block_q": bq,
            "block_n": bn,
            "feed": feed,
            "ms_per_batch": round(per_batch * 1e3, 3),
            "qps": round(n_queries / per_batch, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    best = max(results, key=lambda r: r["qps"])
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
