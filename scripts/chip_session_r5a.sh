#!/bin/bash
# Round-5 chip evidence session, part A: the MXU-feed A/B that decides
# whether INT8_FEED=auto should stay on the native-int8 dot or move to
# the dequantize-in-VMEM bf16 dot (round-4 verdict item 1b; the
# restructure landed in 994cc24 with the decision deferred to this run).
#
# Part A runs BEFORE part B so the winning feed can be committed as the
# auto default and part B's headline/bench/load numbers capture the
# final HEAD.  Same rules as scripts/chip_session_r4.sh: sequential,
# timeout-bounded, abort on first failure, never concurrent with any
# other TPU-touching process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part A start, HEAD $HEAD_SHA ==="

# 1. MXU-feed A/B at the north-star shape (1M x 1536, 5 variants in one
#    session so schedules are comparable)
run_step feed_ab 5400 env ABLATE_FEEDS=1 python scripts/int8_ablate.py

echo "done" > "$STATE"
note "=== chip session r5 part A COMPLETE at HEAD $HEAD_SHA ==="
