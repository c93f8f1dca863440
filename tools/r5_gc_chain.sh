#!/bin/bash
# Round-5 continuation: re-measure BOTH protocol pairs on the shipping
# ParallelGC code (commit 70193a9) — every pair in the history tables
# predates the GC switch, so the tables currently understate HEAD.
# [SUPERSEDED: the ParallelGC switch was overturned by the interleaved
# A/B probe and reverted (ATTRIBUTION.md Fix 7); HEAD pairs are now
# recorded by tools/r5b_head_chain.sh on the G1 default.]
# Store first (cheap legs, doubles as a smoke test of bench.py at HEAD),
# then the expensive full-pipeline 2->8 pairs. Pair numbering continues
# each mode's history (store pairs 5-6, full pair 10 recorded earlier).
cd /root/repo
python tools/scaling_run.py --modes store --n 8 --n-base-store 48000 \
  --clean-pairs-target 2 --max-pairs 4 --start-pair 7 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5_gc_store_pairs.log 2>&1
python tools/scaling_run.py --modes full --n 2 --n-base-full 48000 \
  --clean-pairs-target 2 --max-pairs 3 --start-pair 11 --quiet-wait-s 900 \
  --budget-s 14400 \
  > /root/repo/BENCH/r5_gc_full_pairs.log 2>&1
echo GC_CHAIN_DONE > /root/repo/BENCH/r5_gc_chain_done
