#!/bin/bash
# Round-5 follow-up: additional store 8->32 pinned pairs (continues pair
# numbering from the 2026-08-19 session; see BENCH/BASELINE.md history).
cd /root/repo
python tools/scaling_run.py --modes store --n 8 --n-base-store 48000 \
  --clean-pairs-target 2 --max-pairs 4 --start-pair 5 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5_store_pairs2.log 2>&1
echo CHAIN2_DONE > /root/repo/BENCH/r5_chain2_done
