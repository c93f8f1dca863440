#!/bin/bash
# Round-5 final-code pairs on shipping HEAD (G1 reverted, batched
# kernels): 2 clean store 8->32 pairs, then 2 clean full 2->8 pairs.
# Continues BENCH/BASELINE.md history numbering.
cd /root/repo
python tools/scaling_run.py --modes store --n 8 --n-base-store 48000 \
  --clean-pairs-target 2 --max-pairs 3 --start-pair 10 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5b_store_pairs.log 2>&1
echo STORE_DONE > /root/repo/BENCH/r5b_store_done
python tools/scaling_run.py --modes full --n 2 --n-base-full 48000 \
  --clean-pairs-target 2 --max-pairs 3 --start-pair 10 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5b_full_pairs.log 2>&1
echo FULL_DONE > /root/repo/BENCH/r5b_full_done
