#!/bin/bash
# Round-5 closing chain on shipping HEAD (post review-fix commit
# a8ca332 — pipeline code identical to the r5b rows' 9536639): more
# clean pairs for both protocols, continuing BENCH/BASELINE.md history
# numbering (store rows 13+, full rows 13+).
cd /root/repo
python tools/scaling_run.py --modes store --n 8 --n-base-store 48000 \
  --clean-pairs-target 2 --max-pairs 3 --start-pair 13 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5c_store_pairs.log 2>&1
echo STORE_DONE > /root/repo/BENCH/r5c_store_done
python tools/scaling_run.py --modes full --n 2 --n-base-full 48000 \
  --clean-pairs-target 2 --max-pairs 3 --start-pair 13 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5c_full_pairs.log 2>&1
echo FULL_DONE > /root/repo/BENCH/r5c_full_done
