#!/bin/bash
# Round-5 follow-up: one more final-code full-pipeline 2->8 pinned pair
# (pair 10; continues the BENCH/BASELINE.md history numbering).
cd /root/repo
python tools/scaling_run.py --modes full --n 2 --n-base-full 48000 \
  --clean-pairs-target 1 --max-pairs 2 --start-pair 10 --quiet-wait-s 900 \
  > /root/repo/BENCH/r5_full_pair10.log 2>&1
echo FULL_CHAIN_DONE > /root/repo/BENCH/r5_full_chain_done
