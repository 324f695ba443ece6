#!/bin/bash
# RL refinement training launcher (rebuild of /root/reference/scripts/train.sh:
# batch-16 train, log tee'd)
mkdir -p log
python tools/trainval_rl.py --batch_size 16 "$@" 2>&1 | tee log/train_rl.log
