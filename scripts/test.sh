#!/bin/bash
# RL refinement eval launcher (rebuild of /root/reference/scripts/test.sh:
# batch-8 eval of an epoch checkpoint)
mkdir -p log
EPOCH=${EPOCH:-4}
python tools/trainval_rl.py -e --batch_size 8 --resume "data/RL_model_dump/RL_tpu/rl_epoch_${EPOCH}" "$@" 2>&1 | tee log/test_rl.log
