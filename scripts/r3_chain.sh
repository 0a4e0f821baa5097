#!/bin/bash
# Round-3 TPU chain: runs after the repr sweep exits; keeps the chip busy.
cd /root/repo
REPR_PID=$1
QAT_DEADLINE=$2   # unix ts: don't START a new QAT image after this
while kill -0 "$REPR_PID" 2>/dev/null; do sleep 30; done
echo "=== repr sweep exited; completing stragglers ===" 
python -u scripts/sweep_kodak50k.py --color_norm \
  --out results/kodak50k_cn_r3.jsonl --ckpt_dir results/ckpt50k_cn \
  --state_dir results/repr_states_cn --tile_cap 256
echo "=== bench (new marginal protocol) ==="
timeout 1900 python -u bench.py
echo "=== 2K end-to-end fit ==="
timeout 3600 python -u scripts/fit_2k.py
echo "=== QAT sweep (color_norm, cap 256) ==="
python -u scripts/sweep_quant50k.py --color_norm --tile_cap 256 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant50k_cn_r3.jsonl \
  --bitstream_dir results/bitstreams_r3 \
  --deadline_ts "$QAT_DEADLINE"
echo "=== chain done ==="
