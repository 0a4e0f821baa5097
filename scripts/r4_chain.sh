#!/bin/bash
# Round-4 TPU supervisor: stall-aware chain over the round's hardware runs.
#   1. reference-exact PLAIN repr sweep (no color_norm, cap 256) x24
#   2. 2K mosaic fit at the full 50k reference schedule
#   3. VQ color-codec QAT cell (kodim01, kodim02)
# A stage whose log goes silent for STALL_S seconds is killed (EXACT pid,
# never a pattern) and retried; both sweeps resume from their JSONL/ckpts so
# a retry loses <= one image / one checkpoint interval.
cd /root/repo
STALL_S=780

run_watched () {  # $1 log file, $2... command
  local log=$1; shift
  local tries=0
  while [ $tries -lt 4 ]; do
    tries=$((tries+1))
    "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      if [ $age -gt $STALL_S ]; then
        echo "[watchdog] $log silent ${age}s — killing $pid" >> "$log"
        kill $pid; sleep 5; kill -9 $pid 2>/dev/null
        sleep 10
        break
      fi
    done
    wait $pid 2>/dev/null
    local rc=$?
    if [ $rc -eq 0 ]; then return 0; fi
    echo "[watchdog] stage rc=$rc (try $tries)" >> "$log"
  done
  return 1
}

# stage 1: plain repr sweep until all 24 images are in the JSONL
while [ "$(wc -l < results/kodak50k_plain_r4.jsonl 2>/dev/null || echo 0)" -lt 24 ]; do
  run_watched /tmp/r4_sweep.log python -u scripts/sweep_kodak50k.py \
    --out results/kodak50k_plain_r4.jsonl \
    --ckpt_dir results/ckpt50k_plain --state_dir results/repr_states_plain \
    --tile_cap 256 || break
done

echo "=== 2K 50k fit ===" >> /tmp/r4_stage.log
run_watched /tmp/r4_stage.log python -u scripts/fit_2k.py \
  --iterations 50000 --ckpt_dir results/ckpt2k_50k \
  --out results/fit2k_50k_r4.json

echo "=== VQ color codec cell ===" >> /tmp/r4_stage.log
run_watched /tmp/r4_vq.log python -u scripts/sweep_quant50k.py \
  --color_norm --color_quant vq --tile_cap 256 \
  --images kodim01,kodim02 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant_vq_r4.jsonl \
  --bitstream_dir results/bitstreams_vq_r4

echo "=== r4 chain done ===" >> /tmp/r4_stage.log
