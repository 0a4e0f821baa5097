#!/bin/bash
# Round-5 phase 3: VQ take-3 -> bench -> 2K list-kernel diagnosis.
# Longer stall tolerance than phase 2 (first compiles through the relay ran
# 13+ min silent and were NOT wedged — killing them mid-compile wastes a
# window); probe loop between stages.
cd /root/repo
STALL_S=1500
DEADLINE=${1:-}

probe () {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()))
" >/dev/null 2>&1
}

wait_for_relay () {
  local n=0
  until probe; do
    n=$((n+1))
    echo "[probe] relay down (attempt $n, $(date -u +%H:%M:%S))" >> /tmp/r5_probe.log
    if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then return 1; fi
    sleep 240
  done
  echo "[probe] relay UP ($(date -u +%H:%M:%S))" >> /tmp/r5_probe.log
  return 0
}

run_watched () {  # $1 log file, $2... command
  local log=$1; shift
  local tries=0
  while [ $tries -lt 2 ]; do
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
        wait_for_relay || return 1
        break
      fi
    done
    wait $pid 2>/dev/null
    local rc=$?
    if [ $rc -eq 0 ]; then return 0; fi
    echo "[watchdog] stage rc=$rc (try $tries)" >> "$log"
    if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then return 1; fi
  done
  return 1
}

wait_for_relay || exit 1
run_watched /tmp/r5_vq2.log python -u scripts/sweep_quant50k.py \
  --color_norm --color_quant vq --tile_cap 256 --stream_order morton \
  --images kodim01,kodim02 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant_vq_r5.jsonl \
  --bitstream_dir results/bitstreams_vq_r5

wait_for_relay
run_watched /tmp/r5_bench.log python -u bench.py

wait_for_relay
run_watched /tmp/r5_2kdiag.log python -u scripts/r5_2k_diag.py

echo "=== r5 chain phase 3 done $(date -u +%FT%TZ) ===" >> /tmp/r5_vq2.log
