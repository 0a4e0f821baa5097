#!/bin/bash
# Round-5 phase 2: probe the wedged relay until it answers, then run the
# remaining round-5 pipeline in priority order:
#   1. finish the QAT table (resumable; kodim18,19,21,22,24 missing)
#   2. r5_perf decode+train A/B (the chunk-list kernels' first hardware run)
#   3. VQ take-3 (kodim01/02, exact-pair snapshot)
#   4. kodim20 committed-artifact decode confirmation
#   5. bench.py (writes results/bench_latest.json)
# Each stage is watchdogged; a wedge mid-stage kills + retries (2 tries),
# then moves on. The probe loop never leaves a client attached: the probe
# python exits after one tiny matmul.
cd /root/repo
STALL_S=780
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
  done
  return 1
}

wait_for_relay || exit 1

QAT_ARGS=(--color_norm --tile_cap 256 --stream_order morton
          --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn
          --out results/kodak_quant50k_cn_r4.jsonl
          --bitstream_dir results/bitstreams_r4)

# 1) finish the 24-image table
while [ "$(wc -l < results/kodak_quant50k_cn_r4.jsonl 2>/dev/null || echo 0)" -lt 24 ]; do
  run_watched /tmp/r5_qat.log python -u scripts/sweep_quant50k.py \
    "${QAT_ARGS[@]}" ${DEADLINE:+--deadline_ts $DEADLINE} || break
  if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then break; fi
done
echo "=== QAT table rows: $(wc -l < results/kodak_quant50k_cn_r4.jsonl) ===" >> /tmp/r5_qat.log

# 2) chunk-list kernels' first hardware measurements
wait_for_relay
run_watched /tmp/r5_perf.log python -u scripts/r5_perf.py --with_2k \
  && cp /tmp/r5_perf.log results/r5_perf.jsonl 2>/dev/null

# 3) VQ take-3
wait_for_relay
run_watched /tmp/r5_vq.log python -u scripts/sweep_quant50k.py \
  --color_norm --color_quant vq --tile_cap 256 --stream_order morton \
  --images kodim01,kodim02 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant_vq_r5.jsonl \
  --bitstream_dir results/bitstreams_vq_r5

# 4) kodim20 end-to-end decode confirmation on the committed artifact
wait_for_relay
run_watched /tmp/r5_decode20.log python -u scripts/decode.py \
  results/bitstreams_r4/kodim20.gipb \
  --gt /root/reference/datasets/kodak/kodim20.png --backend range

# 5) fresh bench snapshot (also the /verify launch recipe)
wait_for_relay
run_watched /tmp/r5_bench.log python -u bench.py

echo "=== r5 chain phase 2 done $(date -u +%FT%TZ) ===" >> /tmp/r5_qat.log
