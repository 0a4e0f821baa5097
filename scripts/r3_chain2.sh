#!/bin/bash
# Round-3 TPU supervisor v2: stall-aware. A stage whose log goes silent for
# STALL_S seconds is killed (exact pid) and retried; the repr sweep resumes
# from its per-image checkpoints so a retry loses <= one checkpoint interval.
cd /root/repo
QAT_DEADLINE=$1
STALL_S=780

run_watched () {  # $1 log file, $2... command
  local log=$1; shift
  local tries=0
  while [ $tries -lt 3 ]; do
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

# wait for any existing sweep python to exit (the one the old chain spawned)
while pgrep -f "sweep_kodak50k" > /dev/null; do
  # watchdog the orphan too
  age=$(( $(date +%s) - $(stat -c %Y /tmp/r3_chain.log) ))
  if [ $age -gt $STALL_S ]; then
    p=$(pgrep -f "sweep_kodak50k" | head -1)
    echo "[watchdog] orphan sweep silent ${age}s — killing $p" >> /tmp/r3_chain.log
    kill "$p"; sleep 5; kill -9 "$p" 2>/dev/null
  fi
  sleep 30
done

# repr sweep until all 24 images are in the JSONL
while [ "$(wc -l < results/kodak50k_cn_r3.jsonl)" -lt 24 ]; do
  run_watched /tmp/r3_sweep2.log python -u scripts/sweep_kodak50k.py \
    --color_norm --out results/kodak50k_cn_r3.jsonl \
    --ckpt_dir results/ckpt50k_cn --state_dir results/repr_states_cn \
    --tile_cap 256 || break
done

echo "=== bench ===" >> /tmp/r3_stage.log
run_watched /tmp/r3_stage.log timeout 1900 python -u bench.py
echo "=== 2K fit ===" >> /tmp/r3_stage.log
run_watched /tmp/r3_stage.log timeout 3600 python -u scripts/fit_2k.py
echo "=== QAT sweep ===" >> /tmp/r3_stage.log
run_watched /tmp/r3_qat.log python -u scripts/sweep_quant50k.py \
  --color_norm --tile_cap 256 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant50k_cn_r3.jsonl \
  --bitstream_dir results/bitstreams_r3 --deadline_ts "$QAT_DEADLINE"
echo "=== chain2 done ===" >> /tmp/r3_stage.log
