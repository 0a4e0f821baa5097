#!/bin/bash
# Round-4 phase 2: QAT re-sweep with the prune-ordering fix (worst-drop
# images first so a partial run still covers the diagnosis targets), Morton
# stream layout, then bench. Run AFTER r4_chain.sh exits.
cd /root/repo
STALL_S=780
DEADLINE=${1:-}

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

echo "=== r4_perf A/B ===" >> /tmp/r4_stage2.log
run_watched /tmp/r4_stage2.log python -u scripts/r4_perf.py --with_2k

# VQ cell re-run with the codebook best-carry fix (fresh out file)
run_watched /tmp/r4_vq2.log python -u scripts/sweep_quant50k.py \
  --color_norm --color_quant vq --tile_cap 256 --stream_order morton \
  --images kodim01,kodim02 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant_vq_r4fix.jsonl \
  --bitstream_dir results/bitstreams_vq_r4fix

QAT_ARGS=(--color_norm --tile_cap 256 --stream_order morton
          --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn
          --out results/kodak_quant50k_cn_r4.jsonl
          --bitstream_dir results/bitstreams_r4)

# worst round-3 drops first (the diagnosis targets)
run_watched /tmp/r4_qat.log python -u scripts/sweep_quant50k.py \
  "${QAT_ARGS[@]}" --images kodim20,kodim17,kodim03,kodim23,kodim02

# then everything (done images skip)
while [ "$(wc -l < results/kodak_quant50k_cn_r4.jsonl 2>/dev/null || echo 0)" -lt 24 ]; do
  run_watched /tmp/r4_qat.log python -u scripts/sweep_quant50k.py \
    "${QAT_ARGS[@]}" ${DEADLINE:+--deadline_ts $DEADLINE} || break
  if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then break; fi
done

# no bench stage: the round driver runs bench.py itself at round end;
# every minute here goes to the QAT re-sweep instead
echo "=== r4 chain2 done ===" >> /tmp/r4_stage2.log
