#!/bin/bash
# Round-5 phase 1 (VERDICT r4 items 1, 4, 8): finish the fixed-codec QAT
# table to 24/24, re-run the VQ cell with the exact-pair snapshot, then
# decode-check the committed kodim20 bitstream. Resumable: done images skip.
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

QAT_ARGS=(--color_norm --tile_cap 256 --stream_order morton
          --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn
          --out results/kodak_quant50k_cn_r4.jsonl
          --bitstream_dir results/bitstreams_r4)

# 1) finish the 24-image table (kodim12-16,18,19,21,22,24 missing after r4)
while [ "$(wc -l < results/kodak_quant50k_cn_r4.jsonl 2>/dev/null || echo 0)" -lt 24 ]; do
  run_watched /tmp/r5_qat.log python -u scripts/sweep_quant50k.py \
    "${QAT_ARGS[@]}" ${DEADLINE:+--deadline_ts $DEADLINE} || break
  if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then break; fi
done
echo "=== QAT table rows: $(wc -l < results/kodak_quant50k_cn_r4.jsonl) ===" >> /tmp/r5_qat.log

# 2) VQ take-3: exact-pair snapshot now carries codebooks + renders the
#    stored pair (VERDICT r4 weak 4); fresh out file
run_watched /tmp/r5_vq.log python -u scripts/sweep_quant50k.py \
  --color_norm --color_quant vq --tile_cap 256 --stream_order morton \
  --images kodim01,kodim02 \
  --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
  --out results/kodak_quant_vq_r5.jsonl \
  --bitstream_dir results/bitstreams_vq_r5

# 3) kodim20 end-to-end decode confirmation on the committed artifact
run_watched /tmp/r5_decode20.log python -u scripts/decode.py \
  results/bitstreams_r4/kodim20.gipb \
  --gt /root/reference/datasets/kodak/kodim20.png --backend range

echo "=== r5 chain phase 1 done $(date -u +%FT%TZ) ===" >> /tmp/r5_qat.log
