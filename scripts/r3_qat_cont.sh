#!/bin/bash
# Continue the QAT sweep open-ended (resumable; driver cut loses <=1 image).
cd /root/repo
STALL_S=780
while pgrep -f "sweep_quant50k" > /dev/null || pgrep -f "r3_chain2" > /dev/null; do
  sleep 20
done
while [ "$(wc -l < results/kodak_quant50k_cn_r3.jsonl)" -lt 24 ]; do
  python -u scripts/sweep_quant50k.py --color_norm --tile_cap 256 \
    --repr_ckpt_dir results/ckpt50k_cn --repr_state_dir results/repr_states_cn \
    --out results/kodak_quant50k_cn_r3.jsonl \
    --bitstream_dir results/bitstreams_r3 >> /tmp/r3_qat.log 2>&1 &
  pid=$!
  while kill -0 $pid 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y /tmp/r3_qat.log) ))
    if [ $age -gt $STALL_S ]; then
      echo "[watchdog] qat silent ${age}s — killing $pid" >> /tmp/r3_qat.log
      kill $pid; sleep 5; kill -9 $pid 2>/dev/null; sleep 10; break
    fi
  done
  wait $pid 2>/dev/null
done
echo "=== qat complete ===" >> /tmp/r3_qat.log
