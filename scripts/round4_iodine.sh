#!/bin/bash
# IODINE full-size pretraining on the real dataset (first ever beyond unit
# tests) — starts once the bcdec budget run finishes (TPU-bound slot), runs
# until the deadline or 250k steps, with crash auto-restarts.
cd /root/repo || exit 1
FAM=outputs/train_ocr/Iodine-RandomN5C4S4S2
DEADLINE=$(date -d '2026-08-21 06:10' +%s)

while [ ! -f /tmp/bcdec_done ]; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "[iodine] never started"; exit 0; fi
  sleep 60
done

newest_run() {
  ls -td $FAM/*/ 2>/dev/null | while read d; do
    [ -f "$d/checkpoints/model_latest.ckpt" ] && { echo "${d%/}"; break; }
  done
}

steps_done() {
  python - "$(newest_run)" <<'PYEOF'
import json, struct, sys
try:
    with open(sys.argv[1] + "/checkpoints/model_latest.ckpt", "rb") as f:
        f.read(8)
        (n,) = struct.unpack("<Q", f.read(8))
        print(int(json.loads(f.read(n).decode()).get("step", 0)))
except (FileNotFoundError, IndexError):
    print(0)
PYEOF
}

while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "[iodine] deadline"; break; fi
  if [ "$(steps_done)" -ge 249900 ]; then echo "[iodine] budget reached"; break; fi
  NR=$(newest_run)
  RES=""
  [ -n "$NR" ] && RES="load.resume_run_path=$NR"
  echo "[iodine] (re)starting (resume: ${NR:-none})"
  nohup python train_ocr.py ocr=iodine_large dataset=random-N5C4S4S2 \
    +max_steps=250000 $RES >> /tmp/iodine_r4.log 2>&1 &
  echo $! > /tmp/iodine.pid
  sleep 30
  while kill -0 "$(cat /tmp/iodine.pid)" 2>/dev/null; do
    if [ "$(date +%s)" -gt "$DEADLINE" ]; then
      echo "[iodine] deadline — stopping"
      kill "$(cat /tmp/iodine.pid)"; sleep 20; exit 0
    fi
    sleep 120
  done
  sleep 20
done
echo "[iodine] exited"
