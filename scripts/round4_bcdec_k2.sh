#!/bin/bash
# Resume Slot-Attention (bcdec) pretraining to the 250k-step reference
# budget, with crash auto-restarts.  Co-runs with the host-bound PPO queue
# (this job is TPU-bound).  Each (re)launch starts a fresh run dir and
# resumes from the newest checkpoint in the family (round-3 pattern;
# checkpoint migration handles the old decoder layout transparently).
cd /root/repo || exit 1
FAM=outputs/train_ocr/SLATE-RandomN5C4S4S2
DEADLINE=$(date -d '2026-08-21 06:00' +%s)

newest_run() {
  # full-size checkpoints are ~70MB; skip tiny/scratch runs (<20MB)
  ls -td $FAM/*/ 2>/dev/null | while read d; do
    f="$d/checkpoints/model_latest.ckpt"
    if [ -f "$f" ] && [ "$(stat -c%s "$f")" -gt 20000000 ]; then
      echo "${d%/}"; break
    fi
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
  S=$(steps_done)
  if [ "$S" -ge 249900 ]; then echo "[bcdec] budget reached at $S"; break; fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "[bcdec] deadline at $S"; break; fi
  NR=$(newest_run)
  echo "[bcdec] (re)starting from $S steps (resume $NR)"
  nohup python train_ocr.py ocr=slotattention dataset=random-N5C4S4S2 \
    load.resume_run_path="$NR" +max_steps=250000 +superbatch=2 \
    >> /tmp/bcdec_r4.log 2>&1 &
  echo $! > /tmp/bcdec.pid
  sleep 30
  while kill -0 "$(cat /tmp/bcdec.pid)" 2>/dev/null; do
    if [ "$(date +%s)" -gt "$DEADLINE" ]; then
      echo "[bcdec] deadline — stopping"
      kill "$(cat /tmp/bcdec.pid)"; sleep 20; exit 0
    fi
    sleep 120
  done
  sleep 20
done
touch /tmp/bcdec_done
echo "[bcdec] done at $(steps_done) steps"
