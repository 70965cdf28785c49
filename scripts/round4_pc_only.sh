#!/bin/bash
# PC cell solo to completion (OC deferred to round 5 — chip-hours).
cd /root/repo || exit 1
FAM=SLATE-Transformer-PPO-OddOneOutN4C2S2S1Env
DEADLINE=$(date -d '2026-08-21 06:45' +%s)
ckpt_steps() {
  python - "$FAM" <<'PYEOF'
import glob, json, os, struct, sys
fs = sorted(glob.glob(f"outputs/train_sb3/{sys.argv[1]}/*/models/latest_model.ckpt"), key=os.path.getmtime)
if not fs:
    print(0)
else:
    with open(fs[-1], "rb") as f:
        f.read(8)
        (n,) = struct.unpack("<Q", f.read(8))
        print(int(json.loads(f.read(n).decode()).get("num_timesteps", 0)))
PYEOF
}
newest_ckpt() { ls -t outputs/train_sb3/$FAM/*/models/latest_model.ckpt 2>/dev/null | head -1; }
launch() {
  local RES=""
  local CK=$(newest_ckpt)
  [ -n "$CK" ] && RES="+resume=$CK"
  nohup python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=odd-one-out-N4C2S2S1 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
    eval.freq=2400 video.interval=500000 +cache_frozen_reps=True \
    $RES >> /tmp/slate_pc.log 2>&1 &
  echo $! > /tmp/slate_pc.pid
}
while true; do
  PID=$(cat /tmp/slate_pc.pid 2>/dev/null)
  if ! kill -0 "$PID" 2>/dev/null; then
    sleep 10
    S=$(ckpt_steps)
    echo "[pc] pid gone at $S"
    if [ "$S" -ge 5990000 ] || [ "$(date +%s)" -gt "$DEADLINE" ]; then break; fi
    launch; sleep 120; continue
  fi
  RSS=$(ps -o rss= -p "$PID" | tr -d ' ')
  [ -n "$RSS" ] && [ "$RSS" -gt 50000000 ] && { echo "[pc] RSS recycle"; kill "$PID"; sleep 10; continue; }
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "[pc] deadline"; kill "$PID"; sleep 20; break; fi
  sleep 90
done
echo "[pc] train phase over at $(ckpt_steps)"
RUN=$(dirname "$(newest_ckpt)")
for f in latest_model best_model; do
  echo "[pc] test_sb3 $f"
  timeout 2700 python test_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=odd-one-out-N4C2S2S1 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 \
    agent_checkpoint.run_id=$RUN agent_checkpoint.file=$f \
    > /tmp/test_pc_$f.log 2>&1
done
touch /tmp/pc_all_done
echo "[pc] all done"
