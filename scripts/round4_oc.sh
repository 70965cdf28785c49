#!/bin/bash
# SLATE x Object Comparison cell, launched CONCURRENTLY with the PropComp
# cell: both PPO runs are tunnel-latency-bound (chip busy ~3ms per ~100ms
# dispatch cycle), so they interleave with little mutual slowdown.
cd /root/repo || exit 1
FAM=SLATE-Transformer-PPO-OddOneOutN4C2S2S1EnvOC
DEADLINE=$(date -d '2026-08-21 06:50' +%s)

ckpt_steps() {
  python - "$FAM" <<'PYEOF'
import glob, json, os, struct, sys
fs = sorted(glob.glob(f"outputs/train_sb3/{sys.argv[1]}/*/models/latest_model.ckpt"),
            key=os.path.getmtime)
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
    sb3_acnet=mlp env=odd-one-out-N4C2S2S1-oc \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
    eval.freq=2400 video.interval=500000 +pipeline_rollout=True \
    +cache_frozen_reps=True $RES >> /tmp/slate_oc.log 2>&1 &
  echo $! > /tmp/slate_oc.pid
}

launch
sleep 60
while true; do
  PID=$(cat /tmp/slate_oc.pid)
  if ! kill -0 "$PID" 2>/dev/null; then
    sleep 15
    S=$(ckpt_steps)
    echo "[oc] pid gone at $S steps"
    if [ "$S" -ge 5990000 ] || [ "$(date +%s)" -gt "$DEADLINE" ]; then break; fi
    launch; sleep 240; continue
  fi
  RSS=$(ps -o rss= -p "$PID" | tr -d ' ')
  if [ -n "$RSS" ] && [ "$RSS" -gt 55000000 ]; then
    echo "[oc] RSS recycle"; kill "$PID"; sleep 15; continue
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[oc] deadline"; kill "$PID"; sleep 20; break
  fi
  sleep 120
done
echo "[oc] phase done at $(ckpt_steps)"
RUN=$(dirname "$(newest_ckpt)")
for f in latest_model best_model; do
  timeout 2700 python test_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=odd-one-out-N4C2S2S1-oc \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 \
    agent_checkpoint.run_id=$RUN agent_checkpoint.file=$f \
    > /tmp/test_oc_$f.log 2>&1
done
touch /tmp/slate_oc_done
echo "[oc] all done"
