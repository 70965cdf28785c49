#!/bin/bash
# Round-4 (continuation): first-ever Object Interaction cell attempt.
# GT x push-N3C4S1S1 (reference band 0.795 +/- 0.082,
# scores/model_wise_performances.json), single seed at the corrected
# 16-env protocol, full 2e6-step budget or deadline, then test_sb3 final
# stochastic 100-episode eval on latest + best checkpoints.
# Usage: round4_push.sh 'HH:MM' (train deadline)
cd /root/repo || exit 1
DL=${1:-'16:00'}
DEADLINE=$(date -d "$DL" +%s)
FAM=GT-Transformer-PPO-PushN3C4S1S1Env

newest_ckpt() { ls -t outputs/train_sb3/$FAM/*/models/latest_model.ckpt 2>/dev/null | head -1; }

ckpt_steps() {
  python - <<'PYEOF'
import glob, json, os, struct
fs = sorted(glob.glob("outputs/train_sb3/GT-Transformer-PPO-PushN3C4S1S1Env/*/models/latest_model.ckpt"),
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

launch() {
  local RES=""
  local CK=$(newest_ckpt)
  [ -n "$CK" ] && RES="+resume=$CK"
  nohup python train_sb3.py ocr=gt pooling=transformer pooling.num_layers=3 \
    sb3=ppo sb3_acnet=mlp env=push-N3C4S1S1 \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234 num_envs=16 \
    eval.freq=2400 video.interval=500000 $RES >> /tmp/gt_push.log 2>&1 &
  echo $! > /tmp/gt_push.pid
}

launch
while true; do
  PID=$(cat /tmp/gt_push.pid 2>/dev/null)
  if ! kill -0 "$PID" 2>/dev/null; then
    sleep 10
    STEPS=$(ckpt_steps)
    echo "[push] pid gone at $STEPS steps"
    [ "$STEPS" -ge 1990000 ] && break
    [ "$(date +%s)" -gt "$DEADLINE" ] && break
    launch
    echo "[push] relaunched as $(cat /tmp/gt_push.pid)"
    sleep 60
    continue
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[push] deadline $DL — stopping at $(ckpt_steps) steps"
    kill "$PID"; sleep 15; break
  fi
  sleep 60
done

RUN=$(dirname "$(newest_ckpt)")
echo "[push] final eval on $RUN"
for f in latest_model best_model; do
  timeout 900 python test_sb3.py ocr=gt pooling=transformer pooling.num_layers=3 \
    sb3=ppo sb3_acnet=mlp env=push-N3C4S1S1 sb3.algo_kwargs.ent_coef=0.01 \
    +seeds=1234 agent_checkpoint.run_id=$RUN agent_checkpoint.file=$f \
    > /tmp/test_push_$f.log 2>&1
  tail -3 /tmp/test_push_$f.log
done
echo "[push] done"
