#!/bin/bash
# Round-3 TPU queue, v2 (GT x Object Goal already completed 16:17-17:37 —
# results in /tmp/test_gt_*.log).  Phase 0 babysits the SLATE PPO resume to
# its 2e6-steps/seed budget with crash/RSS auto-restarts, then: final SLATE
# table eval -> property probe -> bench warm-up -> bounded bcdec pretrain.
cd /root/repo || exit 1

ckpt_steps() {
  python - <<'PYEOF'
import glob
import json
import os
import struct
fs = sorted(glob.glob(
    "outputs/train_sb3/SLATE-Transformer-PPO-TargetN4C4S3S1Env/*/models/latest_model.ckpt"),
    key=lambda p: os.path.getmtime(p))
if not fs:
    print(0)
else:
    with open(fs[-1], "rb") as f:
        f.read(8)
        (n,) = struct.unpack("<Q", f.read(8))
        print(int(json.loads(f.read(n).decode()).get("num_timesteps", 0)))
PYEOF
}

newest_ckpt() {
  ls -t outputs/train_sb3/SLATE-Transformer-PPO-TargetN4C4S3S1Env/*/models/latest_model.ckpt | head -1
}

relaunch_slate() {
  nohup python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=target-N4C4S3S1 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=64 \
    eval.freq=600 video.interval=500000 +pipeline_rollout=True \
    +cache_frozen_reps=True "+resume=$(newest_ckpt)" \
    >> /tmp/slate_ppo_babysit.log 2>&1 &
  echo $! > /tmp/ppo.pid
  echo "[queue2] relaunched SLATE as $(cat /tmp/ppo.pid)"
}

DEADLINE=$(date -d '20:40' +%s)
while true; do
  PID=$(cat /tmp/ppo.pid)
  if ! kill -0 "$PID" 2>/dev/null; then
    sleep 20
    STEPS=$(ckpt_steps)
    echo "[queue2] SLATE pid $PID gone at $STEPS steps"
    if [ "$STEPS" -ge 5990000 ] || [ "$(date +%s)" -gt "$DEADLINE" ]; then
      break
    fi
    relaunch_slate
    sleep 300
    continue
  fi
  RSS=$(ps -o rss= -p "$PID" | tr -d ' ')
  if [ -n "$RSS" ] && [ "$RSS" -gt 55000000 ]; then
    echo "[queue2] RSS ${RSS}kB > 55GB — recycling SLATE process"
    kill "$PID"; sleep 15
    relaunch_slate
    sleep 300
    continue
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[queue2] deadline hit mid-run — stopping SLATE to free the chip"
    kill "$PID"; sleep 20
    break
  fi
  sleep 120
done
echo "[queue2] SLATE phase done at $(ckpt_steps) steps"

SLATE_MODELS=$(dirname "$(newest_ckpt)")
for f in latest_model best_model; do
  echo "[queue2] test_sb3 SLATE $f"
  timeout 2400 python test_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=target-N4C4S3S1 +seeds=1234,2345,3456 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 \
    agent_checkpoint.run_id=$SLATE_MODELS agent_checkpoint.file=$f \
    > /tmp/test_slate_$f.log 2>&1
done

echo "[queue2] property-predictor probe on slate.ckpt"
timeout 3600 python train_property_predictor.py ocr=slate \
  dataset=random-N5C4S4S2 \
  dataset.datadir=datasets/random-N5C4S4S2-objs-probe.hdf5 \
  ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
  max_epochs=3 batch_size=64 > /tmp/probe_slate.log 2>&1

echo "[queue2] bench warm-up (new routing-kernel graph into .jax_cache)"
timeout 5400 python bench.py > /tmp/bench_r3.log 2>&1

LEFT=$(( $(date -d '21:57' +%s) - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  echo "[queue2] bcdec pretrain for ${LEFT}s"
  timeout "$LEFT" python train_ocr.py ocr=slotattention dataset=random-N5C4S4S2 \
    > /tmp/bcdec_pretrain.log 2>&1
fi
echo "[queue2] all done"
