#!/bin/bash
# Round-4 TPU queue: GT x ObjectGoal protocol retry (num_envs=16 ==
# reference GAE horizon) -> final evals -> SLATE x PropertyComparison ->
# SLATE x ObjectComparison, each babysat with crash/RSS auto-restarts.
# The bcdec pretrain co-runs from a separate script (TPU-bound vs these
# host-bound PPO runs).
cd /root/repo || exit 1

ckpt_steps() { # $1 = run family dir
  python - "$1" <<'PYEOF'
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

newest_ckpt() { ls -t outputs/train_sb3/$1/*/models/latest_model.ckpt 2>/dev/null | head -1; }

babysit() { # $1 family dir, $2 deadline HH:MM, $3 pidfile, $4 log, then launch-cmd...
  local FAM=$1 DL=$2 PIDF=$3 LOG=$4; shift 4
  local DEADLINE=$(date -d "$DL" +%s)
  while true; do
    local PID=$(cat "$PIDF" 2>/dev/null)
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
      sleep 15
      local STEPS=$(ckpt_steps "$FAM")
      echo "[queue4] $FAM pid gone at $STEPS steps"
      if [ "$STEPS" -ge 5990000 ] || [ "$(date +%s)" -gt "$DEADLINE" ]; then
        return 0
      fi
      local RES=""
      local CK=$(newest_ckpt "$FAM")
      [ -n "$CK" ] && RES="+resume=$CK"
      nohup "$@" $RES >> "$LOG" 2>&1 &
      echo $! > "$PIDF"
      echo "[queue4] relaunched $FAM as $(cat $PIDF)"
      sleep 240
      continue
    fi
    local RSS=$(ps -o rss= -p "$PID" | tr -d ' ')
    if [ -n "$RSS" ] && [ "$RSS" -gt 55000000 ]; then
      echo "[queue4] RSS ${RSS}kB > 55GB — recycling $FAM"
      kill "$PID"; sleep 15; continue
    fi
    if [ "$(date +%s)" -gt "$DEADLINE" ]; then
      echo "[queue4] deadline $DL hit — stopping $FAM"
      kill "$PID"; sleep 20; return 0
    fi
    sleep 120
  done
}

eval_cell() { # $1 family dir, then test_sb3 base args...
  local FAM=$1; shift
  local RUN=$(dirname "$(newest_ckpt "$FAM")")
  for f in latest_model best_model; do
    echo "[queue4] test_sb3 $FAM $f"
    timeout 2700 python test_sb3.py "$@" \
      agent_checkpoint.run_id=$RUN agent_checkpoint.file=$f \
      > /tmp/test_$(basename $FAM)_$f.log 2>&1
  done
}

GT_FAM=GT-Transformer-PPO-TargetN4C4S3S1Env
babysit $GT_FAM '2026-08-21 02:10' /tmp/gt16.pid /tmp/gt16_ppo.log \
  python train_sb3.py ocr=gt pooling=transformer pooling.num_layers=3 \
    sb3=ppo sb3_acnet=mlp env=target-N4C4S3S1 \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
    eval.freq=2400 video.interval=500000
echo "[queue4] GT phase done at $(ckpt_steps $GT_FAM) steps"
eval_cell $GT_FAM ocr=gt pooling=transformer pooling.num_layers=3 sb3=ppo \
  sb3_acnet=mlp env=target-N4C4S3S1 sb3.algo_kwargs.ent_coef=0.01 \
  +seeds=1234,2345,3456
touch /tmp/gt16_done

PC_FAM=SLATE-Transformer-PPO-OddOneOutN4C2S2S1Env
nohup python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
  sb3_acnet=mlp env=odd-one-out-N4C2S2S1 \
  pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
  sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
  eval.freq=2400 video.interval=500000 +pipeline_rollout=True \
  +cache_frozen_reps=True > /tmp/slate_pc.log 2>&1 &
echo $! > /tmp/slate_pc.pid
babysit $PC_FAM '2026-08-21 04:30' /tmp/slate_pc.pid /tmp/slate_pc.log \
  python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=odd-one-out-N4C2S2S1 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
    eval.freq=2400 video.interval=500000 +pipeline_rollout=True \
    +cache_frozen_reps=True
echo "[queue4] SLATE PropComp done at $(ckpt_steps $PC_FAM) steps"
eval_cell $PC_FAM ocr=slate pooling=transformer sb3=ppo sb3_acnet=mlp \
  env=odd-one-out-N4C2S2S1 \
  pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
  sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456
touch /tmp/slate_pc_done

OC_FAM=SLATE-Transformer-PPO-OddOneOutN4C2S2S1EnvOC
nohup python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
  sb3_acnet=mlp env=odd-one-out-N4C2S2S1-oc \
  pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
  sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
  eval.freq=2400 video.interval=500000 +pipeline_rollout=True \
  +cache_frozen_reps=True > /tmp/slate_oc.log 2>&1 &
echo $! > /tmp/slate_oc.pid
babysit $OC_FAM '2026-08-21 06:35' /tmp/slate_oc.pid /tmp/slate_oc.log \
  python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=odd-one-out-N4C2S2S1-oc \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
    eval.freq=2400 video.interval=500000 +pipeline_rollout=True \
    +cache_frozen_reps=True
echo "[queue4] SLATE ObjComp done at $(ckpt_steps $OC_FAM) steps"
eval_cell $OC_FAM ocr=slate pooling=transformer sb3=ppo sb3_acnet=mlp \
  env=odd-one-out-N4C2S2S1-oc \
  pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
  sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456
touch /tmp/slate_oc_done
echo "[queue4] all done"
