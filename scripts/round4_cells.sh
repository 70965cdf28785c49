#!/bin/bash
# PC (odd-one-out property comparison) + OC (object comparison) cells, both
# SERIAL rollout: on this transport one full-width dispatch per vec step is
# the fastest shape (measured: serial GT 1180 all-seed steps/s; 2-half
# pipeline 350; 8-bucket deep pipeline 28 — in-flight executes do NOT
# overlap).  cache_frozen_reps stays on (update-phase win, unrelated).
cd /root/repo || exit 1
DEADLINE=$(date -d '2026-08-21 06:45' +%s)

ckpt_steps() { # $1 family
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

launch() { # $1 family, $2 env, $3 pidfile, $4 log
  local RES=""
  local CK=$(newest_ckpt "$1")
  [ -n "$CK" ] && RES="+resume=$CK"
  nohup python train_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=$2 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=16 \
    eval.freq=2400 video.interval=500000 +cache_frozen_reps=True \
    $RES >> $4 2>&1 &
  echo $! > $3
}

PC=SLATE-Transformer-PPO-OddOneOutN4C2S2S1Env
OC=SLATE-Transformer-PPO-OddOneOutN4C2S2S1EnvOC
launch $PC odd-one-out-N4C2S2S1 /tmp/slate_pc.pid /tmp/slate_pc.log
sleep 5
launch $OC odd-one-out-N4C2S2S1-oc /tmp/slate_oc.pid /tmp/slate_oc.log

pc_done=0; oc_done=0
while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[cells] deadline — stopping"
    kill $(cat /tmp/slate_pc.pid) 2>/dev/null
    kill $(cat /tmp/slate_oc.pid) 2>/dev/null
    sleep 20; break
  fi
  for CELL in pc oc; do
    if [ "$CELL" = pc ]; then FAM=$PC; ENVN=odd-one-out-N4C2S2S1; DONEVAR=$pc_done
    else FAM=$OC; ENVN=odd-one-out-N4C2S2S1-oc; DONEVAR=$oc_done; fi
    [ "$DONEVAR" = 1 ] && continue
    PIDF=/tmp/slate_${CELL}.pid
    PID=$(cat $PIDF 2>/dev/null)
    if ! kill -0 "$PID" 2>/dev/null; then
      sleep 10
      S=$(ckpt_steps $FAM)
      echo "[cells] $CELL pid gone at $S"
      if [ "$S" -ge 5990000 ]; then
        echo "[cells] $CELL complete"
        if [ "$CELL" = pc ]; then pc_done=1; else oc_done=1; fi
        touch /tmp/${CELL}_train_done
      else
        launch $FAM $ENVN $PIDF /tmp/slate_${CELL}.log
        sleep 120
      fi
      continue
    fi
    RSS=$(ps -o rss= -p "$PID" | tr -d ' ')
    if [ -n "$RSS" ] && [ "$RSS" -gt 50000000 ]; then
      echo "[cells] $CELL RSS recycle"; kill "$PID"; sleep 10
    fi
  done
  [ "$pc_done" = 1 ] && [ "$oc_done" = 1 ] && break
  sleep 90
done

eval_cell() { # $1 family, $2 env, $3 tag
  local RUN=$(dirname "$(newest_ckpt $1)")
  for f in latest_model best_model; do
    echo "[cells] test_sb3 $3 $f"
    timeout 2700 python test_sb3.py ocr=slate pooling=transformer sb3=ppo \
      sb3_acnet=mlp env=$2 \
      pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
      sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 \
      agent_checkpoint.run_id=$RUN agent_checkpoint.file=$f \
      > /tmp/test_${3}_$f.log 2>&1
  done
}
eval_cell $PC odd-one-out-N4C2S2S1 pc
eval_cell $OC odd-one-out-N4C2S2S1-oc oc
touch /tmp/cells_done
echo "[cells] all done"
