#!/bin/bash
# Post-SLATE-pretraining pipeline: waits for the training PID to exit, then
#   1. smoke-tests the fused routing kernel on the real chip
#   2. runs bench.py (also warms the compile cache for the driver's bench)
#   3. publishes the best checkpoint as pretrained_encoders/slate.ckpt
#   4. evaluates ARI/MSE on the masked eval set
#   5. launches the full PPO benchmark run (SLATE x Object Goal)
# Logs under /tmp/post_slate/.
set -u
cd /root/repo
mkdir -p /tmp/post_slate pretrained_encoders

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
sleep 10

FUSED=auto
if timeout 1800 python scripts/smoke_fused.py > /tmp/post_slate/smoke.log 2>&1; then
  echo "fused kernel OK" >> /tmp/post_slate/smoke.log
else
  FUSED=never
  echo "fused kernel FAILED -> fused=never for downstream runs" >> /tmp/post_slate/smoke.log
fi
echo "$FUSED" > /tmp/post_slate/fused

timeout 2400 python bench.py > /tmp/post_slate/bench.json 2> /tmp/post_slate/bench.err

RUN_DIR=$(ls -dt outputs/train_ocr/SLATE-RandomN5C4S4S2/* | head -1)
CKPT="$RUN_DIR/checkpoints/model_best.ckpt"
[ -f "$CKPT" ] || CKPT="$RUN_DIR/checkpoints/model_latest.ckpt"
cp "$CKPT" pretrained_encoders/slate.ckpt
echo "published $CKPT" > /tmp/post_slate/ckpt.log

timeout 2400 python get_ari_mse.py ocr=slate dataset=random-N5C4S4S2 \
    dataset.datadir=datasets/random-N5C4S4S2-masked-eval.hdf5 \
    ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    "ocr.slotattr.fused=$FUSED" \
    > /tmp/post_slate/ari.log 2>&1

# the benchmark cell: SLATE x Object Goal, the reference's 3 seeds
# (run_sb3s.py:9) trained as ONE vmapped computation
nohup python train_sb3.py ocr=slate pooling=transformer sb3=ppo sb3_acnet=mlp \
    sb3.algo_kwargs.ent_coef=0.01 \
    env=target-N4C4S3S1 env.mode=hard env.rew_type=sparse \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    "ocr.slotattr.fused=$FUSED" seeds=1234,2345,3456 num_envs=8 \
    max_steps=2e6 eval.freq=3000 \
    > /tmp/post_slate/ppo.log 2>&1 &
echo $! > /tmp/post_slate/ppo.pid
echo "pipeline done; PPO launched (pid $(cat /tmp/post_slate/ppo.pid))"
