#!/bin/bash
# Round-3 TPU queue: fires after the SLATE PPO resume (pid in /tmp/ppo.pid)
# exits, then keeps the chip busy: final SLATE table eval -> GT x Object Goal
# (3 vmapped seeds) -> final GT eval -> property-predictor probe on the
# trained SLATE encoder -> bench warm-up.  Each stage logs to /tmp and is
# bounded with `timeout` so a wedge cannot eat the round.
cd /root/repo || exit 1

echo "[queue] waiting for SLATE PPO ($(cat /tmp/ppo.pid)) to finish"
while kill -0 "$(cat /tmp/ppo.pid)" 2>/dev/null; do sleep 60; done
sleep 15

SLATE_RUN=outputs/train_sb3/SLATE-Transformer-PPO-TargetN4C4S3S1Env/2026-08-20_14-45-37
for f in latest_model best_model; do
  echo "[queue] test_sb3 SLATE $f"
  timeout 2400 python test_sb3.py ocr=slate pooling=transformer sb3=ppo \
    sb3_acnet=mlp env=target-N4C4S3S1 +seeds=1234,2345,3456 \
    pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
    sb3.algo_kwargs.ent_coef=0.01 \
    agent_checkpoint.run_id=$SLATE_RUN/models agent_checkpoint.file=$f \
    > /tmp/test_slate_$f.log 2>&1
done

echo "[queue] GT x Object Goal"
timeout 7200 python train_sb3.py ocr=gt pooling=transformer \
  pooling.num_layers=3 sb3=ppo sb3_acnet=mlp env=target-N4C4S3S1 \
  sb3.algo_kwargs.ent_coef=0.01 +seeds=1234,2345,3456 num_envs=64 \
  eval.freq=600 video.interval=500000 > /tmp/gt_ppo.log 2>&1
GT_RUN=$(ls -td outputs/train_sb3/GT-Transformer-PPO-TargetN4C4S3S1Env/* | head -1)

for f in latest_model best_model; do
  echo "[queue] test_sb3 GT $f"
  timeout 2400 python test_sb3.py ocr=gt pooling=transformer \
    pooling.num_layers=3 sb3=ppo sb3_acnet=mlp env=target-N4C4S3S1 \
    +seeds=1234,2345,3456 sb3.algo_kwargs.ent_coef=0.01 \
    agent_checkpoint.run_id=$GT_RUN/models agent_checkpoint.file=$f \
    > /tmp/test_gt_$f.log 2>&1
done

echo "[queue] property-predictor probe on slate.ckpt"
timeout 3600 python train_property_predictor.py ocr=slate \
  dataset=random-N5C4S4S2 \
  dataset.datadir=datasets/random-N5C4S4S2-objs-probe.hdf5 \
  ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt \
  max_epochs=3 batch_size=64 > /tmp/probe_slate.log 2>&1

echo "[queue] bench warm-up (new routing-kernel graph into .jax_cache)"
timeout 5400 python bench.py > /tmp/bench_r3.log 2>&1

echo "[queue] done"

# Started only if wall-clock remains: Slot-Attention (bcdec) full-budget
# pretrain, bounded to stop before the driver's end-of-round bench needs the
# chip.  Resumable in round 4 from its checkpoints.
LEFT=$(( $(date -d '21:55' +%s) - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  echo "[queue] bcdec pretrain for ${LEFT}s"
  timeout "$LEFT" python train_ocr.py ocr=slotattention dataset=random-N5C4S4S2 \
    > /tmp/bcdec_pretrain.log 2>&1
fi
echo "[queue] all done"
