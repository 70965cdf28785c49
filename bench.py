"""Headline benchmark: SLATE pretraining throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: the full SLATE training step (dVAE + slot attention + teacher-forced
transformer decoder + three-group Adam update) at the reference's training
configuration — batch 24, 64x64x3 images, fp32 (reference: configs/_base.yaml
batch_size, configs/ocr/slate.yaml) — timed over 50 steps after warmup.

vs_baseline: the reference publishes NO throughput numbers anywhere
(BASELINE.md §Throughput: "Absent from the reference").  The denominator is a
documented estimate of the reference's torch implementation on an A100:
~450 imgs/s at batch 24 (per-step Python-loop slot attention and an unfused
dVAE put optimistic A100 torch rates in the 300-600 imgs/s range; we take the
midpoint).  BASELINE.json's north star asks for >=5x that on a v5e-8 slice,
i.e. ~281 imgs/s per chip; single-chip parity target is 450.
"""

import json
import time

import numpy as np

REFERENCE_A100_IMGS_PER_SEC = 450.0
BATCH = 24
WARMUP = 5
STEPS = 50


def main() -> None:
    from ocrl_tpu.config import compose
    from ocrl_tpu.models import create_ocr
    from ocrl_tpu.parallel import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    cfg = compose("train_ocr", ["ocr=slate", "dataset=random-N5C4S4S2"])
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    # staged on device up front: the training pipeline overlaps host->device
    # transfers with compute via prefetch_to_device (data/prefetch.py)
    obs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).random((BATCH, 64, 64, 3)), jnp.float32))

    step = 0
    for _ in range(WARMUP):
        metrics = model.update(obs, None, step)
        step += 1
    float(np.asarray(metrics["loss"]))  # sync

    t0 = time.perf_counter()
    for _ in range(STEPS):
        metrics = model.update(obs, None, step)
        step += 1
    float(np.asarray(metrics["loss"]))  # sync
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "slate_pretrain_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip (batch 24, 64x64, fp32, full train step)",
        "vs_baseline": round(imgs_per_sec / REFERENCE_A100_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
