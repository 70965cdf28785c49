"""Headline benchmark: SLATE pretraining throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.

Protocol (END-TO-END, loader-fed): the full SLATE training pipeline — HDF5
chunk-shuffle reads, superbatched host->device staging, and the jitted train
step (dVAE + slot attention + teacher-forced transformer decoder + three-group
Adam update) — at the reference's training configuration: batch 24, 64x64x3
images, fp32 (reference: configs/_base.yaml batch_size, configs/ocr/slate.yaml).
Timed over 200 steps after warmup.  This is the rate `train_ocr.py` actually
sustains, not a fixed pre-staged device batch.

MFU: model FLOPs per train step come from XLA's own cost analysis of the
compiled step executable; the peak is the TPU v5e MXU rate (197 TFLOP/s —
JAX's default matmul precision on TPU computes f32 arrays via one-pass bf16
MXU passes with f32 accumulation, so bf16 peak is the honest ceiling).

vs_baseline: the reference publishes NO throughput numbers anywhere
(BASELINE.md §Throughput: "Absent from the reference").  The denominator is
the reference's estimated A100 rate, 450 imgs/s at batch 24 — ANCHORED in
round 4 by measurement (scripts/measure_ref_cpu.py): the reference torch
step runs at 1.58 imgs/s on this host's single CPU core (our JAX step: 1.49
— the implementations are a wash on identical silicon), so 450 corresponds
to a 285x A100-over-one-core uplift, the optimistic end of typical
single-A100 torch speedups for conv-dominated fp32 models.  BASELINE.json's
north star asks for >=5x that on a v5e-8 slice, i.e. ~281 imgs/s per chip;
single-chip parity target is 450.
"""

import json
import time
from pathlib import Path

import numpy as np

REFERENCE_A100_IMGS_PER_SEC = 450.0
TPU_PEAK_FLOPS = {  # bf16 MXU peak per chip
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}
BATCH = 24
WARMUP = 20
STEPS = 200
BENCH_DS = Path("/tmp/ocrl_bench_ds.hdf5")


def _bench_dataset(extra_overrides=()) -> Path:
    """The real 1M training set when present, else a locally collected one."""
    from ocrl_tpu.config import compose
    from ocrl_tpu.data.hdf5 import resolve_datafile

    cfg = compose("train_ocr", ["ocr=slate", "dataset=random-N5C4S4S2",
                                *extra_overrides])
    try:
        return resolve_datafile(cfg.dataset), cfg
    except FileNotFoundError:
        pass
    if not BENCH_DS.is_file():
        from ocrl_tpu.data.collect import collect_dataset

        n_batches = -(-(WARMUP + STEPS + 10) // 8) * 8  # full superbatch groups
        collect_dataset(cfg.env if cfg.get("env") else _env_cfg(),
                        num_tr=n_batches * BATCH, num_val=BATCH,
                        num_proc=1, seed=0, out_file=BENCH_DS)
    return BENCH_DS, cfg


def _env_cfg():
    from ocrl_tpu.config import compose

    return compose("collect_dataset_from_synthetic_envs",
                   ["env=random-N5C4S4S2"]).env


def main() -> None:
    import sys as _sys

    # ad-hoc ablations: `python bench.py ocr.amp=bf16` etc. (the driver's
    # argv-less invocation measures the default fp32 protocol)
    argv_overrides = [a for a in _sys.argv[1:] if "=" in a]
    try:
        _run(argv_overrides)
    except Exception as e:  # pragma: no cover - hardware-specific safety net
        import sys
        import traceback

        from ocrl_tpu.config import compose

        # only retry if the override actually changes the resolved config —
        # recomposing an identical config would just re-run the same failing
        # path and mask the original error class
        cfg = compose("train_ocr", ["ocr=slate", "dataset=random-N5C4S4S2"])
        if str(cfg.ocr.slotattr.get("fused", "never")) == "never":
            raise
        traceback.print_exc()
        print(f"bench: retrying with ocr.slotattr.fused=never ({e!r})",
              file=sys.stderr)
        _run(["ocr.slotattr.fused=never"])


def _run(extra_overrides) -> None:
    from ocrl_tpu.config import compose
    from ocrl_tpu.data import prefetch_to_device
    from ocrl_tpu.data.hdf5 import DataLoader, H5Dataset
    from ocrl_tpu.models import create_ocr
    from ocrl_tpu.parallel import enable_compilation_cache

    enable_compilation_cache(str(Path(__file__).resolve().parent / ".jax_cache"))

    import jax
    import jax.numpy as jnp

    datafile, cfg = _bench_dataset(extra_overrides)
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    loader = DataLoader(H5Dataset(datafile, "TrainingSet"), BATCH, shuffle=True)

    import os

    # scanned steps per dispatch, = train_ocr's superbatch default (the step
    # is dispatch-latency-bound at batch 24 — deeper scans amortise it)
    K = int(os.environ.get("BENCH_K", 16))

    PREFETCH = int(os.environ.get("BENCH_PREFETCH", 4))

    # ONE prefetch pipeline for the whole bench: restarting prefetch_to_device
    # per loader pass (thread setup + first-batch latency) dominates when the
    # dataset is small (the self-collected fallback is ~14 superbatches/pass
    # — measured 526 vs 1600+ imgs/s loader-fed).  Epoch reshuffle still
    # happens per pass inside the cycling iterable.
    class _Cycle:
        def __iter__(self):
            while True:
                yield from loader

    it = prefetch_to_device(_Cycle(), size=PREFETCH, superbatch=K,
                            yield_whole=True)
    step = 0
    while step < WARMUP:
        sb = next(it)
        k = sb["obss"].shape[0] // BATCH
        metrics = model.update_many(sb["obss"], None, step, k)
        step += k
    float(np.asarray(metrics["loss"]).reshape(-1)[-1])  # sync

    t0 = time.perf_counter()
    n0 = step
    while step < n0 + STEPS:
        sb = next(it)
        k = sb["obss"].shape[0] // BATCH
        metrics = model.update_many(sb["obss"], None, step, k)
        step += k
    float(np.asarray(metrics["loss"]).reshape(-1)[-1])  # sync
    dt = time.perf_counter() - t0
    steps_measured = step - n0
    imgs_per_sec = BATCH * steps_measured / dt

    # secondary: fixed pre-staged superbatch (no loader/staging) — the gap to
    # the loader-fed number above IS the pipeline cost; reported for the
    # roofline analysis in docs/PARITY.md
    sb = next(it)
    k_fix = sb["obss"].shape[0] // BATCH
    for _ in range(2):
        metrics = model.update_many(sb["obss"], None, step, k_fix)
        step += k_fix
    float(np.asarray(metrics["loss"]).reshape(-1)[-1])
    t1 = time.perf_counter()
    fix_steps = 0
    while fix_steps < STEPS:
        metrics = model.update_many(sb["obss"], None, step, k_fix)
        step += k_fix
        fix_steps += k_fix
    float(np.asarray(metrics["loss"]).reshape(-1)[-1])
    fixed_imgs_per_sec = BATCH * fix_steps / (time.perf_counter() - t1)

    # -- MFU from XLA's cost analysis of the compiled step ---------------------
    obs = jnp.zeros((BATCH, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    flops = None
    try:
        compiled = model._train_step.lower(
            model.params, model.opt_state, obs, None, jnp.int32(0), rng).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    kind = jax.devices()[0].device_kind
    peak = TPU_PEAK_FLOPS.get(kind, 197e12)
    mfu = (flops * steps_measured / dt / peak) if flops else None

    print(json.dumps({
        "metric": "slate_pretrain_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip (batch 24, 64x64, fp32, end-to-end loader-fed "
                "train step)",
        "vs_baseline": round(imgs_per_sec / REFERENCE_A100_IMGS_PER_SEC, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "model_flops_per_step": flops,
        "fixed_batch_imgs_per_sec": round(fixed_imgs_per_sec, 1),
        "superbatch_k": K,
        "device": kind,
        # measured anchor for the denominator (round 4, scripts/
        # measure_ref_cpu.py): the reference torch step does 1.58 imgs/s on
        # this host's CPU core (our JAX step: 1.49 — a wash on the same
        # silicon), so the 450 A100 estimate = 285x one-core torch, the
        # optimistic end of typical single-A100 uplift for conv-dominated
        # fp32 models — generous to the reference.
        "baseline_anchor": {"ref_torch_cpu_imgs_per_sec": 1.58,
                            "ours_jax_cpu_imgs_per_sec": 1.49,
                            "assumed_a100_over_cpu_core": 285},
    }))


if __name__ == "__main__":
    main()
