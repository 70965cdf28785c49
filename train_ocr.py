"""Representation pretraining entry point (reference: train_ocr.py).

    python train_ocr.py ocr=slate dataset=random-N5C4S4S2

Same Hydra-style CLI surface, TPU-native internals: jitted train/eval steps,
host->device prefetch, offline wandb-compatible logging, latest/best/step
checkpoints with resume.
"""

import logging
import time

import numpy as np

from ocrl_tpu import config as cfglib
from ocrl_tpu import utils
from ocrl_tpu.data import get_dataloaders, prefetch_to_device
from ocrl_tpu.models import create_ocr
from ocrl_tpu.utils import get_log_prefix, init_wandb, logger

log = logging.getLogger(__name__)


@cfglib.main("train_ocr")
def main(config):
    logging.basicConfig(level=logging.INFO)
    log_name = get_log_prefix(config) + f"-{config.dataset.name}"
    tags = config.tags.split(",") + config.dataset.tags.split(",")
    run = init_wandb(config, "TrainOCR-" + log_name, tags=tags)

    train_dl, val_dl = get_dataloaders(
        config.dataset, config.batch_size, config.num_workers, seed=config.seed)

    # MAE lr scaling rule (reference: train_ocr.py:35-36)
    if config.ocr.name == "MAE":
        config.ocr.learning.lr = config.ocr.learning.lr * config.batch_size / 256

    model = create_ocr(config.ocr, config.dataset, seed=config.seed)

    step, epoch, best_val_loss = utils.load(
        model, run_dir=run.dir,
        resume_checkpoint=config.load.resume_checkpoint,
        resume_run_path=config.load.resume_run_path)

    # Optional profiler trace (SURVEY §5: tracing as first-class):
    # train_ocr.py ... +profile_dir=/tmp/trace traces steps 10-14.
    profile_dir = config.get("profile_dir")

    # Per-step host materialisation of metrics would serialize the device
    # pipeline; metrics stay on-device and are flushed every log_interval
    # steps (they're tiny scalars, so holding references is free).
    log_interval = int(config.get("log_interval", 50))
    pending: list = []

    def flush_pending():
        import jax

        if not pending:
            return
        # one bulk transfer for the whole window — per-scalar device reads are
        # round-trips and dominate on high-latency transports.  update_many
        # entries carry (k,)-stacked metrics; expand to one log row per step.
        host = jax.device_get([m for _, _, m in pending])
        for (s, k, _), m in zip(pending, host):
            vals = {name: np.asarray(v).reshape(-1) for name, v in m.items()}
            for j in range(k):
                logger.log({f"train/{name}": float(v[j if v.size > 1 else 0])
                            for name, v in vals.items()}, step=s + j)
        pending.clear()

    superbatch = int(config.get("superbatch", 16))
    batch_size = int(config.batch_size)
    tracing = False
    # optional hard step budget (`+max_steps=250000`): stop mid-epoch once
    # the optimizer-step counter reaches it (the reference trains by epochs;
    # its published budgets are in steps, e.g. lr_half_life=250k)
    max_steps = config.get("max_steps")
    max_steps = int(float(max_steps)) if max_steps not in (None, "null") else None
    while epoch < config.max_epochs and (max_steps is None or step < max_steps):
        t0, imgs = time.time(), 0
        for batch in prefetch_to_device(train_dl, size=2, superbatch=superbatch,
                                        yield_whole=True):
            # explicit flag: with superbatch>1 the step counter jumps in
            # k-strides, so window-membership tests on `step` alone can fire
            # the stop before the start ever ran
            if profile_dir and not tracing and step >= 10:
                import jax

                jax.profiler.start_trace(profile_dir)
                tracing = True
            masks = batch.get("masks")
            k = batch["obss"].shape[0] // batch_size
            if k > 1:
                # k optimizer steps in ONE dispatch (lax.scan over the staged
                # superbatch) — per-step host round-trips amortise k-fold
                metrics = model.update_many(batch["obss"], masks, step, k)
            else:
                metrics = model.update(batch["obss"], masks, step)
            imgs += batch["obss"].shape[0]
            pending.append((step, k, metrics))
            prev_step, step = step, step + k
            if tracing and step >= 15 + superbatch:
                import jax

                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                tracing = False
                log.info("profiler trace written to %s", profile_dir)
                profile_dir = None          # one window per run
            if step // log_interval != prev_step // log_interval or prev_step < 3:
                flush_pending()
                rate = imgs / (time.time() - t0)
                log.info("epoch %d step %d loss %.4f (%.1f imgs/s)", epoch, step,
                         float(np.asarray(metrics.get("loss", 0.0)).reshape(-1)[-1]),
                         rate)
            if step // config.eval_interval != prev_step // config.eval_interval:
                flush_pending()
                best_val_loss = eval_and_save(
                    model, val_dl, epoch, step, best_val_loss, config, run)
            if max_steps is not None and step >= max_steps:
                break
        epoch += 1
        flush_pending()
        logger.log({"epoch": epoch}, step=step)
    if max_steps is not None and step >= max_steps:
        # final eval+save at the budget boundary (the in-loop save fires on
        # eval_interval crossings, which k-strided steps can straddle)
        eval_and_save(model, val_dl, epoch, step, best_val_loss, config, run)


def eval_and_save(model, val_dl, epoch, step, best_val_loss, config, run):
    """Validation + checkpointing (reference: train_ocr.py:72-116)."""
    all_metrics = []
    last_batch = None
    for batch in prefetch_to_device(val_dl, size=2):
        m = model.get_loss(batch["obss"], batch.get("masks"))
        all_metrics.append({k: float(np.asarray(v).mean()) for k, v in m.items()})
        last_batch = batch
    metrics = {k: float(np.mean([m[k] for m in all_metrics]))
               for k in all_metrics[0]} if all_metrics else {}
    best = bool(metrics) and metrics.get("loss", np.inf) < best_val_loss
    if best:
        best_val_loss = metrics["loss"]
    metrics["best_loss"] = best_val_loss
    logger.log({f"val/{k}": v for k, v in metrics.items()}, step=step)
    log.info("[Epoch %d, Step %d] %s", epoch, step,
             " / ".join(f"val/{k} {v:.4f}" for k, v in metrics.items()))
    if best and last_batch is not None:
        samples = model.get_samples(last_batch["obss"][:config.num_visualization])
        logger.log({k: [utils.Image(v_) for v_ in v] for k, v in samples.items()},
                   step=step)
    utils.save(model, run.dir, step=step, epoch=epoch,
               best_val_loss=best_val_loss, best=best)
    return best_val_loss


if __name__ == "__main__":
    main()
