"""Smoke: the round-3 bcdec checkpoint (blocks/layers_* layout) loads through
migrate_bcdec_tree into the restructured decoder, its loss is continuous with
the run it came from (i.e. NOT re-initialised), and the restructured step is
timed on the real chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

RUN = "outputs/train_ocr/SLATE-RandomN5C4S4S2/2026-08-20_20-10-55"

from ocrl_tpu import config as cfglib
from ocrl_tpu import utils
from ocrl_tpu.data import get_dataloaders
from ocrl_tpu.models import create_ocr

cfg = cfglib.compose("train_ocr", ["ocr=slotattention",
                                   "dataset=random-N5C4S4S2"])
model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
step, epoch, best = utils.load(model, resume_run_path=RUN)
print(f"resumed at step={step} epoch={epoch} best_val_loss={best:.2f}")
assert step > 0, "checkpoint did not load"

train_dl, val_dl = get_dataloaders(cfg.dataset, cfg.batch_size, 0, seed=0)
batch = next(iter(val_dl))
m = model.get_loss(batch["obss"], None, step=step)
loss = float(np.asarray(m["loss"]))
print(f"val-batch loss at resume: {loss:.2f} (run's best_val_loss {best:.2f})")
assert loss < 2.0 * best + 100, "loss discontinuous with the checkpointed run"

import jax

obs = next(iter(train_dl))["obss"]
for i in range(3):
    model.update(obs, None, step + i)
jax.block_until_ready(model.params)
t0 = time.perf_counter()
N = 20
for i in range(N):
    model.update(obs, None, step + 3 + i)
jax.block_until_ready(model.params)
dt = time.perf_counter() - t0
print(f"bcdec step: {dt / N * 1e3:.1f} ms  ({cfg.batch_size * N / dt:.0f} imgs/s)"
      " [chip shared with PPO rollouts — lower bound]")
