"""Property-prediction probe entry point (reference:
configs/train_property_predictor.yaml + utils/property_predictor.py; the
reference's entry script is absent from its snapshot).

    python train_property_predictor.py ocr=slate dataset=random-N5C4S4S2 \
        ocr_checkpoint.local_file=<ckpt> dataset.datadir=<hdf5-with-objs>
"""

import logging

import numpy as np

from ocrl_tpu import config as cfglib
from ocrl_tpu.data import get_dataloaders, prefetch_to_device
from ocrl_tpu.poolings import get_ocr
from ocrl_tpu.utils import init_wandb, logger
from ocrl_tpu.utils.checkpoint import save_checkpoint
from ocrl_tpu.utils.property_predictor import PropertyPredictor

log = logging.getLogger(__name__)


@cfglib.main("train_property_predictor")
def main(config):
    logging.basicConfig(level=logging.INFO)
    run = init_wandb(config, f"TrainPropertyPredictor-{config.ocr.name}-"
                             f"{config.dataset.name}")
    train_dl, val_dl = get_dataloaders(config.dataset, config.batch_size,
                                       config.num_workers, seed=config.seed)
    ocr, pretrained = get_ocr(config.ocr, config.dataset, config.ocr_checkpoint,
                              seed=config.seed)
    if not pretrained:
        log.warning("no ocr_checkpoint configured; probing an untrained OCR")
    probe = PropertyPredictor(ocr, config.property_predictor, config.dataset,
                              seed=config.seed)

    step, best_val = 0, float("inf")
    for epoch in range(config.max_epochs):
        for batch in prefetch_to_device(train_dl, size=2):
            if "objs" not in batch:
                raise KeyError(
                    "dataset has no 'objs' key; collect it with "
                    "collection.with_states=True")
            metrics = probe.update(batch, step)
            logger.log({f"train/{k}": v for k, v in metrics.items()}, step=step)
            step += 1
            if step % 200 == 0:
                log.info("epoch %d step %d %s", epoch, step,
                         {k: round(v, 4) for k, v in metrics.items()})
        # validation each epoch
        vals = [probe.get_loss(b) for b in prefetch_to_device(val_dl, size=2)]
        val = {k: float(np.mean([float(np.asarray(m[k])) for m in vals]))
               for k in vals[0]}
        logger.log({f"val/{k}": v for k, v in val.items()}, step=step)
        log.info("[epoch %d] val %s", epoch, {k: round(v, 4) for k, v in val.items()})
        if val["loss"] < best_val:
            best_val = val["loss"]
            save_checkpoint(f"{run.dir}/checkpoints/model_best.ckpt", probe.save(),
                            {"step": step, "epoch": epoch, "best_val_loss": best_val})


if __name__ == "__main__":
    main()
