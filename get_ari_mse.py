"""Segmentation/reconstruction evaluation entry point (reference:
configs/get_ari_mse.yaml; the reference's entry script is absent from its
snapshot; the metric plumbing mirrors slate_module.py:198-241 and
iodine_module.py:261-268).

    python get_ari_mse.py ocr=slate dataset=<dataset-with-masks> \
        ocr_checkpoint.local_file=<ckpt>
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ocrl_tpu import config as cfglib
from ocrl_tpu.data import get_dataloaders, prefetch_to_device
from ocrl_tpu.poolings import get_ocr
from ocrl_tpu.utils import init_wandb, logger
from ocrl_tpu.utils.metrics import calculate_ari

log = logging.getLogger(__name__)


@cfglib.main("get_ari_mse")
def main(config):
    logging.basicConfig(level=logging.INFO)
    init_wandb(config, f"GetAriMse-{config.ocr.name}-{config.dataset.name}")
    _, val_dl = get_dataloaders(config.dataset, config.batch_size,
                                config.num_workers, seed=config.seed)
    ocr, pretrained = get_ocr(config.ocr, config.dataset, config.ocr_checkpoint,
                              seed=config.seed)
    if not pretrained:
        log.warning("no ocr_checkpoint configured; evaluating an untrained OCR")
    if config.ocr.name not in ("SLATE", "Iodine"):
        raise ValueError(
            f"get_ari_mse needs a mask-producing OCR (SLATE/Slot-Attention/"
            f"Iodine), got {config.ocr.name}")

    # SLATE's headline MSE is the autoregressive reconstruction
    # (reference: slate_module.py:234-238 with_mse -> _gen_imgs)
    gen_mse_fn = None
    if (config.ocr.name == "SLATE" and not config.ocr.use_bcdec
            and config.get("with_gen_mse", True)):
        module = ocr.spec.module

        def gen_mse(params, obs, rng):
            slots, _ = module.apply({"params": params}, obs, rngs=ocr._rngs_for(rng),
                                    method="get_slots")
            recon = module.apply({"params": params}, slots, method="gen_imgs")
            return jnp.sum((obs - recon) ** 2) / obs.shape[0]

        gen_mse_fn = jax.jit(gen_mse)

    # each model's loss metrics already carry foreground-masked ARI and MSE
    # (slate.py loss / iodine.py loss), computed on-device
    aris, mses = [], []
    eval_key = jax.random.PRNGKey(config.seed)
    for batch in prefetch_to_device(val_dl, size=2):
        eval_key, batch_key = jax.random.split(eval_key)
        if "masks" not in batch:
            raise KeyError("dataset has no 'masks'; collect with "
                           "collection.with_masks=True")
        m = ocr.get_loss(batch["obss"], batch["masks"])
        if "ari" in m:
            aris.append(float(np.asarray(m["ari"])))
        if gen_mse_fn is not None:
            from ocrl_tpu.models.base import normalize_obs

            mses.append(float(np.asarray(gen_mse_fn(
                ocr.params, normalize_obs(batch["obss"]), batch_key))))
        else:
            for key in ("mse", "dvae_mse"):
                if key in m:
                    mses.append(float(np.asarray(m[key])))
                    break
    results = {"ari": float(np.mean(aris)) if aris else float("nan"),
               "mse": float(np.mean(mses)) if mses else float("nan")}
    logger.log({f"eval/{k}": v for k, v in results.items()}, step=0)
    log.info("ARI %.4f  MSE %.4f", results["ari"], results["mse"])
    print(results)


if __name__ == "__main__":
    main()
