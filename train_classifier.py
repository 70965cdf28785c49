"""Downstream classification probe entry point (reference:
configs/train_classifier.yaml; the reference's entry script is absent from its
snapshot).  Trains pooling + a small classifier head on frozen (or aux/
fine-tuned) OCR features to predict the dataset's per-image label.

    python train_classifier.py ocr=slate pooling=transformer \
        dataset=<dataset-with-labels> pooling.ocr_checkpoint.local_file=<ckpt>
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn

from ocrl_tpu import config as cfglib
from ocrl_tpu.data import get_dataloaders, prefetch_to_device
from ocrl_tpu.poolings import Pooling, get_ocr
from ocrl_tpu.utils import init_wandb, logger
from ocrl_tpu.utils.checkpoint import save_checkpoint

log = logging.getLogger(__name__)


class ClassifierHead(nn.Module):
    d_model: int
    num_labels: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.d_model)(x))
        return nn.Dense(self.num_labels)(x)


@cfglib.main("train_classifier")
def main(config):
    logging.basicConfig(level=logging.INFO)
    run = init_wandb(config, f"TrainClassifier-{config.ocr.name}-"
                             f"{config.pooling.name}-{config.dataset.name}")
    train_dl, val_dl = get_dataloaders(config.dataset, config.batch_size,
                                       config.num_workers, seed=config.seed)
    ocr, _ = get_ocr(config.ocr, config.dataset, config.pooling.ocr_checkpoint,
                     seed=config.seed)
    pooling = Pooling(ocr, config.pooling, seed=config.seed)
    head = ClassifierHead(config.classifier.d_model, config.dataset.num_labels)
    rng = jax.random.PRNGKey(config.seed)
    head_params = jax.jit(head.init)(rng, jnp.zeros((1, pooling.rep_dim)))["params"]

    params = {"pooling": pooling.params, "head": head_params}
    tx = optax.adam(config.classifier.learning.lr)
    opt_state = tx.init(params)
    ocr_module, pool_module = ocr.spec.module, pooling.module
    detach = not config.pooling.learn_downstream_loss

    from ocrl_tpu.models.base import normalize_obs

    def loss_fn(params, obs, labels, rng):
        rep = ocr_module.apply({"params": ocr.params}, normalize_obs(obs),
                               rngs=ocr._rngs_for(rng))
        if detach:
            rep = jax.lax.stop_gradient(rep)
        pooled = pool_module.apply({"params": params["pooling"]}, rep)
        logits = head.apply({"params": params["head"]}, pooled)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels[:, 0]).mean()
        acc = (jnp.argmax(logits, -1) == labels[:, 0]).mean()
        return ce, acc

    @jax.jit
    def train_step(params, opt_state, obs, labels, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, obs, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    eval_step = jax.jit(loss_fn)

    key = jax.random.PRNGKey(config.seed + 1)
    step, best_val = 0, float("inf")
    for epoch in range(config.max_epochs):
        for batch in prefetch_to_device(train_dl, size=2):
            key, rng = jax.random.split(key)
            params, opt_state, loss, acc = train_step(
                params, opt_state, batch["obss"], batch["labels"], rng)
            logger.log({"train/loss": float(loss), "train/acc": float(acc)},
                       step=step)
            step += 1
            if step % 200 == 0:
                log.info("epoch %d step %d loss %.4f acc %.3f",
                         epoch, step, float(loss), float(acc))
        losses, accs = [], []
        for batch in prefetch_to_device(val_dl, size=2):
            key, rng = jax.random.split(key)
            l, a = eval_step(params, batch["obss"], batch["labels"], rng)
            losses.append(float(l))
            accs.append(float(a))
        val_loss, val_acc = float(np.mean(losses)), float(np.mean(accs))
        logger.log({"val/loss": val_loss, "val/acc": val_acc}, step=step)
        log.info("[epoch %d] val loss %.4f acc %.3f", epoch, val_loss, val_acc)
        if val_loss < best_val:
            best_val = val_loss
            ckpt = {"classifier_params": params}
            ckpt.update(pooling.save())
            save_checkpoint(f"{run.dir}/checkpoints/model_best.ckpt", ckpt,
                            {"step": step, "epoch": epoch,
                             "best_val_loss": best_val, "val_acc": val_acc})


if __name__ == "__main__":
    main()
