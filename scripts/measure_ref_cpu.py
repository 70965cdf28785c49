"""Measure the reference (torch) SLATE train step on THIS machine's CPU.

Anchors bench.py's `vs_baseline` denominator (VERDICT r3 item 6): instead of
the round-1..3 "300-600 imgs/s, take the midpoint" estimate of the reference's
A100 rate, we measure the reference implementation's actual step rate here
(same host, torch CPU), measure OUR JAX step rate on the same CPU, and use the
ratio to place both implementations on a common footing.

Protocol (documented in docs/PARITY.md):
  ref_cpu   = reference torch train step, batch 24, fp32, imgs/s (this script)
  ours_cpu  = our JAX train step, same shapes, CPU backend      (this script)
  ours_tpu  = bench.py's measured v5e number
  hw_uplift = ours_tpu / ours_cpu       (what one v5e chip buys this workload)
  baseline := ref_cpu * hw_uplift       (reference granted the SAME hw uplift —
                                         generous to the reference: A100 fp32
                                         torch w/o AMP is if anything below a
                                         v5e bf16-capable chip on conv+attn)

Runs the reference code by import from /root/reference (read-only), with
wandb/omegaconf stubbed out.  Nothing is copied.
"""
import argparse
import sys
import time
import types

import numpy as np


def _install_stubs():
    wandb = types.ModuleType("wandb")
    wandb.watch = lambda *a, **k: None
    wandb.log = lambda *a, **k: None
    sys.modules.setdefault("wandb", wandb)
    om = types.ModuleType("omegaconf")

    class _OC:
        @staticmethod
        def to_container(x, resolve=True):
            return x

    om.OmegaConf = _OC
    om.DictConfig = dict
    import contextlib

    om.open_dict = contextlib.nullcontext
    om.read_write = contextlib.nullcontext
    sys.modules.setdefault("omegaconf", om)
    # timm isn't installed; only the MAE model (not measured here) needs it
    timm = types.ModuleType("timm")
    timm.__version__ = "0.3.2"
    timm_m = types.ModuleType("timm.models")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit.PatchEmbed = object
    timm_vit.Block = object
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.trunc_normal_ = lambda *a, **k: None
    timm_layers.drop_path = None
    timm_layers.to_2tuple = lambda x: (x, x)
    timm_layers.DropPath = object
    timm.models = timm_m
    timm_m.vision_transformer = timm_vit
    timm_m.layers = timm_layers
    timm_optim = types.ModuleType("timm.optim")
    timm_of = types.ModuleType("timm.optim.optim_factory")
    timm_of.add_weight_decay = lambda *a, **k: []
    timm_optim.optim_factory = timm_of
    timm.optim = timm_optim
    timm.__path__ = []  # mark as package so `import timm.optim.x` resolves
    for name, mod in [("timm", timm), ("timm.models", timm_m),
                      ("timm.models.vision_transformer", timm_vit),
                      ("timm.models.layers", timm_layers),
                      ("timm.optim", timm_optim),
                      ("timm.optim.optim_factory", timm_of)]:
        sys.modules.setdefault(name, mod)


class AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)  # so hasattr() works


def _cfg(d):
    if isinstance(d, dict):
        return AttrDict({k: _cfg(v) for k, v in d.items()})
    return d


# configs/ocr/slate.yaml of the reference, transcribed (values, not code)
SLATE_CFG = {
    "name": "SLATE", "tau_start": 1.0, "tau_final": 0.1, "tau_steps": 30000,
    "hard": False, "use_cnn_feat": False, "use_bcdec": False,
    "dvae": {"vocab_size": 4096, "d_model": 192},
    "cnn": {"hidden_size": 64},
    "slotattr": {"num_iterations": 3, "num_slots": 5, "num_slot_heads": 1,
                 "slot_size": 192, "mlp_hidden_size": 192, "pos_channels": 4},
    "tfdec": {"num_dec_blocks": 4, "num_dec_heads": 4},
    "learning": {"lr_half_life": 250000, "lr_dvae": 3e-4, "lr_enc": 1e-4,
                 "lr_dec": 3e-4, "lr_warmup_steps": 30000, "dropout": 0.1,
                 "clip": 0.05},
}
ENV_CFG = {"obs_size": 64, "obs_channels": 3}


def measure_reference(batch, warmup, iters):
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)
    from ocrs.slate.slate import SLATE

    model = SLATE(_cfg(SLATE_CFG), _cfg(ENV_CFG))
    model.to("cpu")
    model.train()
    obs = torch.rand(batch, 3, 64, 64)
    for i in range(warmup):
        model.update(obs, None, step=i)
    t0 = time.perf_counter()
    for i in range(iters):
        model.update(obs, None, step=warmup + i)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_ours(batch, warmup, iters):
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, "/root/repo")
    import jax
    from ocrl_tpu import config as cfglib
    from ocrl_tpu.models import create_ocr

    cfg = cfglib.compose("train_ocr", ["ocr=slate", "dataset=random-N5C4S4S2"])
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    rng = np.random.default_rng(0)
    obs = rng.integers(0, 256, (batch, 64, 64, 3), dtype=np.uint8)
    for i in range(warmup):
        model.update(obs, None, step=i)
    jax.block_until_ready(model.params)
    t0 = time.perf_counter()
    for i in range(iters):
        model.update(obs, None, step=warmup + i)
    jax.block_until_ready(model.params)
    dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--which", choices=["ref", "ours"], required=True)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--iters", type=int, default=15)
    a = p.parse_args()
    fn = measure_reference if a.which == "ref" else measure_ours
    rate = fn(a.batch, a.warmup, a.iters)
    print(f'{{"which": "{a.which}", "imgs_per_sec_cpu": {rate:.2f}, '
          f'"batch": {a.batch}}}')
