"""Import stubs so the reference torch modules under /root/reference can be
instantiated read-only for weight-converter parity tests.  Test-only helper;
never imported by library code."""

import sys
import types

REFERENCE = "/root/reference"


def install() -> None:
    import importlib

    import torch.nn as nn

    for name in ("wandb", "omegaconf", "sklearn", "sklearn.metrics",
                 "scipy", "scipy.optimize", "einops",
                 "timm", "timm.optim", "timm.optim.optim_factory",
                 "timm.models", "timm.models.vision_transformer"):
        try:  # stub ONLY genuinely missing modules; never shadow real ones
            importlib.import_module(name)
        except ImportError:
            sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules.get("omegaconf", None), "__file__"):
        om = sys.modules["omegaconf"]
        om.OmegaConf = object
        om.DictConfig = dict
        om.ListConfig = list
        om.open_dict = lambda *a, **k: None
    if not hasattr(sys.modules.get("wandb", None), "__file__"):
        sys.modules["wandb"].run = None
    if "sklearn.metrics" in sys.modules and \
            not hasattr(sys.modules["sklearn.metrics"], "__file__"):
        sys.modules["sklearn.metrics"].adjusted_rand_score = lambda *a: 0.0
        sys.modules["sklearn"].metrics = sys.modules["sklearn.metrics"]
    if "scipy.optimize" in sys.modules and \
            not hasattr(sys.modules["scipy.optimize"], "__file__"):
        sys.modules["scipy.optimize"].linear_sum_assignment = lambda *a: None
        sys.modules["scipy"].optimize = sys.modules["scipy.optimize"]
    if not hasattr(sys.modules.get("einops", None), "__file__"):
        sys.modules["einops"].rearrange = lambda *a, **k: None
    tm = sys.modules["timm"]
    tm.__version__ = "0.3.2"
    tm.optim = sys.modules["timm.optim"]
    tm.optim.optim_factory = sys.modules["timm.optim.optim_factory"]
    vt = sys.modules["timm.models.vision_transformer"]
    vt.PatchEmbed = nn.Module
    vt.Block = nn.Module
    vt.VisionTransformer = nn.Module
    sys.modules["timm.models"].vision_transformer = vt
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
