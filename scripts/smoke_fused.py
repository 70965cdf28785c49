"""Real-hardware smoke test for the fused slot-routing kernel.

Compiles and runs one tiny SLATE train step + eval step with
slotattr.fused=auto on the current backend and checks the loss is finite and
close to the jnp path.  Exit code 0 = fused kernel OK.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    from ocrl_tpu.config import compose
    from ocrl_tpu.models import create_ocr
    from ocrl_tpu.parallel import enable_compilation_cache

    enable_compilation_cache()

    tiny = ["ocr=slate", "dataset=random-N5C4S4S2", "dataset.obs_size=16",
            "ocr.dvae.vocab_size=64", "ocr.dvae.d_model=32",
            "ocr.cnn.hidden_size=16", "ocr.slotattr.num_slots=3",
            "ocr.slotattr.slot_size=32", "ocr.slotattr.mlp_hidden_size=32",
            "ocr.tfdec.num_dec_blocks=2", "ocr.tfdec.num_dec_heads=2"]
    obs = np.random.default_rng(0).random((8, 16, 16, 3)).astype("float32")

    losses = {}
    for fused in ("always", "never"):
        cfg = compose("train_ocr", tiny + [f"ocr.slotattr.fused={fused}"])
        model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
        m = model.update(obs, None, 0)
        losses[fused] = float(np.asarray(m["loss"]))
        if not np.isfinite(losses[fused]):
            print(f"smoke_fused: non-finite loss with fused={fused}")
            return 1
    rel = abs(losses["always"] - losses["never"]) / max(abs(losses["never"]), 1e-6)
    print(f"smoke_fused: loss fused={losses['always']:.6f} "
          f"jnp={losses['never']:.6f} rel={rel:.2e}")
    return 0 if rel < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
