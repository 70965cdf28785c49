"""Dataset collection entry point (synthetic sprite envs).

Implements the capability documented by the reference config
configs/collect_dataset_from_synthetic_envs.yaml (the reference's script is
absent from its snapshot; README.md:58-66 names the capability).

Usage:
    python collect_dataset_from_synthetic_envs.py env=random-N5C4S4S2 \
        collection.num_tr=1000000 collection.num_val=10000
"""

import logging

from ocrl_tpu import config as cfglib
from ocrl_tpu.data.collect import collect_dataset
from ocrl_tpu.utils import init_wandb

log = logging.getLogger(__name__)


@cfglib.main("collect_dataset_from_synthetic_envs")
def main(config):
    logging.basicConfig(level=logging.INFO)
    init_wandb(config, f"CollectDataset-{config.env.name}")
    c = config.collection
    path = collect_dataset(
        config.env,
        num_tr=int(c.num_tr),
        num_val=int(c.num_val),
        num_proc=int(c.num_proc),
        only_initial=bool(c.only_initial),
        seed=int(c.seed),
        chunk_size=int(c.chunk_size),
        with_masks=bool(c.get("with_masks", False)),
        with_labels=bool(c.get("with_labels", False)),
        with_states=bool(c.get("with_states", False)),
        out_file=c.get("out_file"),
        out_dir=c.get("out_dir", "datasets"),
    )
    log.info("wrote %s", path)


if __name__ == "__main__":
    main()
