"""CausalWorld dataset collection entry point
(reference: envs/collect_dataset_from_cw_envs.py).

The reference fans 50 processes of random-policy CausalWorld rollouts into an
HDF5 with obss/num_objs/labels.  CausalWorld + pybullet are external C++
simulators not available in this image; this entry point preserves the CLI and
fails with actionable guidance until they are installed, at which point the
generic collector below runs the same fan-out.
"""

import argparse
import logging
import multiprocessing as mp
from pathlib import Path

import h5py
import numpy as np

log = logging.getLogger(__name__)


def _worker(args):
    env_name, env_cfg_dict, seed, count = args
    from ocrl_tpu.config.node import from_dict
    import ocrl_tpu.envs as envs

    env_cfg = from_dict(env_cfg_dict)
    env = getattr(envs, env_name)(env_cfg, seed)  # raises ImportError w/o CW
    obss, labels, num_objs = [], [], []
    obs = env.reset()
    while len(obss) < count:
        obs, _, done, info = env.step(env.action_space.sample())
        obss.append(obs)
        labels.append(info.get("label", 0))
        num_objs.append(env_cfg.num_objects_range[0])
        if done:
            obs = env.reset()
    return (np.asarray(obss, np.uint8), np.asarray(num_objs), np.asarray(labels))


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="cw-notarget-N4C11S1S1-hard")
    parser.add_argument("--num-tr", type=int, default=1_000_000)
    parser.add_argument("--num-val", type=int, default=10_000)
    parser.add_argument("--num-proc", type=int, default=50)
    parser.add_argument("--out", default=None)
    parser.add_argument("--fake-sim", action="store_true",
                        help="use the kinematic fake TriFinger backend "
                             "(no causal_world/pybullet needed)")
    args = parser.parse_args()

    from ocrl_tpu.config import compose

    cfg = compose("train_sb3", ["ocr=gt", "pooling=mlp", "sb3=ppo",
                                "sb3_acnet=mlp", f"env={args.env}"]
                  + (["env.use_fake_sim=true"] if args.fake_sim else []))
    out = Path(args.out or f"datasets/{cfg.env.env}-N{cfg.env.num_objects_range[0]}"
                           f"-Tr{args.num_tr}-Val{args.num_val}.hdf5")
    out.parent.mkdir(parents=True, exist_ok=True)

    with h5py.File(out, "w") as f:
        for split, total in (("TrainingSet", args.num_tr),
                             ("ValidationSet", args.num_val)):
            per = [total // args.num_proc + (1 if r < total % args.num_proc else 0)
                   for r in range(args.num_proc)]
            jobs = [(cfg.env.env, cfg.env.to_dict(), 1000 * i, c)
                    for i, c in enumerate(per) if c > 0]
            with mp.get_context("fork").Pool(len(jobs)) as pool:
                parts = pool.map(_worker, jobs)
            grp = f.create_group(split)
            grp.create_dataset("obss", data=np.concatenate([p[0] for p in parts]))
            grp.create_dataset("num_objs", data=np.concatenate([p[1] for p in parts]))
            grp.create_dataset("labels", data=np.concatenate([p[2] for p in parts]))
    log.info("wrote %s", out)


if __name__ == "__main__":
    main()
