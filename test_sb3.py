"""Trained-agent evaluation entry point (reference: configs/test_sb3.yaml —
the reference's script is absent from its snapshot; README.md:58-66 names the
capability).

    python test_sb3.py ocr=gt pooling=mlp sb3=ppo sb3_acnet=mlp \
        env=target-N4C4S3S1 agent_checkpoint.run_id=<run_dir>
"""

import logging
from pathlib import Path

import ocrl_tpu.envs as envs
from ocrl_tpu import config as cfglib
from ocrl_tpu.rl import A2C, A2CConfig, PPO, PPOConfig, build_policy, evaluate_policy
from ocrl_tpu.utils import get_log_prefix, init_wandb, logger
from ocrl_tpu.utils.checkpoint import load_checkpoint

log = logging.getLogger(__name__)


@cfglib.main("test_sb3")
def main(config):
    logging.basicConfig(level=logging.INFO)
    run = init_wandb(config, "TestSB3-" + get_log_prefix(config))

    if config.ocr.name == "GT":
        config.env.render_mode = "state"
    env_ctor = getattr(envs, config.env.env)
    # batched eval episodes (see rl/evaluate.py vectorised path)
    from ocrl_tpu.rl import make_vec_env
    eval_env = make_vec_env(env_ctor, config.env,
                            min(int(config.n_eval_episodes), 20),
                            seed=config.seed, mode="dummy")
    is_image_obs = config.env.render_mode != "state"

    policy, ocr, freeze, pretrained = build_policy(config, seed=config.seed)
    obs_shape = eval_env.observation_space.shape

    # "+seeds=1234,2345,3456" evaluates a vmapped multi-seed checkpoint:
    # every seed's episodes run in the same batched policy calls, reported
    # per-seed plus mean +/- std (the benchmark-table protocol; reference
    # reports mean/std over its per-seed processes, scores/*.json)
    seeds_cfg = config.get("seeds")
    multi_seeds = ([int(s) for s in str(seeds_cfg).split(",")]
                   if seeds_cfg not in (None, "", "null") else None)
    if multi_seeds:
        import numpy as np

        from ocrl_tpu.rl.multi_seed import MultiSeedPPO
        from ocrl_tpu.rl.vec_env import make_multi_seed_vec_env

        eval_env.close()
        n_env = min(int(config.n_eval_episodes), 32)
        eval_env = make_multi_seed_vec_env(
            env_ctor, config.env, n_env,
            [s + 200000 for s in multi_seeds], mode="dummy")
        algo = MultiSeedPPO(
            policy, eval_env.observation_space.shape, is_image_obs, n_env,
            PPOConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
            multi_seeds, freeze_ocr=freeze)
        ckpt_cfg = config.agent_checkpoint
        path = Path(ckpt_cfg.run_id) / ckpt_cfg.file if ckpt_cfg.run_id \
            else Path(ckpt_cfg.file)
        if not str(path).endswith(".ckpt"):
            path = Path(str(path) + ".ckpt")
        tree, meta = load_checkpoint(path, algo.save())
        algo.load(tree)
        log.info("loaded multi-seed agent from %s (trained %s steps)", path,
                 meta.get("num_timesteps"))
        per_seed = algo.evaluate_all(eval_env,
                                     n_episodes=config.n_eval_episodes)
        results = {}
        for s, m in zip(multi_seeds, per_seed):
            logger.log({f"test/seed{s}/{k}": v for k, v in m.items()}, step=0)
            results[f"seed{s}"] = m
        summary = {k: {"mean": float(np.mean([m[k] for m in per_seed])),
                       "std": float(np.std([m[k] for m in per_seed]))}
                   for k in per_seed[0]}
        logger.log({f"test/{k}_mean": v["mean"] for k, v in summary.items()},
                   step=0)
        log.info("per-seed: %s", results)
        log.info("summary: %s", summary)
        print({"per_seed": results, "summary": summary})
        return

    if config.sb3.name == "A2C":
        algo = A2C(policy, obs_shape, is_image_obs, 1,
                   A2CConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
                   seed=config.seed, freeze_ocr=freeze)
    else:
        algo = PPO(policy, obs_shape, is_image_obs, 1,
                   PPOConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
                   seed=config.seed, freeze_ocr=freeze)

    ckpt_cfg = config.agent_checkpoint
    path = Path(ckpt_cfg.run_id) / ckpt_cfg.file if ckpt_cfg.run_id else Path(ckpt_cfg.file)
    if not str(path).endswith(".ckpt"):
        path = Path(str(path) + ".ckpt")
    tree, meta = load_checkpoint(path, algo.save())
    algo.load(tree)
    log.info("loaded agent from %s (trained %s steps)", path,
             meta.get("num_timesteps"))

    metrics = evaluate_policy(algo, eval_env, n_episodes=config.n_eval_episodes)
    logger.log({f"test/{k}": v for k, v in metrics.items()}, step=0)
    log.info("test results: %s", metrics)
    print(metrics)


if __name__ == "__main__":
    main()
