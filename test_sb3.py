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
