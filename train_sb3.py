"""RL training entry point (reference: train_sb3.py).

    python train_sb3.py ocr=slate pooling=transformer sb3=ppo sb3_acnet=mlp \
        env=target-N4C4S3S1 pooling.ocr_checkpoint.local_file=<ckpt>

Same Hydra-style surface; stable-baselines3 is replaced by the in-repo JAX
PPO/A2C whose policy (OCR -> pooling -> AC heads) is a single jitted module.
"""

import logging
from pathlib import Path

import numpy as np

import ocrl_tpu.envs as envs
from ocrl_tpu import config as cfglib
from ocrl_tpu import utils
from ocrl_tpu.rl import (
    A2C, A2CConfig, PPO, PPOConfig, SAC, SACConfig, VideoRecorder,
    build_policy, build_sac_policy, evaluate_policy, inject_pretrained_ocr,
    make_vec_env)
from ocrl_tpu.utils import get_log_prefix, init_wandb, logger
from ocrl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

log = logging.getLogger(__name__)


@cfglib.main("train_sb3")
def main(config):
    logging.basicConfig(level=logging.INFO)
    log_name = get_log_prefix(config) + (
        f"-{config.sb3.name}-{config.sb3_acnet.name}-"
        f"{config.env.name}{config.env.mode}mode{config.env.rew_type}rewardtype-"
        f"Seed{config.seed}")
    tags = config.tags.split(",") + config.env.tags.split(",") + \
        [f"RandomSeed{config.seed}"]
    run = init_wandb(config, "TrainSB3-" + log_name, tags=tags)

    # GT trains on ground-truth state observations (reference: train_sb3.py:41-43)
    if config.ocr.name == "GT":
        config.env.render_mode = "state"

    env_ctor = getattr(envs, config.env.env)
    # "seeds=1234,2345,3456" trains all seeds as ONE vmapped computation
    # (rl/multi_seed.py) instead of the reference's one-process-per-seed tmux
    # sweep (reference: run_sb3s.py:39-57)
    seeds_cfg = config.get("seeds")
    multi_seeds = ([int(s) for s in str(seeds_cfg).split(",")]
                   if seeds_cfg not in (None, "", "null") else None)
    if multi_seeds and config.sb3.name != "PPO":
        raise ValueError("seeds= (vmapped multi-seed) is PPO-only")
    if multi_seeds:
        from ocrl_tpu.rl.vec_env import make_multi_seed_vec_env
        vec_env = make_multi_seed_vec_env(env_ctor, config.env, config.num_envs,
                                          multi_seeds,
                                          mode=config.get("vec_env", "auto"))
    else:
        vec_env = make_vec_env(env_ctor, config.env, config.num_envs,
                               seed=config.seed,
                               mode=config.get("vec_env", "auto"))
    # eval episodes run BATCHED over a vec env (one policy call steps all of
    # them) — n_episodes x episode_length serial policy round-trips would
    # dominate wall-clock (reference evaluates 100 episodes per 1000 steps)
    if multi_seeds:
        # one env group per seed, same per-seed env count as training so the
        # vmapped act graph is reused (no second compile); ALL seeds evaluate
        # in the same batched policy calls (multi_seed.evaluate_all)
        eval_env = make_multi_seed_vec_env(
            env_ctor, config.env, config.num_envs,
            [s + 100000 for s in multi_seeds],
            mode=config.get("vec_env", "auto"))
    else:
        n_eval_envs = min(int(config.eval.n_episodes),
                          int(config.eval.get("num_envs", 20)))
        eval_env = make_vec_env(env_ctor, config.env, n_eval_envs,
                                seed=config.seed + config.num_envs,
                                mode=config.get("vec_env", "auto"))
    is_image_obs = config.env.render_mode != "state"

    obs_shape = vec_env.observation_space.shape

    if config.sb3.name == "SAC":
        # continuous control (reference: configs/sb3/sac.yaml, used for the
        # CausalWorld reach tasks)
        space = vec_env.action_space
        if hasattr(space, "n"):
            raise ValueError(
                f"SAC needs a continuous (Box) action space; env "
                f"'{config.env.env}' is discrete — use sb3=ppo or sb3=a2c")
        policy, ocr, freeze, pretrained = build_sac_policy(
            config, space, seed=config.seed)
        algo = SAC(policy, obs_shape, is_image_obs, config.num_envs,
                   SACConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
                   seed=config.seed, freeze_ocr=freeze,
                   action_low=space.low, action_high=space.high)
    else:
        policy, ocr, freeze, pretrained = build_policy(config, seed=config.seed)
        if multi_seeds:
            from ocrl_tpu.rl.multi_seed import MultiSeedPPO
            algo = MultiSeedPPO(
                policy, obs_shape, is_image_obs, config.num_envs,
                PPOConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
                multi_seeds, freeze_ocr=freeze,
                pipeline=bool(config.get("pipeline_rollout", False)),
                cache_frozen_reps=bool(config.get("cache_frozen_reps", False)))
        elif config.sb3.name == "PPO":
            algo = PPO(policy, obs_shape, is_image_obs, config.num_envs,
                       PPOConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
                       seed=config.seed, freeze_ocr=freeze)
        elif config.sb3.name == "A2C":
            algo = A2C(policy, obs_shape, is_image_obs, config.num_envs,
                       A2CConfig.from_algo_kwargs(config.sb3.algo_kwargs.to_dict()),
                       seed=config.seed, freeze_ocr=freeze)
        else:
            raise ValueError(f"Unknown algo '{config.sb3.name}'")

    if pretrained:
        inject_pretrained_ocr(algo, ocr)

    # `+resume=<path-to-latest_model.ckpt>` continues an earlier run: params,
    # optimizer state, and num_timesteps are restored (multi-seed checkpoints
    # also validate the seeds list matches)
    resume_path = config.get("resume")
    if resume_path not in (None, "", "null"):
        ckpt, meta = load_checkpoint(Path(str(resume_path)), algo.save())
        algo.load(ckpt)
        log.info("resumed from %s at %d timesteps", resume_path,
                 algo.num_timesteps)

    video = VideoRecorder(Path(run.dir) / "videos",
                          config.video.interval, config.video.length)
    models_dir = Path(run.dir) / "models"
    models_dir.mkdir(parents=True, exist_ok=True)
    state = {"best_success": -1.0, "vec_steps": 0}

    def run_eval(algo):
        if multi_seeds:
            per_seed = algo.evaluate_all(
                eval_env, n_episodes=config.eval.n_episodes)
            metrics = {k: float(np.mean([m[k] for m in per_seed]))
                       for k in per_seed[0]}
            # per-seed curves on a PER-SEED step axis (the reference's
            # one-process-per-seed runs count only their own env steps)
            for s, m in zip(multi_seeds, per_seed):
                logger.log({f"eval/seed{s}/{k}": v for k, v in m.items()},
                           step=algo.num_timesteps // len(multi_seeds))
        else:
            metrics = evaluate_policy(algo, eval_env,
                                      n_episodes=config.eval.n_episodes)
        return metrics

    def step_callback(algo):
        state["vec_steps"] += 1
        video.maybe_record(vec_env, algo.num_timesteps)
        if state["vec_steps"] % config.eval.freq == 0:
            metrics = run_eval(algo)
            logger.log({f"eval/{k}": v for k, v in metrics.items()},
                       step=algo.num_timesteps)
            log.info("[%d steps] eval success %.3f reward %.3f",
                     algo.num_timesteps, metrics["success_rate"],
                     metrics["mean_reward"])
            if metrics["success_rate"] >= state["best_success"]:
                state["best_success"] = metrics["success_rate"]
                save_checkpoint(models_dir / "best_model.ckpt", algo.save(),
                                {"num_timesteps": algo.num_timesteps,
                                 "success_rate": metrics["success_rate"]})

    def iteration_callback(algo, metrics, ep_infos):
        import time as _time
        payload = {}
        for k, v in metrics.items():
            arr = np.asarray(v).reshape(-1)
            payload[f"train/{k}"] = float(arr.mean())
            if multi_seeds and arr.size == len(multi_seeds):
                for s, vi in zip(multi_seeds, arr):
                    payload[f"train/seed{s}/{k}"] = float(vi)
        if ep_infos and multi_seeds:
            for s, infos_i in zip(multi_seeds, ep_infos):
                if infos_i:
                    payload[f"rollout/seed{s}/success_rate"] = float(
                        np.mean([i["is_success"] for i in infos_i]))
            flat = [i for infos_i in ep_infos for i in infos_i]
            if flat:
                payload["rollout/success_rate"] = float(
                    np.mean([i["is_success"] for i in flat]))
        elif ep_infos:
            payload["rollout/success_rate"] = float(
                np.mean([i["is_success"] for i in ep_infos]))
        logger.log(payload, step=algo.num_timesteps)
        # serializing an S-seed params+opt_state tree is ~100MB of host work;
        # doing it EVERY iteration starves the rollout loop on a 1-core box —
        # throttle to one latest-checkpoint per 120s (crash-resume still loses
        # at most 2 minutes)
        now = _time.time()
        if now - state.get("last_ckpt_t", 0.0) >= 120.0:
            state["last_ckpt_t"] = now
            save_checkpoint(models_dir / "latest_model.ckpt", algo.save(),
                            {"num_timesteps": algo.num_timesteps})

    algo.learn(vec_env, int(float(config.max_steps)),
               iteration_callback=iteration_callback,
               step_callback=step_callback)
    save_checkpoint(models_dir / "latest_model.ckpt", algo.save(),
                    {"num_timesteps": algo.num_timesteps})
    video.close()
    vec_env.close()
    eval_env.close()


if __name__ == "__main__":
    main()
