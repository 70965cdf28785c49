"""Policy evaluation (EvalCallback equivalent; reference: train_sb3.py:109-116)."""

from __future__ import annotations

import numpy as np

from .vec_env import coerce_action


def evaluate_policy(algo, env, n_episodes: int = 100,
                    deterministic: bool = False) -> dict:
    """Run n episodes; success rate + mean return/length."""
    successes, returns, lengths = [], [], []
    for _ in range(n_episodes):
        obs = env.reset()
        done = False
        total, steps = 0.0, 0
        info = {}
        while not done:
            action = algo.predict(obs, deterministic=deterministic)
            obs, reward, done, info = env.step(
                coerce_action(env.action_space, action))
            total += reward
            steps += 1
        returns.append(total)
        lengths.append(steps)
        successes.append(float(info.get("is_success", False)))
    return {
        "success_rate": float(np.mean(successes)),
        "mean_reward": float(np.mean(returns)),
        "mean_ep_length": float(np.mean(lengths)),
    }
