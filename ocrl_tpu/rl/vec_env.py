"""Host-side vectorized environments.

Replaces SB3's DummyVecEnv/SubprocVecEnv (reference: train_sb3.py:39-65).
Envs are CPU-bound Python; the device boundary is the jitted batched policy
call in ppo.py.  Auto-reset on done with SB3 semantics (the returned obs after
done is the reset obs of the next episode).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def coerce_action(action_space, act):
    """Discrete envs take ints; continuous (Box) envs take float vectors."""
    if hasattr(action_space, "n"):
        return int(act)
    return np.asarray(act, np.float32)


class VecEnv:
    def __init__(self, env_fns: Sequence[Callable]):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space

    def reset(self) -> np.ndarray:
        return np.stack([env.reset() for env in self.envs])

    def step(self, actions):
        obs, rewards, dones, infos = [], [], [], []
        for env, act in zip(self.envs, actions):
            o, r, d, info = env.step(coerce_action(self.action_space, act))
            if d:
                info = dict(info)
                info["terminal_observation"] = o
                o = env.reset()
            obs.append(o)
            rewards.append(r)
            dones.append(d)
            infos.append(info)
        return (np.stack(obs), np.asarray(rewards, np.float32),
                np.asarray(dones, bool), infos)

    def render_frame(self) -> np.ndarray:
        """First env's RGB frame (for video recording)."""
        return self.envs[0].render("rgb_array")

    def close(self) -> None:
        for env in self.envs:
            env.close()


def make_vec_env(env_ctor, env_config, num_envs: int, seed: int = 0) -> VecEnv:
    return VecEnv([
        (lambda rank: (lambda: env_ctor(env_config, seed + rank)))(i)
        for i in range(num_envs)
    ])
