"""Host-side vectorized environments.

Replaces SB3's DummyVecEnv/SubprocVecEnv (reference: train_sb3.py:39-65).
Envs are CPU-bound Python; the device boundary is the jitted batched policy
call in ppo.py.  Auto-reset on done with SB3 semantics (the returned obs after
done is the reset obs of the next episode).
"""

from __future__ import annotations

import os
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

    def step_indices(self, indices, actions):
        """Step ONLY the envs at `indices` (used by the double-buffered
        rollout: one env half steps while the other half's policy call is in
        flight).  Same auto-reset semantics as step()."""
        obs, rewards, dones, infos = [], [], [], []
        for i, act in zip(indices, actions):
            env = self.envs[i]
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


def make_vec_env(env_ctor, env_config, num_envs: int, seed: int = 0,
                 mode: str = "auto") -> "VecEnv | SubprocVecEnv":
    """mode: "dummy" (in-process), "subproc" (fork, one process per env — the
    reference's choice for num_envs>1), or "auto" (subproc only when the host
    actually has spare cores; process fan-out on a 1-core box just adds IPC)."""
    fns = [(lambda rank: (lambda: env_ctor(env_config, seed + rank)))(i)
           for i in range(num_envs)]
    if mode == "subproc" or (
            mode == "auto" and num_envs > 1 and (os.cpu_count() or 1) > 2):
        return SubprocVecEnv(fns)
    return VecEnv(fns)


def _subproc_worker(remote, parent_remote, env_fn) -> None:
    parent_remote.close()
    env = env_fn()
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                o, r, d, info = env.step(coerce_action(env.action_space, data))
                if d:
                    info = dict(info)
                    info["terminal_observation"] = o
                    o = env.reset()
                remote.send((o, r, d, info))
            elif cmd == "reset":
                remote.send(env.reset())
            elif cmd == "render":
                remote.send(env.render("rgb_array"))
            elif cmd == "spaces":
                remote.send((env.observation_space, env.action_space))
            elif cmd == "close":
                remote.close()
                break
    except (EOFError, KeyboardInterrupt):
        pass
    finally:
        env.close()


class SubprocVecEnv:
    """One forked process per env, pipe-driven — the reference's
    SubprocVecEnv(start_method="fork") (reference: train_sb3.py:62-65).
    Same interface as VecEnv; env.step latency overlaps across processes,
    which pays off when the host has cores to spare."""

    def __init__(self, env_fns: Sequence[Callable]):
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        self.num_envs = len(env_fns)
        self.remotes, work_remotes = zip(*[ctx.Pipe() for _ in env_fns])
        self.procs = []
        for wr, fn in zip(work_remotes, env_fns):
            p = ctx.Process(target=_subproc_worker, args=(wr, self.remotes[len(self.procs)], fn),
                            daemon=True)
            p.start()
            wr.close()
            self.procs.append(p)
        self.remotes[0].send(("spaces", None))
        self.observation_space, self.action_space = self.remotes[0].recv()

    def reset(self) -> np.ndarray:
        for r in self.remotes:
            r.send(("reset", None))
        return np.stack([r.recv() for r in self.remotes])

    def step(self, actions):
        for r, act in zip(self.remotes, actions):
            r.send(("step", act))
        results = [r.recv() for r in self.remotes]
        obs, rewards, dones, infos = zip(*results)
        return (np.stack(obs), np.asarray(rewards, np.float32),
                np.asarray(dones, bool), list(infos))

    def step_indices(self, indices, actions):
        for i, act in zip(indices, actions):
            self.remotes[i].send(("step", act))
        results = [self.remotes[i].recv() for i in indices]
        obs, rewards, dones, infos = zip(*results)
        return (np.stack(obs), np.asarray(rewards, np.float32),
                np.asarray(dones, bool), list(infos))

    def render_frame(self) -> np.ndarray:
        self.remotes[0].send(("render", None))
        return self.remotes[0].recv()

    def close(self) -> None:
        for r in self.remotes:
            try:
                r.send(("close", None))
            except (BrokenPipeError, OSError):
                pass
        for p in self.procs:
            p.join(timeout=2)


def make_multi_seed_vec_env(env_ctor, env_config, num_envs: int, seeds,
                            mode: str = "auto"):
    """One vec env hosting `len(seeds)` independent env groups: envs
    [i*num_envs, (i+1)*num_envs) are seeded seeds[i]+rank — the layout
    MultiSeedPPO's vmapped rollout expects."""
    fns = [(lambda s: (lambda: env_ctor(env_config, s)))(int(seed) + rank)
           for seed in seeds for rank in range(num_envs)]
    if mode == "subproc" or (
            mode == "auto" and len(fns) > 1 and (os.cpu_count() or 1) > 2):
        return SubprocVecEnv(fns)
    return VecEnv(fns)
