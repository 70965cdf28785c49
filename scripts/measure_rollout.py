"""Decompose the multi-seed PPO rollout step cost on the real TPU.

VERDICT round-2 item 2: "Measure env-steps/s vs num_envs ... before/after
table in PARITY.md".  This times each device interaction in the current
collect_rollout pattern and candidate batch sizes so we pick the rollout
shape with evidence rather than guesses.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ocrl_tpu import config as cfglib
from ocrl_tpu.rl import build_policy
from ocrl_tpu.rl.multi_seed import MultiSeedPPO
from ocrl_tpu.rl.ppo import PPOConfig

OVERRIDES = [
    "ocr=slate", "pooling=transformer", "sb3=ppo", "sb3_acnet=mlp",
    "env=target-N4C4S3S1",
    "pooling.ocr_checkpoint.local_file=pretrained_encoders/slate.ckpt",
    "sb3.algo_kwargs.ent_coef=0.01",
]


def timeit(fn, n=20, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    cfg = cfglib.compose("train_sb3", OVERRIDES)
    from ocrl_tpu.parallel import enable_compilation_cache
    enable_compilation_cache()
    policy, ocr, freeze, pretrained = build_policy(cfg, seed=0)
    seeds = [1234, 2345, 3456]
    S = len(seeds)

    # 1. bare dispatch+fetch latency (tiny op)
    noop = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    print(f"noop dispatch+get: {timeit(lambda: jax.device_get(noop(x))):8.1f} ms")

    host_np = np.zeros((8,), np.float32)
    print(f"noop w/ host upload: "
          f"{timeit(lambda: jax.device_get(noop(jnp.asarray(host_np)))):8.1f} ms")

    for E in [16, 32, 48, 64]:
        algo = MultiSeedPPO(
            policy, (64, 64, 3), True, E,
            PPOConfig.from_algo_kwargs(cfg.sb3.algo_kwargs.to_dict()),
            seeds, freeze_ocr=freeze)
        obs = np.random.randint(0, 255, (S, E, 64, 64, 3), np.uint8)
        keys = jax.random.split(jax.random.PRNGKey(0), S)

        t_compile0 = time.perf_counter()
        jax.block_until_ready(algo._act(algo.params, jnp.asarray(obs), keys))
        t_compile = time.perf_counter() - t_compile0

        # current pattern: per-step key split (device op) + act + get
        def step_current():
            ks = algo._seed_keys(jax.random.PRNGKey(7))
            jax.device_get(algo._act(algo.params, jnp.asarray(obs), ks))

        # host-resident keys: one device op per step
        keys_np = np.asarray(keys)

        def step_hostkeys():
            jax.device_get(algo._act(algo.params, jnp.asarray(obs),
                                     jnp.asarray(keys_np)))

        ms_cur = timeit(step_current, n=15)
        ms_new = timeit(step_hostkeys, n=15)
        print(f"E={E:3d} ({S}x{E}={S*E} envs): compile {t_compile:6.1f}s  "
              f"current {ms_cur:7.1f} ms/step  hostkeys {ms_new:7.1f} ms/step  "
              f"-> {S*E/ms_new*1000:7.0f} env-steps/s device-side")
        del algo


if __name__ == "__main__":
    main()
