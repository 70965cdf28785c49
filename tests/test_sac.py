"""SAC tests: squashed-gaussian math, replay buffer, separate-optimizer
semantics, and learning on a continuous-action toy task."""

import flax.linen as nn
import numpy as np
import pytest
from gymnasium import spaces

from ocrl_tpu.config import compose
from ocrl_tpu.rl import SAC, SACConfig, SACPolicy, VecEnv, evaluate_policy


class _Flatten(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x.reshape(x.shape[0], -1)


class PointEnv:
    """1-D point mass: move x to the origin. reward = -|x|, success when
    |x| < 0.1 at episode end."""

    def __init__(self, seed=0):
        self._rng = np.random.default_rng(seed)
        self.observation_space = spaces.Box(-1.0, 1.0, (1,), np.float32)
        self.action_space = spaces.Box(-0.25, 0.25, (1,), np.float32)
        self.x = 0.0
        self.t = 0

    def reset(self):
        self.x = float(self._rng.uniform(-1, 1))
        self.t = 0
        return np.array([self.x], np.float32)

    def step(self, action):
        self.x = float(np.clip(self.x + float(np.asarray(action).ravel()[0]),
                               -1, 1))
        self.t += 1
        done = self.t >= 20
        info = {"is_success": abs(self.x) < 0.1} if done else {}
        return np.array([self.x], np.float32), -abs(self.x), done, info

    def close(self):
        pass


def make_algo(seed=0, **cfg):
    policy = SACPolicy(ocr_module=_Flatten(), pooling_module=_Flatten(),
                       action_dim=1, net_arch=(32, 32), freeze_ocr=False)
    config = SACConfig(**{**dict(learning_rate=3e-3, buffer_size=10_000,
                                 learning_starts=200, batch_size=64,
                                 tau=0.02, gamma=0.9), **cfg})
    return SAC(policy, (1,), False, 2, config, seed=seed,
               action_low=-0.25, action_high=0.25)


def test_sac_config_from_reference_yaml():
    cfg = compose("train_sb3", ["ocr=gt", "pooling=mlp", "sb3=sac",
                                "sb3_acnet=mlp", "env=target-N4C4S3S1"])
    sc = SACConfig.from_algo_kwargs(cfg.sb3.algo_kwargs.to_dict())
    assert sc.learning_rate == pytest.approx(1e-4)
    assert sc.buffer_size == 1_000_000 and sc.batch_size == 256
    assert sc.tau == pytest.approx(0.001) and sc.gamma == pytest.approx(0.95)
    assert float(sc.ent_coef) == pytest.approx(1e-3)


def test_squashed_sample_logprob_matches_numpy():
    import jax
    import jax.numpy as jnp

    from ocrl_tpu.rl.sac import sample_squashed

    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    log_std = jnp.asarray(rng.uniform(-1, 0, (4, 3)), jnp.float32)
    a, logp = jax.jit(sample_squashed)(mu, log_std, jax.random.PRNGKey(1))
    a, logp = np.asarray(a), np.asarray(logp)
    assert (np.abs(a) <= 1).all()
    # recompute: u = atanh(a); logp = N(u; mu, std) - sum log(1-a^2+eps)
    u = np.arctanh(np.clip(a, -1 + 1e-7, 1 - 1e-7))
    std = np.exp(np.asarray(log_std))
    ref = (-0.5 * (((u - np.asarray(mu)) / std) ** 2
                   + 2 * np.asarray(log_std) + np.log(2 * np.pi))).sum(-1)
    ref -= np.log(1 - a ** 2 + 1e-6).sum(-1)
    np.testing.assert_allclose(logp, ref, rtol=1e-4, atol=1e-4)


def test_replay_buffer_ring_and_uint8():
    from ocrl_tpu.rl.sac import ReplayBuffer

    buf = ReplayBuffer(10, (2, 2, 3), 1, is_image_obs=True)
    for i in range(7):
        obs = np.full((2, 2, 2, 3), i, np.uint8)
        buf.add(obs, obs + 1, np.zeros((2, 1), np.float32),
                np.zeros(2, np.float32), np.zeros(2, np.float32))
    assert len(buf) == 10 and buf.full  # 14 rows through a 10-ring
    batch = buf.sample(4, np.random.default_rng(0))
    assert batch["obs"].dtype == np.float32
    assert batch["obs"].max() <= 1.0  # /255 applied


def test_sac_actor_loss_does_not_move_critics():
    """SB3 separate-optimizer semantics: one update changes actor and critic
    params from their own losses only; target params move by polyak tau."""
    import jax
    import jax.numpy as jnp

    algo = make_algo(seed=1)
    # both optimizer groups must actually be present in the label tree
    assert set(jax.tree.leaves(algo._labels)) == {"actor", "critic"}
    batch = {
        "obs": jnp.asarray(np.random.default_rng(0).random((8, 1)), jnp.float32),
        "next_obs": jnp.asarray(np.random.default_rng(1).random((8, 1)), jnp.float32),
        "actions": jnp.zeros((8, 1), jnp.float32),
        "rewards": jnp.ones((8,), jnp.float32),
        "dones": jnp.zeros((8,), jnp.float32),
    }
    tgt_before = jax.tree.map(np.asarray, algo.target_params)
    (algo.params, algo.target_params, algo.opt_state, algo.log_alpha,
     algo.alpha_opt_state, metrics) = algo._update(
        algo.params, algo.target_params, algo.opt_state, algo.log_alpha,
        algo.alpha_opt_state, batch, algo._next_rng())
    assert np.isfinite(float(metrics["critic_loss"]))
    # targets moved a tiny bit (tau=0.02), not jumped to online params
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        algo.target_params, tgt_before))
    assert 0 < max(moved) < 0.1


def test_sac_learns_point_task():
    env_fns = [lambda i=i: PointEnv(seed=i) for i in range(2)]
    vec_env = VecEnv(env_fns)
    algo = make_algo(seed=0)
    eval_env = PointEnv(seed=99)
    before = evaluate_policy(algo, eval_env, n_episodes=10,
                             deterministic=True)
    algo.learn(vec_env, total_timesteps=4000)
    after = evaluate_policy(algo, eval_env, n_episodes=10, deterministic=True)
    assert after["mean_reward"] > before["mean_reward"]
    assert after["success_rate"] >= 0.8


def test_sac_auto_alpha_updates():
    algo = make_algo(seed=2, ent_coef="auto")
    assert algo.auto_alpha
    vec_env = VecEnv([lambda: PointEnv(seed=5)])
    la_before = float(np.asarray(algo.log_alpha))
    algo.learn(vec_env, total_timesteps=400)
    assert float(np.asarray(algo.log_alpha)) != la_before


def test_sac_checkpoint_roundtrip(tmp_path):
    from ocrl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    algo = make_algo(seed=3)
    save_checkpoint(tmp_path / "sac.ckpt", algo.save(), {"num_timesteps": 1})
    algo2 = make_algo(seed=4)
    tree, _ = load_checkpoint(tmp_path / "sac.ckpt", algo2.save())
    algo2.load(tree)
    obs = np.random.default_rng(0).random((3, 1)).astype(np.float32)
    np.testing.assert_allclose(algo.predict(obs, deterministic=True),
                               algo2.predict(obs, deterministic=True))
