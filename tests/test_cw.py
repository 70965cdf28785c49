"""CausalWorld TriFinger wrapper-stack tests against the fake kinematic
backend (reference behavior: envs/cw_envs/target.py, cw.py)."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
import ocrl_tpu.envs as envs
from ocrl_tpu.envs.cw_sim import (
    FLOOR_HEIGHT, JOINTS_RAISED_POSITIONS, cart2cyl, cyl2cart)


def cw_config(name="cw-target-N4C4S1S1", *over):
    cfg = compose("train_sb3", [
        "ocr=gt", "pooling=mlp", "sb3=sac", "sb3_acnet=mlp",
        f"env={name}", "env.use_fake_sim=true", *over])
    return cfg


def make_cw(name="cw-target-N4C4S1S1", seed=0, *over):
    cfg = cw_config(name, *over)
    return envs.CwTargetEnv(cfg.env, seed), cfg.env


def oracle_action(env):
    """Invert the fake forward kinematics to aim finger 1 at the target."""
    backend = env
    while hasattr(backend, "env"):
        backend = backend.env
    target = backend.stage.get_object_state(
        backend.task.target_obj, "cartesian_position")
    r, theta, z = cart2cyl(target)
    base = 2 * np.pi / 3
    dtheta = np.arctan2(np.sin(theta - base), np.cos(theta - base))
    j0 = dtheta / 0.6
    j1 = (r - 0.02) / 0.05 - 1.56
    j2 = (z - FLOOR_HEIGHT) * 2.7 / 0.12 - 2.7
    return np.array([j0, j1, j2], np.float32)


def test_requires_opt_in_for_fake_sim():
    cfg = compose("train_sb3", ["ocr=gt", "pooling=mlp", "sb3=sac",
                                "sb3_acnet=mlp", "env=cw-target-N4C4S1S1"])
    with pytest.raises(ImportError, match="causal_world"):
        envs.CwTargetEnv(cfg.env, 0)


def test_state_mode_obs_layout():
    env, env_cfg = make_cw("cw-target-N4C4S1S1", 0, "env.render_mode=state")
    obs = env.reset()
    assert obs.shape == (5, 40)
    # row 0: robot (28 state dims, type flag 0); rows 1-4: blocks (type flag 1)
    assert obs[0, -1] == 0 and (obs[1:, -1] == 1).all()
    assert (obs[1:, 31] == 1).all()
    # object rows carry cartesian positions within the arena
    assert np.abs(obs[1:, 28:30]).max() <= 0.16
    assert env.action_space.shape == (3,)


def test_image_mode_renders_colored_cubes():
    env, _ = make_cw("cw-target-N4C4S1S1", 1, "env.render_mode=image")
    obs = env.reset()
    assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
    assert len(np.unique(obs.reshape(-1, 3), axis=0)) >= 4  # floor + cubes


def test_finger_image_mode_stacks_tool_cameras():
    env, env_cfg = make_cw("cw-fingerimg-target-N4C4S1S1", 2)
    obs = env.reset()
    assert obs.shape == (64, 64, env_cfg.num_stacked_obss * 3)
    assert obs.dtype == np.uint8
    obs2, r, d, info = env.step(np.zeros(3, np.float32))
    assert obs2.shape == obs.shape and "is_success" in info


def test_single_finger_action_embedding():
    """Only finger 1's three joints are commanded; fingers 0/2 stay raised."""
    env, _ = make_cw("cw-target-N4C4S1S1", 3, "env.render_mode=state")
    env.reset()
    backend = env
    while hasattr(backend, "env"):
        backend = backend.env
    env.step(np.array([1.0, 1.0, 1.0], np.float32))
    raised = np.asarray(JOINTS_RAISED_POSITIONS)
    np.testing.assert_allclose(backend.joints[:3], raised[:3])
    np.testing.assert_allclose(backend.joints[6:], raised[6:])
    assert (backend.joints[3:6] > raised[3:6]).all()  # moved toward +1 targets


def test_target_task_color_interventions():
    env, env_cfg = make_cw("cw-target-N4C4S1S1", 4, "env.render_mode=state")
    from matplotlib import colors as mpl_colors

    target_rgb = np.asarray(mpl_colors.to_rgb(env_cfg.target[0]))
    for _ in range(3):
        env.reset()
        backend = env
        while hasattr(backend, "env"):
            backend = backend.env
        tgt_idx = _target_idx(env)
        tgt = backend.stage.get_object_state(f"obj_{tgt_idx}", "color")
        np.testing.assert_allclose(tgt, target_rgb)
        for i in range(4):
            if i != tgt_idx:
                assert not np.allclose(
                    backend.stage.get_object_state(f"obj_{i}", "color"),
                    target_rgb)


def _target_idx(env):
    e = env
    while not hasattr(e, "target_obj_idx"):
        e = e.env
    return e.target_obj_idx


def test_ooo_task_one_odd_color():
    env, _ = make_cw("cw-ooo-N4C3S1S1", 5, "env.render_mode=state")
    env.reset()
    backend = env
    while hasattr(backend, "env"):
        backend = backend.env
    colors = [tuple(backend.stage.get_object_state(f"obj_{i}", "color"))
              for i in range(4)]
    unique, counts = np.unique(np.asarray(colors), axis=0, return_counts=True)
    assert sorted(counts.tolist()) == [1, 3]  # one odd, three alike


def test_hard_mode_positions_noncolliding():
    env, _ = make_cw("cw-target-N4C4S1S1-hard", 6, "env.render_mode=state")
    for _ in range(3):
        env.reset()
        backend = env
        while hasattr(backend, "env"):
            backend = backend.env
        pos = np.stack([backend.stage.get_object_state(
            f"obj_{i}", "cartesian_position") for i in range(4)])
        assert (np.hypot(pos[:, 0], pos[:, 1]) <= 0.16).all()
        for i in range(4):
            for j in range(i + 1, 4):
                d = np.abs(pos[i] - pos[j])
                assert d[0] > 0.065 or d[1] > 0.065  # no AABB overlap


def test_oracle_reaches_target_sparse_reward():
    env, _ = make_cw("cw-target-N4C4S1S1", 7, "env.render_mode=image")
    env.reset()
    total, done, info = 0.0, False, {}
    for _ in range(60):
        obs, r, done, info = env.step(oracle_action(env))
        total += r
        if done:
            break
    assert done and total > 0 and info["is_success"]


def test_sac_composes_with_cw_state_env():
    """Full integration: CW env (fake sim) + GT OCR + SAC through train_sb3's
    construction path."""
    from ocrl_tpu.rl import SAC, SACConfig, build_sac_policy, make_vec_env

    cfg = cw_config("cw-target-N4C4S1S1", "env.render_mode=state")
    vec_env = make_vec_env(envs.CwTargetEnv, cfg.env, 2, seed=0)
    policy, ocr, freeze, _ = build_sac_policy(cfg, vec_env.action_space, seed=0)
    algo = SAC(policy, vec_env.observation_space.shape, False, 2,
               SACConfig(learning_starts=20, batch_size=16, buffer_size=500),
               seed=0, action_low=vec_env.action_space.low,
               action_high=vec_env.action_space.high)
    algo.learn(vec_env, total_timesteps=60)
    assert algo.num_timesteps >= 60


def test_cw_collector_runs_with_fake_sim(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "cw.hdf5"
    res = subprocess.run(
        [sys.executable, "collect_dataset_from_cw_envs.py",
         "--env", "cw-fingerimg-target-N4C4S1S1", "--num-tr", "12",
         "--num-val", "6", "--num-proc", "1", "--fake-sim",
         "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    import h5py

    with h5py.File(out) as f:
        assert f["TrainingSet"]["obss"].shape == (12, 64, 64, 9)
        assert f["ValidationSet"]["obss"].shape == (6, 64, 64, 9)
        assert "labels" in f["TrainingSet"]
