"""RL stack tests: policy, PPO/A2C learning loop, eval, checkpoints."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
import ocrl_tpu.envs as envs
from ocrl_tpu.rl import (
    A2C, A2CConfig, PPO, PPOConfig, build_policy, evaluate_policy,
    inject_pretrained_ocr, make_vec_env)


def gt_config(*over):
    return compose("train_sb3", [
        "ocr=gt", "pooling=mlp", "sb3=ppo", "sb3_acnet=mlp",
        "env=target-N4C4S3S1", "env.render_mode='state'", *over])


@pytest.fixture(scope="module")
def ppo_setup():
    cfg = gt_config()
    vec_env = make_vec_env(envs.TargetEnv, cfg.env, 2, seed=0)
    policy, ocr, freeze, pretrained = build_policy(cfg, seed=0)
    algo = PPO(policy, vec_env.observation_space.shape, False, 2,
               PPOConfig(n_steps=32, batch_size=8, n_epochs=2), seed=0,
               freeze_ocr=freeze)
    return cfg, vec_env, algo


def test_ppo_learns_and_updates(ppo_setup):
    cfg, vec_env, algo = ppo_setup
    import jax

    params_before = jax.tree.map(np.asarray, algo.params)
    algo.learn(vec_env, total_timesteps=64)
    assert algo.num_timesteps >= 64
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).sum()),
        algo.params, params_before))
    assert sum(changed) > 0  # parameters moved


def test_ppo_predict_and_eval(ppo_setup):
    cfg, vec_env, algo = ppo_setup
    env = envs.TargetEnv(cfg.env, seed=9)
    obs = env.reset()
    action = algo.predict(obs)
    assert int(action) in (0, 1, 2, 3)
    metrics = evaluate_policy(algo, env, n_episodes=2)
    assert {"success_rate", "mean_reward", "mean_ep_length"} == set(metrics)


def test_ppo_checkpoint_roundtrip(ppo_setup, tmp_path):
    cfg, vec_env, algo = ppo_setup
    from ocrl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    save_checkpoint(tmp_path / "agent.ckpt", algo.save(), {"num_timesteps": 1})
    policy, ocr, freeze, _ = build_policy(cfg, seed=1)
    algo2 = PPO(policy, vec_env.observation_space.shape, False, 2,
                PPOConfig(n_steps=32, batch_size=8, n_epochs=1), seed=1)
    tree, _ = load_checkpoint(tmp_path / "agent.ckpt", algo2.save())
    algo2.load(tree)
    obs = np.random.default_rng(0).random((3, 5, 5)).astype("float32")
    a1 = algo.predict(obs, deterministic=True)
    a2 = algo2.predict(obs, deterministic=True)
    np.testing.assert_array_equal(a1, a2)


def test_a2c_runs():
    cfg = gt_config("sb3=a2c")
    vec_env = make_vec_env(envs.TargetEnv, cfg.env, 2, seed=0)
    policy, ocr, freeze, _ = build_policy(cfg, seed=0)
    algo = A2C(policy, vec_env.observation_space.shape, False, 2,
               A2CConfig(n_steps=8), seed=0)
    algo.learn(vec_env, total_timesteps=32)
    assert algo.num_timesteps >= 32


def test_frozen_ocr_not_updated(tmp_path):
    """Pretrained OCR params must stay fixed during PPO (reference semantics:
    get_ocr keeps the wrapper un-registered -> frozen, tools.py:323-347)."""
    import jax
    from ocrl_tpu import utils
    from ocrl_tpu.models import create_ocr

    ocr_cfg = compose("train_ocr", ["ocr=vae", "dataset=random-N5C4S4S2",
                                    "dataset.obs_size=16"])
    pre = create_ocr(ocr_cfg.ocr, ocr_cfg.dataset, seed=0)
    utils.save(pre, tmp_path, step=1, best=True)

    cfg = compose("train_sb3", [
        "ocr=vae", "pooling=mlp", "sb3=ppo", "sb3_acnet=mlp",
        "env=target-N4C4S3S1", "env.obs_size=16",
        f"pooling.ocr_checkpoint.local_file={tmp_path}/checkpoints/model_best.ckpt"])
    vec_env = make_vec_env(envs.TargetEnv, cfg.env, 2, seed=0)
    policy, ocr, freeze, pretrained = build_policy(cfg, seed=0)
    assert freeze and pretrained
    algo = PPO(policy, vec_env.observation_space.shape, True, 2,
               PPOConfig(n_steps=16, batch_size=8, n_epochs=1), seed=0,
               freeze_ocr=True)
    inject_pretrained_ocr(algo, ocr)
    ocr_before = jax.tree.map(np.asarray, algo.params["ocr_module"])
    pool_before = jax.tree.map(np.asarray, algo.params["pooling_module"])
    algo.learn(vec_env, total_timesteps=32)
    ocr_diff = sum(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).sum()),
        algo.params["ocr_module"], ocr_before)))
    pool_diff = sum(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).sum()),
        algo.params["pooling_module"], pool_before)))
    assert ocr_diff == 0.0     # frozen
    assert pool_diff > 0.0     # pooling trains


def test_ppo_target_kl_blocks_update(ppo_setup):
    """SB3 semantics: an over-KL minibatch aborts training BEFORE its update
    is applied (sb3 ppo.py checks approx_kl ahead of optimizer.step())."""
    import jax
    cfg, vec_env, _ = ppo_setup
    policy, ocr, freeze, _ = build_policy(cfg, seed=3)
    algo = PPO(policy, vec_env.observation_space.shape, False, 2,
               PPOConfig(n_steps=16, batch_size=8, n_epochs=2,
                         target_kl=1e-12), seed=3)
    obs = vec_env.reset()
    _, batch, _ = algo.collect_rollout(vec_env, obs, 8, 0.99, 0.95)
    # poison old logprobs so the very first minibatch exceeds 1.5*target_kl
    batch["logprobs"] = batch["logprobs"] + 5.0
    before = jax.tree.map(np.asarray, algo.params)
    algo.train_on_rollout(batch)
    diff = sum(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).sum()),
        algo.params, before)))
    assert diff == 0.0  # the over-KL update must NOT have been applied


def test_ppo_trains_on_partial_tail_minibatch(ppo_setup):
    """SB3's RolloutBuffer yields the final partial minibatch; a rollout
    smaller than batch_size must still produce gradient updates."""
    import jax
    cfg, vec_env, _ = ppo_setup
    policy, ocr, freeze, _ = build_policy(cfg, seed=4)
    algo = PPO(policy, vec_env.observation_space.shape, False, 2,
               PPOConfig(n_steps=8, batch_size=64, n_epochs=1), seed=4)
    obs = vec_env.reset()
    _, batch, _ = algo.collect_rollout(vec_env, obs, 4, 0.99, 0.95)
    assert batch["obs"].shape[0] == 8  # 4 steps x 2 envs < batch_size
    before = jax.tree.map(np.asarray, algo.params)
    algo.train_on_rollout(batch)
    diff = sum(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).sum()),
        algo.params, before)))
    assert diff > 0.0


def test_subproc_vec_env_matches_dummy():
    """SubprocVecEnv (fork, reference train_sb3.py:62-65) must behave exactly
    like the in-process VecEnv: same spaces, same trajectories, auto-reset."""
    cfg = gt_config()
    dummy = make_vec_env(envs.TargetEnv, cfg.env, 2, seed=0, mode="dummy")
    sub = make_vec_env(envs.TargetEnv, cfg.env, 2, seed=0, mode="subproc")
    from ocrl_tpu.rl.vec_env import SubprocVecEnv

    assert isinstance(sub, SubprocVecEnv)
    assert sub.observation_space.shape == dummy.observation_space.shape
    o_d, o_s = dummy.reset(), sub.reset()
    np.testing.assert_array_equal(o_d, o_s)
    rng = np.random.default_rng(0)
    saw_done = False
    for _ in range(30):
        acts = rng.integers(0, dummy.action_space.n, size=2)
        od, rd, dd, infod = dummy.step(acts)
        os_, rs, ds, infos = sub.step(acts)
        np.testing.assert_array_equal(od, os_)
        np.testing.assert_array_equal(rd, rs)
        np.testing.assert_array_equal(dd, ds)
        saw_done = saw_done or bool(dd.any())
        if dd.any():
            i = int(np.argmax(dd))
            np.testing.assert_array_equal(
                np.asarray(infod[i]["terminal_observation"]),
                np.asarray(infos[i]["terminal_observation"]))
    assert sub.render_frame().shape == dummy.render_frame().shape
    sub.close()
    dummy.close()


def test_vectorized_eval(ppo_setup):
    """Batched eval over a VecEnv: same metric surface as serial eval, one
    policy call per step for ALL episodes (SB3 vectorised semantics)."""
    cfg, _, algo = ppo_setup
    vec = make_vec_env(envs.TargetEnv, cfg.env, 3, seed=50, mode="dummy")
    m = evaluate_policy(algo, vec, n_episodes=7)
    assert set(m) == {"success_rate", "mean_reward", "mean_ep_length"}
    assert 0.0 <= m["success_rate"] <= 1.0
    assert m["mean_ep_length"] >= 1.0
    # serial path still works on a bare env
    env = envs.TargetEnv(cfg.env, seed=51)
    m2 = evaluate_policy(algo, env, n_episodes=2)
    assert 0.0 <= m2["success_rate"] <= 1.0


def test_multi_seed_ppo_vmapped():
    """MultiSeedPPO: S seeds as one vmapped computation — per-seed params
    diverge, metrics come back (S,), seed views predict, checkpoints
    roundtrip (SURVEY §2.2: seed sweeps via jax.vmap, not tmux)."""
    import jax
    from ocrl_tpu.rl.multi_seed import MultiSeedPPO
    from ocrl_tpu.rl.vec_env import make_multi_seed_vec_env
    from ocrl_tpu.rl import inject_pretrained_ocr

    cfg = gt_config()
    seeds = [11, 22]
    vec = make_multi_seed_vec_env(envs.TargetEnv, cfg.env, 2, seeds,
                                  mode="dummy")
    assert vec.num_envs == 4
    policy, ocr, freeze, pretrained = build_policy(cfg, seed=0)
    algo = MultiSeedPPO(policy, vec.observation_space.shape, False, 2,
                        PPOConfig(n_steps=16, batch_size=8, n_epochs=2),
                        seeds, freeze_ocr=freeze)

    # every param leaf carries the seed axis; some leaf differs across seeds
    leaves = jax.tree.leaves(algo.params)
    assert all(l.shape[0] == 2 for l in leaves)
    assert any(not np.allclose(np.asarray(l[0]), np.asarray(l[1]))
               for l in leaves)

    iters = []
    algo.learn(vec, total_timesteps=64,
               iteration_callback=lambda a, m, infos: iters.append((m, infos)))
    m, infos = iters[-1]
    assert np.asarray(m["loss"]).shape == (2,)
    assert isinstance(infos, list) and len(infos) == 2
    assert algo.num_timesteps >= 64 * 2

    act = algo.seed_view(1).predict(vec.reset()[0])
    assert int(act) in range(4)

    # stochastic predict (the reference's eval protocol) varies across keys;
    # deterministic predict is argmax and repeatable
    obs0 = vec.reset()[0]
    det = [int(algo.seed_view(0).predict(obs0, deterministic=True))
           for _ in range(5)]
    assert len(set(det)) == 1
    sto = [int(algo.seed_view(0).predict(obs0, deterministic=False))
           for _ in range(25)]
    assert all(a in range(4) for a in sto)

    # batched cross-seed eval: one vmapped act steps every seed's episodes
    eval_vec = make_multi_seed_vec_env(envs.TargetEnv, cfg.env, 2,
                                       [s + 100 for s in seeds], mode="dummy")
    per_seed = algo.evaluate_all(eval_vec, n_episodes=4)
    assert len(per_seed) == 2
    for m in per_seed:
        assert 0.0 <= m["success_rate"] <= 1.0
        assert m["mean_ep_length"] >= 1.0
    eval_vec.close()

    ckpt = algo.save()
    algo2 = MultiSeedPPO(policy, vec.observation_space.shape, False, 2,
                         PPOConfig(n_steps=16, batch_size=8, n_epochs=2),
                         seeds, freeze_ocr=freeze)
    algo2.load(ckpt)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), algo.params, algo2.params)

    # seed-list mismatch on load is an error (misattributed per-seed params)
    algo3 = MultiSeedPPO(policy, vec.observation_space.shape, False, 2,
                         PPOConfig(n_steps=16, batch_size=8, n_epochs=2),
                         [33, 44], freeze_ocr=freeze)
    with pytest.raises(ValueError, match="seeds"):
        algo3.load(ckpt)
    vec.close()


def test_multi_seed_pipelined_rollout():
    """Double-buffered rollout: same buffer shapes/semantics as the serial
    path, deterministic given seeds, and learn() runs end-to-end."""
    from ocrl_tpu.rl.multi_seed import MultiSeedPPO
    from ocrl_tpu.rl.vec_env import make_multi_seed_vec_env

    cfg = gt_config()
    seeds = [11, 22]

    def fresh():
        vec = make_multi_seed_vec_env(envs.TargetEnv, cfg.env, 4, seeds,
                                      mode="dummy")
        policy, ocr, freeze, _ = build_policy(cfg, seed=0)
        algo = MultiSeedPPO(policy, vec.observation_space.shape, False, 4,
                            PPOConfig(n_steps=16, batch_size=8, n_epochs=2),
                            seeds, freeze_ocr=freeze, pipeline=True)
        assert algo.pipeline
        return vec, algo

    vec, algo = fresh()
    obs0 = vec.reset()
    obs1, batch, infos = algo.collect_rollout_pipelined(vec, obs0, 4)
    n = 4 * 4  # n_steps * E
    assert batch["obs"].shape[:2] == (2, n)
    assert batch["actions"].shape == (2, n)
    assert obs1.shape == obs0.shape
    assert np.isfinite(batch["advantages"]).all()

    # deterministic: a fresh env+algo with the same seeds reproduces the
    # rollout exactly
    vec2, algo2 = fresh()
    _, batch2, _ = algo2.collect_rollout_pipelined(vec2, vec2.reset(), 4)
    for k in batch:
        np.testing.assert_array_equal(batch[k], batch2[k], err_msg=k)
    vec2.close()

    # learning smoke through learn() with the pipelined path
    algo.learn(vec, total_timesteps=96)
    assert algo.num_timesteps >= 96 * 2
    vec.close()


def test_cached_frozen_reps_update_matches_uncached(tmp_path):
    """cache_frozen_reps=True: encode-once-per-rollout must produce the same
    update as recompute-per-minibatch for a deterministic frozen encoder
    (VAE rep = posterior mean)."""
    import jax
    from ocrl_tpu import utils
    from ocrl_tpu.models import create_ocr
    from ocrl_tpu.rl.multi_seed import MultiSeedPPO
    from ocrl_tpu.rl.vec_env import make_multi_seed_vec_env

    ocr_cfg = compose("train_ocr", ["ocr=vae", "dataset=random-N5C4S4S2",
                                    "dataset.obs_size=16"])
    pre = create_ocr(ocr_cfg.ocr, ocr_cfg.dataset, seed=0)
    utils.save(pre, tmp_path, step=1, best=True)
    cfg = compose("train_sb3", [
        "ocr=vae", "pooling=mlp", "sb3=ppo", "sb3_acnet=mlp",
        "env=target-N4C4S3S1", "env.obs_size=16",
        f"pooling.ocr_checkpoint.local_file={tmp_path}/checkpoints/model_best.ckpt"])
    seeds = [11, 22]
    vec = make_multi_seed_vec_env(envs.TargetEnv, cfg.env, 2, seeds,
                                  mode="dummy")
    policy, ocr, freeze, pretrained = build_policy(cfg, seed=0)
    assert freeze and pretrained

    def mk(cache):
        algo = MultiSeedPPO(policy, vec.observation_space.shape, True, 2,
                            PPOConfig(n_steps=16, batch_size=8, n_epochs=2),
                            seeds, freeze_ocr=True, cache_frozen_reps=cache)
        inject_pretrained_ocr(algo, ocr)
        return algo

    a_plain, a_cached = mk(False), mk(True)
    assert not a_plain.cache_reps and a_cached.cache_reps
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a_plain.params, a_cached.params)

    obs = vec.reset()
    _, batch, _ = a_plain.collect_rollout(vec, obs, 8)
    # same permutation stream for both updates
    a_plain._np_rng = np.random.default_rng(7)
    a_cached._np_rng = np.random.default_rng(7)
    m1 = a_plain.train_on_rollout({k: v.copy() for k, v in batch.items()})
    m2 = a_cached.train_on_rollout({k: v.copy() for k, v in batch.items()})
    assert np.isfinite(m2["loss"]).all()
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5),
        a_plain.params, a_cached.params)
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-3, atol=1e-4)
    vec.close()


def test_video_recorder_reschedules_relative_to_now(tmp_path):
    """With many envs num_timesteps advances num_envs per frame, so the next
    trigger must be scheduled relative to NOW — the old start+interval
    schedule was already in the past and recorded (+ GIF-encoded)
    continuously."""
    from ocrl_tpu.rl.video import VideoRecorder

    class FakeVec:
        def render_frame(self):
            return np.zeros((8, 8, 3), np.uint8)

    rec = VideoRecorder(tmp_path, interval=5000, length=10)
    vec = FakeVec()
    steps = 0
    recorded_frames = 0
    for _ in range(100):
        steps += 192                      # 3 seeds x 64 envs per vec step
        before = len(rec._frames)
        rec.maybe_record(vec, steps)
        recorded_frames += int(len(rec._frames) > before)
    gifs = list(tmp_path.glob("*.gif"))
    # 19200 steps at interval 5000 with 10-frame recordings -> 3 recordings
    # of 10 frames each; the old start+interval schedule re-triggered
    # instantly after every flush and recorded ALL 100 vec steps
    assert 2 <= len(gifs) <= 3
    # the old bug recorded on ~every one of the 100 vec steps
    assert recorded_frames <= 35


@pytest.mark.parametrize("mb", [8, 12])  # 8 divides n=16 (scan path); 12 not
def test_multi_seed_target_kl_masks_per_seed(mb):
    """SB3 target_kl semantics per seed under the vmapped update: a seed
    whose minibatch exceeds 1.5*target_kl applies NO further updates (not
    even the triggering one), while other seeds keep training."""
    import jax
    from ocrl_tpu.rl.multi_seed import MultiSeedPPO
    from ocrl_tpu.rl.vec_env import make_multi_seed_vec_env

    cfg = gt_config()
    seeds = [11, 22]
    vec = make_multi_seed_vec_env(envs.TargetEnv, cfg.env, 2, seeds,
                                  mode="dummy")
    policy, ocr, freeze, _ = build_policy(cfg, seed=0)
    algo = MultiSeedPPO(policy, vec.observation_space.shape, False, 2,
                        PPOConfig(n_steps=16, batch_size=mb, n_epochs=2,
                                  target_kl=1e-12),
                        seeds, freeze_ocr=freeze)
    obs = vec.reset()
    _, batch, _ = algo.collect_rollout(vec, obs, 8)
    # poison seed 0 only: its very first minibatch blows past 1.5*target_kl
    batch["logprobs"][0] += 5.0
    before = jax.tree.map(np.asarray, algo.params)
    algo.train_on_rollout(batch)

    def seed_diff(s):
        return sum(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a)[s] - b[s]).sum()),
            algo.params, before)))

    assert seed_diff(0) == 0.0   # poisoned seed: no update applied
    assert seed_diff(1) > 0.0    # clean seed: first (kl=0) minibatch applied
    vec.close()
