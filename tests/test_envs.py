"""Behavioral tests for the synthetic sprite environments."""

import numpy as np
import pytest

from ocrl_tpu.config import compose


def make_env(name, seed=0, **over):
    overrides = ["ocr=gt", "pooling=mlp", "sb3=ppo", "sb3_acnet=mlp", f"env={name}"]
    overrides += [f"env.{k}={v}" for k, v in over.items()]
    cfg = compose("train_sb3", overrides)
    import ocrl_tpu.envs as envs

    return getattr(envs, cfg.env.env)(cfg.env, seed), cfg.env


def test_target_env_image_obs_and_episode():
    env, env_cfg = make_env("target-N4C4S3S1", seed=3)
    obs = env.reset()
    assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
    assert obs.sum() > 0  # something was rendered
    total_done = False
    for t in range(env_cfg.max_steps + 1):
        obs, reward, done, info = env.step(int(np.random.randint(4)))
        assert obs.shape == (64, 64, 3)
        assert reward in (0.0, 1.0)
        if done:
            total_done = True
            break
    assert total_done  # must terminate within max_steps


def test_target_env_success_when_reaching_target():
    env, _ = make_env("target-N4C4S3S1", seed=5)
    env.reset()
    tgt = env._objs[env._target_obj_idx, 3:5].astype(float)
    # teleport agent next to the target and step towards it
    env._objs[-1, 3] = tgt[0] - 0.01
    env._objs[-1, 4] = tgt[1]
    obs, reward, done, info = env.step(3)  # move right
    assert done and info["is_success"] and reward == 1.0


def test_state_render_mode_padding_and_indexing():
    env, env_cfg = make_env("target-N4C4S3S1", seed=1, render_mode="'state'")
    state = env.reset()
    assert state.shape == (env_cfg.num_objects_range[1] + 1, 5)
    # agent row: red circle scale .15 -> color idx 3, shape idx 3, scale idx 0
    assert state[-1, 0] == 3 and state[-1, 1] == 3 and state[-1, 2] == 0
    assert 0.0 <= state[:, 3:].min() and state[:, 3:].max() <= 1.0


def test_mask_render_mode():
    env, env_cfg = make_env("target-N4C4S3S1", seed=2, render_mode="'mask'")
    masks = env.reset()
    K = env_cfg.num_objects_range[1] + 2  # objects + agent + background
    assert masks.shape == (K, 64, 64, 1)
    # background is exactly the complement of the union of the others
    union = masks[:-1].sum(0)
    np.testing.assert_array_equal((union == 0).astype(int), masks[-1])
    # every object got some pixels
    assert all(masks[i].sum() > 0 for i in range(K))


def test_oddoneout_unique_property_exists():
    env, _ = make_env("odd-one-out-N4C2S2S1", seed=7)
    for trial in range(5):
        env.reset()
        objs = env._objs[:-1]  # drop agent
        target = env._target_obj_idx
        unique = False
        for col in range(3):
            vals = [o[col] for o in objs]
            if vals.count(vals[target]) == 1:
                unique = True
        assert unique


def test_oddoneout_obj_comp_distractors_identical():
    env, _ = make_env("odd-one-out-N4C2S2S1-oc", seed=11)
    env.reset()
    objs = env._objs[:-1]
    t = env._target_obj_idx
    distractors = [tuple(o[:3]) for i, o in enumerate(objs) if i != t]
    assert len(set(distractors)) == 1
    assert tuple(objs[t][:3]) != distractors[0]


def test_push_env_goal_row_and_push_physics():
    env, env_cfg = make_env("push-N3C4S1S1", seed=13, render_mode="'state'")
    state = env.reset()
    assert state.shape == (env_cfg.num_objects_range[1] + 2, 5)
    # goal row shares properties with the target object
    goal = env._objs[-2]
    target = env._objs[env._target_obj_idx]
    assert tuple(goal[:3]) == tuple(target[:3])
    # place the agent right of the target object and push it left
    env._objs[env._target_obj_idx, 3:5] = [0.5, 0.5]
    env._objs[-1, 3:5] = [0.5 + 0.14, 0.5]
    x_before = float(env._objs[env._target_obj_idx, 3])
    env.step(1)  # left
    x_after = float(env._objs[env._target_obj_idx, 3])
    assert x_after < x_before  # object was pushed


def test_push_success_in_corner():
    env, _ = make_env("push-N3C4S1S1", seed=17)
    env.reset()
    goal = env._objs[-2, 3:5].astype(float)
    env._objs[env._target_obj_idx, 3:5] = [goal[0] + 0.05, goal[1]]
    # agent far away; stepping shouldn't matter, reward computed on overlap
    env._objs[-1, 3:5] = [0.9, 0.9]
    obs, reward, done, info = env.step(0)
    assert done and info["is_success"] and reward == 1.0


def test_maze_env():
    env, _ = make_env("maze-N4C4S4S2", seed=19)
    env.reset()
    env._objs[-1, 3:5] = [0.5 - 0.02, 0.5]
    obs, reward, done, info = env.step(3)
    assert done and info["is_success"] and reward == 1.0


def test_random_objs_env_wo_agent():
    env, _ = make_env("random-N5C4S4S2", seed=23)
    obs = env.reset()
    assert obs.shape == (64, 64, 3)
    assert env._objs.shape[0] == 6  # 5 objects + agent row (not rendered)


def test_determinism_given_seed():
    env1, _ = make_env("target-N4C4S3S1", seed=42)
    env2, _ = make_env("target-N4C4S3S1", seed=42)
    np.testing.assert_array_equal(env1.reset(), env2.reset())
    for _ in range(5):
        o1 = env1.step(2)
        o2 = env2.step(2)
        np.testing.assert_array_equal(o1[0], o2[0])
        assert o1[1:3] == o2[1:3]


def test_renderer_shapes():
    from ocrl_tpu.envs.renderer import SpriteRenderer, Sprite, SHAPES

    r = SpriteRenderer((64, 64), anti_aliasing=4)
    for shape in SHAPES:
        img = r.render([Sprite(0.5, 0.5, shape, 0.3, (255, 0, 0))])
        assert img.shape == (64, 64, 3)
        assert img[:, :, 0].sum() > 0, shape


def test_native_rasterizer_matches_pil():
    from ocrl_tpu import native
    from ocrl_tpu.envs.renderer import SpriteRenderer, Sprite

    if not native.available():
        import pytest
        pytest.skip("native rasterizer unavailable (no g++)")
    sprites = [Sprite(0.3, 0.3, "square", 0.3, (255, 0, 0)),
               Sprite(0.7, 0.6, "triangle", 0.25, (0, 255, 0)),
               Sprite(0.5, 0.8, "star_5", 0.2, (0, 0, 255))]
    a = SpriteRenderer((64, 64), 10, use_native=True).render(sprites)
    b = SpriteRenderer((64, 64), 10, use_native=False).render(sprites)
    assert a.shape == b.shape == (64, 64, 3)
    # same image up to sub-pixel AA differences
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0
    # and exactly equal on the interior of the shapes
    assert (a == b).mean() > 0.95


def test_dtd_background_images_and_mask_invariance(tmp_path):
    """DTD-style background images (reference: envs/synthetic_envs/base.py:49-56,
    307-317): a background dir is scanned at construction, a random image (or
    black) is applied per reset, and differential-render masks stay correct
    over a non-black background."""
    from PIL import Image

    bg_dir = tmp_path / "textures"
    bg_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(60, 200, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(bg_dir / f"tex{i}.png")

    env, env_cfg = make_env("target-N4C4S3S1", seed=7)
    env_cfg.background.use_bg = True
    env_cfg.background.img_paths = [str(bg_dir)]
    import ocrl_tpu.envs as envs

    env = envs.TargetEnv(env_cfg, 7)
    # dir scanned + "Black" appended
    assert len(env._bg_imgs) == 3 and env._bg_imgs[-1] == "Black"

    # force a textured (non-black) background deterministically
    env._bg_imgs = env._bg_imgs[:1]
    obs = env.reset()
    masks = env.render(mode="mask")
    fg = masks[:-1].sum(0)
    # background visible where no object sits
    bg_pixels = obs[(fg[..., 0] == 0)]
    assert bg_pixels.min() >= 40  # textured, not black
    # masks partition the image: per-pixel sum of all masks == 1
    np.testing.assert_array_equal(masks.sum(0), np.ones_like(masks[0]))
    # every object got a nonempty mask
    rows = env._objs[:-1] if env._wo_agent else env._objs
    assert (masks[: len(rows)].sum(axis=(1, 2, 3)) > 0).all()

    # black branch still works
    env._bg_imgs = ["Black"]
    obs_black = env.reset()
    masks_b = env.render(mode="mask")
    fg_b = masks_b[:-1].sum(0)
    assert obs_black[(fg_b[..., 0] == 0)].max() == 0
