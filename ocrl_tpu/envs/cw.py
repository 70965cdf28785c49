"""CausalWorld TriFinger reach environments
(reference: envs/cw_envs/target.py:13-402, cw.py:17-349).

The task/wrapper logic is implemented against the small backend interface in
``cw_sim.py``: the fake kinematic backend makes every wrapper unit-testable
and lets ``collect_dataset_from_cw_envs.py`` run without the external
simulator (``env.use_fake_sim=true``); when the genuine causal_world +
pybullet packages are installed, ``RealCausalWorldBackend`` adapts them behind
the same interface.

Stack (reference target.py:13-50):
  finger_image: backend(pixel) -> SingleFingerCausalWorldWrapper
                -> CausalWorldFingerImageWrapper   (64x64, 3 cameras stacked)
  image:        backend(structured) -> SingleFinger -> RenderAndState
                -> SelectObsKey("image")
  state:        backend(structured) -> SingleFinger -> StateOnly
                -> SelectObsKey("gt")
"""

from __future__ import annotations

import numpy as np
from gymnasium import spaces
from matplotlib import colors as mpl_colors
from PIL import Image

from .cw_sim import (
    JOINTS_RAISED_ACTION, JOINTS_RAISED_POSITIONS, N_OBJECTS,
    FakeTriFingerBackend, SingleFingerReachTask, cart2cyl)

_IMPORT_ERROR = None
try:  # pragma: no cover - causal_world not installed in this image
    import causal_world  # noqa: F401
    import pybullet  # noqa: F401
    _HAVE_CW = True
except Exception as e:  # pragma: no cover
    _HAVE_CW = False
    _IMPORT_ERROR = e


def CwTargetEnv(config, seed):  # noqa: N802 - factory matching the class name
    """reference: target.py:13-50."""
    np.random.seed(seed)
    assert config.mode in ("easy", "hard")
    assert config.rew_type in ("sparse",)
    task = SingleFingerReachTask(activate_sparse_reward=True)
    pixel = config.render_mode == "finger_image"
    if config.get("use_fake_sim", False) or not _HAVE_CW:
        if not config.get("use_fake_sim", False):
            raise ImportError(
                "CwTargetEnv requires the 'causal_world' and 'pybullet' "
                "packages (reference: envs/cw_envs/target.py). Install them, "
                "or set env.use_fake_sim=true to run the kinematic fake "
                f"backend for testing/data collection. ({_IMPORT_ERROR})")
        env = FakeTriFingerBackend(
            task, seed=seed,
            observation_mode="pixel" if pixel else "structured")
    else:  # pragma: no cover - needs the external simulator
        env = RealCausalWorldBackend(task, seed=seed, pixel=pixel)

    env = SingleFingerCausalWorldWrapper(env, config)
    if pixel:
        return CausalWorldFingerImageWrapper(env, config)
    if config.render_mode == "state":
        env = CausalRLStateOnlyWrapper(env)
        obs_key = "gt"
    else:
        env = CausalRLRenderAndStateWrapper(env)
        obs_key = "image"
    return SelectObsKeyWrapper(env, obs_key=obs_key)


class _Wrapper:
    """Minimal wrapper base (stands in for gym.Wrapper): attribute access
    falls through to the wrapped env."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self):
        return self.env.reset()

    def step(self, action):
        return self.env.step(action)

    def close(self):
        return self.env.close()


class SingleFingerCausalWorldWrapper(_Wrapper):
    """3-DoF single-finger control + per-episode scene interventions
    (reference: target.py:93-230)."""

    def __init__(self, env, config):
        super().__init__(env)
        self._config = config
        self._COLORS = list(config.COLORS)
        if len(config.target) > 0:
            self._target_color = config.target[0]
        else:
            self._target_color = np.random.choice(self._COLORS)
        self._size = [0.055, 0.055, 0.055]
        self.action_space = spaces.Box(low=-1.0, high=1.0, shape=(3,),
                                       dtype=np.float32)
        self.num_objects = N_OBJECTS
        self.target_obj_idx = None

    def _get_random_positions(self):
        """Rejection-sample non-colliding cube positions (target.py:138-167)."""
        cube_size = 0.065

        def collides(p1, p2):
            return (abs(p1[0] - p2[0]) <= cube_size
                    and abs(p1[1] - p2[1]) <= cube_size)

        cart_positions = []
        for _ in range(self.num_objects):
            while True:
                cart = self.env.stage.random_position(
                    height_limits=(0.0325, 0.0325),
                    angle_limits=(-3.14, 3.14 / 4))
                if not any(collides(cart, p) for p in cart_positions):
                    break
            cart_positions.append(cart)
        return [cart2cyl(p) for p in cart_positions]

    def reset(self):
        self.env.reset()
        interventions = {"joint_positions": JOINTS_RAISED_POSITIONS}
        self.target_obj_idx = np.random.randint(self.num_objects)
        self.env.task.target_obj = f"obj_{self.target_obj_idx}"
        if self._config.mode == "easy":
            positions = [
                [0.14, -1.0, 0.0325],
                [0.15, -2.34, 0.0325],
                [0.15, 0.01, 0.0325],
                [0.03, -3.14, 0.0325],
            ]
        else:  # hard
            positions = self._get_random_positions()

        if self._config.task == "target":
            for n_idx in range(self.num_objects):
                if n_idx == self.target_obj_idx:
                    color = self._target_color
                else:
                    color = self._target_color
                    while color == self._target_color:
                        color = np.random.choice(self._COLORS)
                interventions[f"obj_{n_idx}"] = {
                    "color": mpl_colors.to_rgb(color),
                    "cylindrical_position": positions[n_idx],
                    "size": np.asarray(self._size),
                }
        if self._config.task == "ooo":
            # odd-one-out: target uniquely colored, all others share one color
            self._target_color = np.random.choice(self._COLORS)
            other_color = self._target_color
            while other_color == self._target_color:
                other_color = np.random.choice(self._COLORS)
            for n_idx in range(self.num_objects):
                color = (self._target_color if n_idx == self.target_obj_idx
                         else other_color)
                interventions[f"obj_{n_idx}"] = {
                    "color": mpl_colors.to_rgb(color),
                    "cylindrical_position": positions[n_idx],
                    "size": np.asarray(self._size),
                }
        _, obs = self.env.do_intervention(interventions)
        return obs

    def step(self, action):
        full = np.asarray(
            JOINTS_RAISED_ACTION + list(np.asarray(action).ravel())
            + JOINTS_RAISED_ACTION, dtype=np.float32)
        obs, reward, done, info = self.env.step(full)
        info = dict(info)
        info["label"] = self.target_obj_idx
        return obs, reward, done, info


class CausalWorldFingerImageWrapper(_Wrapper):
    """Tool-camera pixels -> uint8 [64, 64, 3 * num_cameras]
    (reference: target.py:53-90; goal-camera halves dropped)."""

    def __init__(self, env, config, height=64, width=64):
        super().__init__(env)
        self.height, self.width = height, width
        self.observation_space = spaces.Box(
            low=0, high=255,
            shape=(height, width, config.num_stacked_obss * 3), dtype=np.uint8)
        self.action_space = env.action_space

    def _get_frame(self, obs):
        frames = []
        for i in range(len(obs) // 2):  # first half: current; second: goals
            frame = Image.fromarray((obs[i] * 255).astype(np.uint8))
            frame = np.asarray(
                frame.resize((self.height, self.width), Image.BILINEAR),
                np.uint8)
            frames.append(frame)
        frames = np.stack(frames)
        return frames.transpose(1, 2, 0, 3).reshape(self.height, self.width, -1)

    def reset(self):
        return self._get_frame(self.env.reset())

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        info = dict(info)
        info["is_success"] = bool(reward > 0)
        return self._get_frame(obs), reward, done, info


def _split_structured(obs):
    """(robot_state [28], object_states [40]) from the structured vector
    (reference: target.py:293-316)."""
    obs = np.asarray(obs, float)
    return obs[0:28], obs[28:68]


class CausalRLStateOnlyWrapper(_Wrapper):
    """Structured obs -> {robot_state, object_states, gt [5, 40]}
    (reference: target.py:275-333)."""

    def __init__(self, env):
        super().__init__(env)
        self.observation_space = spaces.Dict({
            "robot_state": spaces.Box(-1, 1, (28,), np.float64),
            "object_states": spaces.Box(-1, 1, (40,), np.float64),
            "gt": spaces.Box(-1, 1, (5, 40), np.float64),
        })
        self.action_space = env.action_space

    def _get_frame(self, obs):
        robot_state, object_states = _split_structured(obs)
        gt = np.zeros((5, 40))
        gt[0][:28] = robot_state
        gt[0][-1] = 0  # row type: robot arm
        for i in range(4):
            gt[i + 1][28:38] = object_states[i * 10:(i + 1) * 10]
            gt[i + 1][31] = 1
            gt[i + 1][-1] = 1  # row type: block
        return {"robot_state": robot_state, "object_states": object_states,
                "gt": gt}

    def reset(self):
        return self._get_frame(self.env.reset())

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        info = dict(info)
        info["is_success"] = bool(reward > 0)
        return self._get_frame(obs), reward, done, info


class CausalRLRenderAndStateWrapper(_Wrapper):
    """Structured obs + top-view render -> {image, robot_state, object_states,
    gt [5, 28]} (reference: target.py:338-402)."""

    def __init__(self, env, height=64, width=64):
        super().__init__(env)
        self.height, self.width = height, width
        self.observation_space = spaces.Dict({
            "image": spaces.Box(0, 255, (height, width, 3), np.uint8),
            "robot_state": spaces.Box(-1, 1, (28,), np.float64),
            "object_states": spaces.Box(-1, 1, (40,), np.float64),
            "gt": spaces.Box(-1, 1, (5, 28), np.float64),
        })
        self.action_space = env.action_space

    def _get_frame(self, obs):
        frame = Image.fromarray(self.env.render().astype(np.uint8))
        frame = np.asarray(
            frame.resize((self.height, self.width), Image.BILINEAR), np.uint8)
        robot_state, object_states = _split_structured(obs)
        gt = np.zeros((5, 28))
        gt[0] = robot_state
        for i in range(4):
            gt[i + 1][:10] = object_states[i * 10:(i + 1) * 10]
        return {"image": frame, "robot_state": robot_state,
                "object_states": object_states, "gt": gt}

    def reset(self):
        return self._get_frame(self.env.reset())

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        info = dict(info)
        info["is_success"] = bool(reward > 0)
        return self._get_frame(obs), reward, done, info


class SelectObsKeyWrapper(_Wrapper):
    """reference: target.py:233-240."""

    def __init__(self, env, obs_key):
        super().__init__(env)
        self.obs_key = obs_key
        self.observation_space = env.observation_space[obs_key]
        self.action_space = env.action_space

    def reset(self):
        return self.env.reset()[self.obs_key]

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        return obs[self.obs_key], reward, done, info


class RealCausalWorldBackend:  # pragma: no cover - needs external simulator
    """Adapter over the genuine causal_world CausalWorld env.

    Mirrors MyCausalWorld (reference: cw.py:17-204): pixel mode instantiates
    tool + goal cameras so observations are [6, H, W, 3] with goal silhouettes
    in the second half; structured mode uses the stock observation pipeline.
    """

    def __init__(self, task: SingleFingerReachTask, seed: int = 0,
                 pixel: bool = False):
        from causal_world.envs import CausalWorld

        self._task_logic = task
        self._cw_task = _RealReachTask(task)
        self._env = CausalWorld(
            task=self._cw_task,
            observation_mode="pixel" if pixel else "structured",
            camera_indicies=[0, 1, 2] if pixel else [0],
            skip_frame=10,
            seed=seed,
            enable_visualization=False,
        )

    @property
    def task(self):
        return self._task_logic

    @property
    def stage(self):
        return self._env._task._stage

    def reset(self):
        return self._env.reset()

    def do_intervention(self, interventions):
        self._cw_task.target_obj = self._task_logic.target_obj
        return self._env.do_intervention(interventions)

    def step(self, action9):
        return self._env.step(np.asarray(action9, np.float32))

    def render(self):
        return self._env.render()

    def close(self):
        return self._env.close()


def _RealReachTask(task_logic):  # pragma: no cover - needs external simulator
    """Build the causal_world BaseTask subclass for the real backend, with the
    same reward/done structure as SingleFingerReachTask (reference:
    target.py:405-697)."""
    from causal_world.task_generators.base_task import BaseTask

    class RealSingleFingerReachTask(BaseTask):
        def __init__(self):
            super().__init__(
                task_name="reaching",
                variables_space="space_a_b",
                fractional_reward_weight=1,
                dense_reward_weights=np.array([100000, 0, 0, 0]),
                activate_sparse_reward=task_logic.activate_sparse_reward,
            )
            self._task_robot_observation_keys = [
                "time_left_for_task", "joint_positions", "joint_velocities",
                "end_effector_positions"]
            self._task_params["joint_positions"] = JOINTS_RAISED_POSITIONS
            self.previous_end_effector_positions = None
            self.previous_joint_velocities = None
            self.target_obj = None
            self._finger_idx = task_logic.finger_idx
            self._reach_threshold = task_logic.reach_threshold

        def _set_up_stage_arena(self):
            start = [[0.0, -0.15, 0], [0.2, 0, 0], [-0.2, 0, 0], [0, 0, 0]]
            rgb = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]]
            keys = []
            for i in range(N_OBJECTS):
                self._stage.add_silhoutte_general_object(
                    name=f"obj_{i}", shape="cube",
                    color=np.array(rgb[i]), position=start[i])
                keys += [f"obj_{i}_cartesian_position", f"obj_{i}_type",
                         f"obj_{i}_size", f"obj_{i}_color"]
            self._task_stage_observation_keys = keys

        def get_desired_goal(self):
            if self.target_obj is None:
                return np.array([])
            return np.asarray(self._stage.get_object_state(
                self.target_obj, "cartesian_position"))

        def get_achieved_goal(self):
            return np.array(self._robot.get_latest_full_state()
                            ["end_effector_positions"])

        def _goal_reward(self, achieved_goal, desired_goal):
            i = self._finger_idx * 3
            return np.array(np.mean(np.abs(
                np.asarray(desired_goal) - achieved_goal[i:i + 3])))

        def _check_preliminary_success(self, goal_reward):
            return goal_reward < self._reach_threshold

        def _calculate_fractional_success(self, goal_reward):
            return task_logic.fractional_success(goal_reward)

        def is_done(self):
            ee = self.get_achieved_goal()
            for idx in range(N_OBJECTS):
                pos = self._stage.get_object_state(
                    f"obj_{idx}", "cartesian_position")
                if self._check_preliminary_success(self._goal_reward(ee, pos)):
                    return True
            return False

        def _calculate_dense_rewards(self, desired_goal, achieved_goal):
            i = self._finger_idx * 3
            cur = achieved_goal[i:i + 3]
            prev = self.previous_end_effector_positions[i:i + 3]
            prev_d = np.linalg.norm(desired_goal - prev)
            cur_d = np.linalg.norm(desired_goal - cur)
            state = self._robot.get_latest_full_state()
            rewards = [prev_d - cur_d, -cur_d,
                       -np.linalg.norm(state["torques"]),
                       -np.linalg.norm(np.abs(
                           state["velocities"][i:i + 3] - prev), ord=2)]
            return rewards, {
                "current_end_effector_positions": achieved_goal,
                "current_velocity": state["velocities"]}

        def _update_task_state(self, info):
            self.previous_end_effector_positions = \
                info["current_end_effector_positions"]
            self.previous_joint_velocities = info["current_velocity"]

        def _set_task_state(self):
            state = self._robot.get_latest_full_state()
            self.previous_end_effector_positions = state["end_effector_positions"]
            self.previous_joint_velocities = state["velocities"]

    return RealSingleFingerReachTask()
