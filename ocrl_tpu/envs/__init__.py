"""Environment registry (reference: envs/__init__.py).

Synthetic sprite envs are first-class; the CausalWorld robotics env requires
the external causal_world/pybullet packages and is exposed lazily so the rest
of the framework works without them.
"""

from .base import BaseEnv, COLORS, SHAPES, SCALES
from .tasks import TargetEnv, OddOneOutEnv, PushEnv, MazeEnv, RandomObjsEnv


def __getattr__(name):
    if name == "CwTargetEnv":
        from .cw import CwTargetEnv  # may raise ImportError with guidance
        return CwTargetEnv
    raise AttributeError(f"module 'ocrl_tpu.envs' has no attribute '{name}'")


__all__ = [
    "BaseEnv", "TargetEnv", "OddOneOutEnv", "PushEnv", "MazeEnv",
    "RandomObjsEnv", "CwTargetEnv", "COLORS", "SHAPES", "SCALES",
]
