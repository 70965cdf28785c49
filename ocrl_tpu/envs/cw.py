"""CausalWorld TriFinger reach task (reference: envs/cw_envs/{cw,target}.py).

The reference wraps causal_world + pybullet (external C++ physics).  Those
packages are not available in this image; this module preserves the config
surface (env=cw-target-N4C4S1S1 etc.) and fails with actionable guidance when
the simulator is genuinely required.
"""

from __future__ import annotations

_IMPORT_ERROR = None
try:  # pragma: no cover - causal_world not installed in this image
    import causal_world  # noqa: F401
    import pybullet  # noqa: F401
    _HAVE_CW = True
except Exception as e:  # pragma: no cover
    _HAVE_CW = False
    _IMPORT_ERROR = e


def CwTargetEnv(config, seed):  # noqa: N802 - factory matching the class name
    if not _HAVE_CW:
        raise ImportError(
            "CwTargetEnv requires the 'causal_world' and 'pybullet' packages "
            "(reference: envs/cw_envs/target.py). They are not installed in "
            "this environment; install them to run CausalWorld tasks. All "
            f"synthetic-sprite tasks work without them. ({_IMPORT_ERROR})"
        )
    raise NotImplementedError(
        "CausalWorld wrapper port is pending (external simulator available "
        "but the TriFinger wrapper stack has not been ported yet)."
    )
