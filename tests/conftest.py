"""Test configuration.

Intent: run tests on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, SURVEY.md §4).

Caveat for this machine: the axon sitecustomize imports jax at interpreter
boot and pins the TPU backend, so in-process env vars cannot switch the
platform.  Use scripts/run_tests_cpu.sh to get the scrubbed-env CPU run;
under the default env the suite runs on the single TPU chip and
device-count-dependent tests skip themselves.
"""

import os
from pathlib import Path

# Effective only when the interpreter was started without the axon
# sitecustomize (e.g. scripts/run_tests_cpu.sh) or on machines without it.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: when the suite runs on the TPU backend
# (default env on this machine), repeated runs skip the remote compiles.
try:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
