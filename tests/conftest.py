"""Test harness config: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU pod in CI);
single-chip engines run on CPU too for hermetic, fast tests.  Real-TPU
execution is exercised by bench.py / __graft_entry__.py.

Note: the session environment pins JAX_PLATFORMS=axon (TPU tunnel) in a way
that survives os.environ overrides, so we must force CPU via jax.config
BEFORE any backend initialization.
"""

import os

os.environ.setdefault("QSIM_NO_COMPILE_CACHE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
