"""Persistent XLA compilation cache setup.

The reference pays its compile cost once, at ``nvcc`` time, and every
subsequent process start is cheap; a JAX process by default re-compiles
every executable it traces.  On the target environment remote TPU
compiles are the single largest cold-start cost (minutes for deep
programs), so the library enables JAX's persistent compilation cache by
default: compiled executables are serialized to a local directory and
reloaded byte-identical by later processes.

Opt out with ``QSIM_NO_COMPILE_CACHE=1``; point the cache elsewhere with
``QSIM_COMPILE_CACHE_DIR``.
"""

import os

_DONE = False


def _effective_cpu() -> bool:
    """True when this process compiles for CPU — via the env var OR the
    jax.config override (on this target JAX_PLATFORMS is pinned to the
    remote backend and CPU is forced with
    ``jax.config.update('jax_platforms', 'cpu')``, so the env var alone is
    not authoritative)."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True
    import jax

    eff = (getattr(jax.config, "jax_platforms", None) or "").strip().lower()
    return eff == "cpu" or eff.startswith("cpu,")


def enable_persistent_cache() -> str | None:
    """Idempotently enable the JAX persistent compilation cache.

    Returns the cache directory, or None when disabled by env.  Safe to
    call before or after backend initialization (the cache-dir config is
    consulted at compile time, not at backend-init time).
    """
    global _DONE
    if os.environ.get("QSIM_NO_COMPILE_CACHE"):
        return None
    # CPU executables are AOT-compiled against the build host's machine
    # features; persisting them risks SIGILL when the cache directory is
    # shared across hosts (and hermetic CPU tests don't want disk state
    # anyway).  Cache only device-backend (TPU) executables.  The env var
    # alone is not authoritative here: on this target JAX_PLATFORMS is
    # pinned to the remote backend and CPU is forced via
    # jax.config.update("jax_platforms", "cpu"), so consult the effective
    # jax config too.
    if _effective_cpu():
        return None
    default = os.path.join(
        os.path.expanduser("~"), ".cache", "qsim_tpu_xla_cache")
    cache_dir = os.environ.get("QSIM_COMPILE_CACHE_DIR", default)
    if _DONE:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: on this target even sub-second compiles cost a
    # remote round-trip, and the executables are small.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _DONE = True
    return cache_dir
