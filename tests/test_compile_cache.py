"""Persistent-compile-cache gating logic (no backend interaction)."""

import importlib

import pytest


def _fresh(monkeypatch):
    from gpu_quantum_simulator_tpu.utils import compile_cache as cc
    importlib.reload(cc)
    return cc


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("QSIM_NO_COMPILE_CACHE", "1")
    cc = _fresh(monkeypatch)
    assert cc.enable_persistent_cache() is None


def test_disabled_on_cpu_platform(monkeypatch):
    monkeypatch.delenv("QSIM_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    cc = _fresh(monkeypatch)
    assert cc.enable_persistent_cache() is None


def test_disabled_on_cpu_config_override(monkeypatch):
    # the hermetic conftest forces CPU via jax.config.update, NOT the env
    # var — the gate must still refuse to persist CPU executables
    monkeypatch.delenv("QSIM_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    cc = _fresh(monkeypatch)
    assert cc._effective_cpu()
    assert cc.enable_persistent_cache() is None


def test_custom_dir(monkeypatch, tmp_path):
    monkeypatch.delenv("QSIM_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("QSIM_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
    cc = _fresh(monkeypatch)
    monkeypatch.setattr(cc, "_effective_cpu", lambda: False)
    import jax

    try:
        out = cc.enable_persistent_cache()
        assert out == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()
    finally:
        # don't leave the session pointed at a soon-deleted tmp dir
        jax.config.update("jax_compilation_cache_dir", None)
