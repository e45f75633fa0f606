"""Persistent compilation cache plumbing (utils/compcache.py)."""

import os

from nbody_tpu.utils.compcache import enable_compilation_cache


def test_enable_creates_dir_and_sets_flag(tmp_path, monkeypatch):
    monkeypatch.delenv("NBODY_COMPCACHE", raising=False)
    target = str(tmp_path / "xla_cache")
    out = enable_compilation_cache(target)
    assert out == target
    assert os.path.isdir(target)
    import jax
    assert jax.config.jax_compilation_cache_dir == target


def test_env_off_disables(monkeypatch):
    monkeypatch.setenv("NBODY_COMPCACHE", "off")
    assert enable_compilation_cache() is None


def test_env_path_is_used(tmp_path, monkeypatch):
    target = str(tmp_path / "from_env")
    monkeypatch.setenv("NBODY_COMPCACHE", target)
    assert enable_compilation_cache() == target
    assert os.path.isdir(target)
