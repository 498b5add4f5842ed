"""Persistent compilation cache helper (utils/compilation_cache.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from perceiverio_pytorch_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)


def test_enable_compilation_cache_writes_entries(tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "xla_cache")
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    old_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        got = enable_compilation_cache(cache_dir, min_compile_time_secs=0.0)
        assert got == cache_dir and os.path.isdir(cache_dir)

        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum()

        out = f(jnp.arange(8, dtype=jnp.float32))
        np.testing.assert_allclose(float(out), 64.0)
        entries = os.listdir(cache_dir)
        assert entries, "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_size)


def test_env_default_dir(tmp_path, monkeypatch):
    target = str(tmp_path / "from_env")
    monkeypatch.setenv("PERCEIVER_CACHE_DIR", target)
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        assert enable_compilation_cache() == target
        assert os.path.isdir(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)
