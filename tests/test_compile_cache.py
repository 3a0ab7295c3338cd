"""Persistent XLA compilation cache (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp
import pytest

from nlspn_eccv20_tpu.utils import compile_cache
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """These tests flip process-global jax config; undo afterwards."""
    saved = {k: getattr(jax.config, k) for k in
             ("jax_compilation_cache_dir",
              "jax_persistent_cache_min_compile_time_secs",
              "jax_persistent_cache_min_entry_size_bytes")}
    yield
    for k, v in saved.items():
        jax.config.update(k, v)
    compile_cache._enabled_dir = None


def test_cache_populates_and_hits(tmp_path):
    d = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(d) == d
    assert os.path.isdir(d)
    # The production threshold (2 s) skips toy programs; drop it so this
    # test exercises the write+read path cheaply.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    f = jax.jit(lambda a: (a @ a.T).sum() * 3)
    x = jnp.ones((64, 64))
    expect = float(f(x))
    entries = os.listdir(d)
    assert entries, "compiled executable was not persisted"

    # A fresh trace/compile of the same program must load from the cache
    # (and still compute the right thing).
    jax.clear_caches()
    g = jax.jit(lambda a: (a @ a.T).sum() * 3)
    assert float(g(x)) == expect
    assert set(os.listdir(d)) == set(entries), "cache hit should not re-write"


def test_env_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("NLSPN_COMPILE_CACHE", "0")
    assert enable_compilation_cache(str(tmp_path / "nope")) is None
    assert not os.path.exists(str(tmp_path / "nope"))


def test_idempotent(tmp_path):
    d = str(tmp_path / "xla_cache2")
    assert enable_compilation_cache(d) == d
    assert enable_compilation_cache(d) == d
