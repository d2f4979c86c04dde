"""Persistent compilation cache plumbing (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp

from horizonnet_tpu.utils import enable_compilation_cache


def test_enable_compilation_cache_writes_entries(tmp_path_factory):
    # session-lifetime dir: the config is process-global, so it must
    # outlive this test (later suite compiles may still write to it)
    path = str(tmp_path_factory.mktemp("xla_cache"))
    assert enable_compilation_cache(path) == path

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    f(jnp.ones((256, 256))).block_until_ready()
    assert os.path.isdir(path)
    # Entry names are hash-keyed; presence of any file = cache active
    # (min_compile_time 0.2s means tiny programs may legitimately skip
    # the write, so only require the directory to be usable, and the
    # second call to be idempotent)
    assert enable_compilation_cache(path) == path


def test_env_var_precedence(monkeypatch, tmp_path):
    explicit = str(tmp_path / "explicit")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    assert enable_compilation_cache(explicit) == explicit
    assert enable_compilation_cache() == str(tmp_path / "env")
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    default = enable_compilation_cache()
    assert os.path.join(".cache", "horizonnet_tpu", "xla-") in default
