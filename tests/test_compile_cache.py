"""Persistent compilation cache plumbing (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp
import pytest

from horizonnet_tpu.utils import enable_compilation_cache


@pytest.fixture(scope="module")
def session_cache_dir(tmp_path_factory):
    """Session-lifetime dir: the jax config is process-global, so the
    directory must outlive these tests (later suite compiles may still
    write to it). Every test here re-points the config to it on exit."""
    return str(tmp_path_factory.mktemp("xla_cache"))


def test_enable_compilation_cache_writes_entries(session_cache_dir):
    path = session_cache_dir
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


def test_env_var_precedence(monkeypatch, tmp_path, session_cache_dir):
    explicit = str(tmp_path / "explicit")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    assert enable_compilation_cache(explicit) == explicit
    assert enable_compilation_cache() == str(tmp_path / "env")
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    # Hermetic default-path check: point HOME at tmp so the test never
    # creates or writes the developer's real ~/.cache
    monkeypatch.setenv("HOME", str(tmp_path))
    default = enable_compilation_cache()
    assert os.path.join(".cache", "horizonnet_tpu", "xla-") in default
    assert default.startswith(str(tmp_path))
    # Leave the process-global config on the session-lifetime dir, not
    # on tmp dirs pytest is about to delete
    enable_compilation_cache(session_cache_dir)
