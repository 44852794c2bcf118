"""Persistent-compilation-cache wiring (utils/compilecache.py).

The cache itself is jax's; what we own — and pin here — is the wiring:
the directory resolution order, idempotence, and that a compile actually
populates the directory (so a retried bench/training session gets hits).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from pcss_unet_tpu.utils.compilecache import enable_persistent_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      before_min)


def test_enable_persistent_cache_explicit_path(tmp_path):
    d = str(tmp_path / "cache")
    got = enable_persistent_cache(d, min_compile_secs=0.0)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # a real compile persists an executable into the directory
    f = jax.jit(lambda x: jnp.tanh(x @ x.T) @ x)
    f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
    assert any(n.endswith("-cache") for n in os.listdir(d))


def test_enable_persistent_cache_env_fallback(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d)
    assert enable_persistent_cache() == d
    assert os.path.isdir(d)


def test_enable_persistent_cache_idempotent(tmp_path):
    d = str(tmp_path / "twice")
    assert enable_persistent_cache(d) == enable_persistent_cache(d)
