"""Persistent-compilation-cache wiring (utils/compilecache.py).

The cache itself is jax's; what we own — and pin here — is the wiring:
the directory resolution order, idempotence, and that a compile actually
populates the directory (so a retried bench/training session gets hits).

The compile-persists test runs in a SUBPROCESS: jax's compilation-cache
singleton is initialized once per process on first use, so after another
test (or conftest) has enabled a different directory, a config update in
this process would redirect the *config* but not the initialized cache —
the assertion would see writes landing in the earlier path.  A fresh
interpreter is the only ordering-proof way to observe first-use wiring.
"""

import os
import subprocess
import sys
import textwrap

import jax
import pytest

from pcss_unet_tpu.utils.compilecache import enable_persistent_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    child = textwrap.dedent(f"""
        import os, sys
        sys.path.insert(0, {REPO!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
        d = {d!r}
        got = enable_persistent_cache(d, min_compile_secs=0.0)
        assert got == d and os.path.isdir(d), got
        assert jax.config.jax_compilation_cache_dir == d
        # a real compile persists an executable into the directory
        f = jax.jit(lambda x: jnp.tanh(x @ x.T) @ x)
        f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
        assert any(n.endswith("-cache") for n in os.listdir(d)), \\
            os.listdir(d)
        print("CACHE_OK")
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # strip the TPU-tunnel plugin triggers so the child stays on CPU and
    # never dials the tunnel (same pattern as tests/test_multihost.py)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "PJRT_LIBRARY_PATH", "JAX_COMPILATION_CACHE_DIR"):
        env.pop(var, None)
    p = subprocess.run([sys.executable, "-c", child], env=env,
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "CACHE_OK" in p.stdout


def test_enable_persistent_cache_env_fallback(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d)
    assert enable_persistent_cache() == d
    assert os.path.isdir(d)


def test_enable_persistent_cache_idempotent(tmp_path):
    d = str(tmp_path / "twice")
    assert enable_persistent_cache(d) == enable_persistent_cache(d)
