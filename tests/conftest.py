"""Test harness configuration.

All tests run on the CPU backend with 8 virtual XLA devices — the
fake-backend pattern the reference lacks entirely (SURVEY.md §4: "no
multi-node anything") — so multi-chip sharding tests execute without TPU
hardware.  The flags must land before the CPU client initializes; on images
where a TPU plugin grabs the default backend at interpreter start we pin
every test onto CPU devices explicitly via an autouse fixture.
"""

import os

# Must be set before jax creates its CPU client.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env var above is not enough on images where a TPU-tunnel plugin
# registers itself at interpreter start (sitecustomize) and force-updates
# the jax_platforms *config* to "axon,cpu" — overriding JAX_PLATFORMS and
# dialing the (possibly unreachable) tunnel at first backend init, which
# hangs the whole suite.  Re-pin the config before anything touches a
# backend; config updates win over the plugin's as long as they land
# before init.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # older jax spelling; the env var already covers it
    pass


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def cpus():
    devs = cpu_devices()
    assert len(devs) >= 8, f"expected >=8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="session", autouse=True)
def _pin_to_cpu():
    """Run the whole test session with CPU as the default device, even if a
    TPU plugin claimed the default backend.  Session-scoped so it wraps
    module/session fixtures too (a function-scoped pin would let
    module-scoped fixtures allocate on the TPU first)."""
    with jax.default_device(cpu_devices()[0]):
        yield


@pytest.fixture(scope="session")
def mesh8(cpus):
    from jax.sharding import Mesh

    return Mesh(np.array(cpus[:8]).reshape(4, 2), ("data", "spatial"))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
