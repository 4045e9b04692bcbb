"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding (pjit over a Mesh) is exercised without TPU hardware — the
"multi-node without a real cluster" mechanism (SURVEY.md §4).

Must set XLA flags before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# ('axon'), which has one chip and slow first-compiles; tests want 8 virtual
# CPU devices. The axon site-package overrides the env var at jax import, so
# we ALSO call jax.config.update below after importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402

# Persistent compilation cache: XLA compiles dominate test wall-clock on the
# single-core CPU runner; cache them across runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def fixtures_path() -> Path:
    return Path(__file__).parent / "fixtures"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow tests (real-model integration)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
