import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware; set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE_DIR = os.environ.get("TRUST4_REF_DIR", "/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data directory not available")
    return REFERENCE_DIR


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
