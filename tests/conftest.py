"""Test configuration: CPU backend with 8 virtual devices and float64.

The reference validates in float64 against Eigen oracles (main.cpp
test battery, SURVEY.md §4). We validate in complex128 on the CPU backend
(bit-comparable precision) and fake an 8-device mesh for the multi-chip
sharding tests, per the framework's test strategy.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# this environment pre-imports jax with a TPU platform pinned via env, so
# env vars alone are too late — force the config directly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MATRIX = os.environ.get(
    "MGPGCR_REFERENCE_MATRIX",
    "/root/reference/data/sample_matrix/4x4parsed.txt",
)


@pytest.fixture(scope="session")
def dirac44_csr():
    """The reference's checked-in 4^4 Wilson--Dirac hopping matrix D
    (3072 x 3072, nnz = 119,808, 39 nnz/row; critical k = 0.20611)."""
    if not os.path.exists(REFERENCE_MATRIX):
        pytest.skip("reference 4x4 fixture not available")
    from mgpgcr_tpu.io.parsed_txt import read_parsed_txt

    return read_parsed_txt(REFERENCE_MATRIX)


@pytest.fixture(scope="session")
def dirac44_ell(dirac44_csr):
    return dirac44_csr.to_ell()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
