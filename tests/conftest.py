"""Test configuration: CPU backend, f64, 8 virtual devices for sharding tests.

Mirrors the reference's CI strategy (SURVEY.md §4): distributed correctness
is checked by partition invariance on an oversubscribed single host
(`mpirun -n 2|4` there; an 8-device virtual CPU mesh here).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if os.environ.get("AFEM_TEST_TPU") == "1":
    # run the `-k on_tpu` kernel tests on the real backend (f32): the
    # unconditional CPU pin below otherwise makes their skipif always fire
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    return REFERENCE
