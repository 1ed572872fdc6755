"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference test strategy (SURVEY.md §4): deterministic inputs,
session-cached keys per parameter set (the LazyLock KEYS_* pattern,
shortint_woppbs_1bit.rs:430-445), and a multi-device mesh without TPU pods via
xla_force_host_platform_device_count.
"""

import os

# The deployment environment exports JAX_PLATFORMS=axon (a tunneled TPU) and a
# sitecustomize that imports jax before conftest runs, so plain env overrides
# are too late — update the live jax config instead. Tests always run on the
# CPU backend with 8 virtual devices; the TPU is exercised by bench.py and
# __graft_entry__.py.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

import tfhe_aes2_tpu  # noqa: E402,F401  (enables x64)
from tfhe_aes2_tpu.ops import keys as keys_mod  # noqa: E402
from tfhe_aes2_tpu.ops.params import PARAMS_TEST, PARAMS_TEST_N256  # noqa: E402

_KEY_CACHE = {}


def _keys_for(params, seed=7):
    key = (id(params), seed)
    if key not in _KEY_CACHE:
        _KEY_CACHE[key] = keys_mod.generate_keys(params, seed=seed)
    return _KEY_CACHE[key]


@pytest.fixture(scope="session")
def keys_test():
    """(ClientKey, ServerKeySet) for the small test parameter set."""
    return _keys_for(PARAMS_TEST)


@pytest.fixture(scope="session")
def keys_test_n256():
    """(ClientKey, ServerKeySet) for the N=256 test parameter set."""
    return _keys_for(PARAMS_TEST_N256)
