import os

# Multi-device tests use a virtual 8-device CPU mesh; must be set before
# jax import anywhere in the test process.
os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=8')
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import pytest  # noqa: E402

REFERENCE = '/root/reference'


def has_reference():
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope='session')
def reference_dir():
    if not has_reference():
        pytest.skip('reference corpus not available')
    return REFERENCE
