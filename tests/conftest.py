import os

# Tests run on the CPU platform with a virtual 8-device mesh for the
# multi-device cases. Forced (not setdefault): the dev rig exports
# JAX_PLATFORMS=axon, which would silently move the whole suite onto
# the shared TPU. Note the JAX_PLATFORMS *env var* path ignores
# --xla_force_host_platform_device_count (observed on jax 0.9 with
# the axon plugin installed); jax.config.update('jax_platforms')
# honors it, so the platform is pinned through the config API.
os.environ['XLA_FLAGS'] = (
    '--xla_force_host_platform_device_count=8 '
    + os.environ.get('XLA_FLAGS', '').replace(
        '--xla_force_host_platform_device_count=8', '')).strip()
os.environ.pop('JAX_PLATFORMS', None)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

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


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between tests. jaxlib 0.9's CPU
    backend segfaults inside backend_compile_and_load after enough
    flat-renderer executables accumulate in one process (reproduced
    deterministically with test_engine + test_engine_corpus in
    sequence; each module passes alone). Clearing after every test
    keeps the live-executable count bounded; programs are compiled
    once per test anyway, so the cost is minor."""
    yield
    import jax
    jax.clear_caches()
