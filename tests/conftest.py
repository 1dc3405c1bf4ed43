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


def _map_budget():
    """jaxlib 0.9's CPU backend segfaults inside
    backend_compile_and_load once the process nears the kernel's
    vm.max_map_count (each compiled executable holds tens to
    thousands of JIT code mappings; one flat-renderer program is
    ~5000 maps). Returns (current, limit)."""
    try:
        with open('/proc/sys/vm/max_map_count') as fh:
            limit = int(fh.read())
        with open('/proc/self/maps') as fh:
            cur = sum(1 for _ in fh)
        return cur, limit
    except OSError:
        return None, None


@pytest.fixture(autouse=True)
def _bound_jax_executables():
    """Keep compiled-executable mappings clear of the segfault zone
    while letting the jit caches persist across tests (the flat
    renderer shares one executable per schedule signature, so cache
    reuse across corpus tests is most of the suite's speed)."""
    yield
    cur, limit = _map_budget()
    import jax
    if cur is None or cur > min(45000, limit * 3 // 5):
        jax.clear_caches()
