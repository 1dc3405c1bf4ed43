#!/usr/bin/env python
"""Record the persistent-compile-cache key components for a canonical
computation, so cross-round/cross-machine cache misses can be
diagnosed by diffing the recorded component hashes.

Round-4 context: the shipped AOT pack (saugns_tpu/aot/tpu) missed
completely on a fresh rig even though the code and jaxlib were
identical -- some component of jax's cache key
(jax/_src/cache_key.py: computation, jaxlib version, backend
version, XLA flags, compile_options, accelerator config, compression,
custom hook) differs across rig instances. This tool hashes each
component separately for a fixed tiny computation and appends the
result to docs/CACHEKEY.jsonl; the first run on a new rig tells you
exactly which component moved.

Usage: python tools/cache_key_probe.py
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# match the engine's environment exactly (XLA flags enter the key)
from saugns_tpu.render import engine as _engine  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax._src import cache_key as ck
from jax._src.lib import xla_client


def main():
    backend = jax.local_devices()[0].client

    def canon(x):
        return jnp.sum(x * 2.0) + jnp.float32(1.0)

    lowered = jax.jit(canon).lower(
        jax.ShapeDtypeStruct((8,), jnp.float32))
    module = lowered._lowering.stablehlo()
    from jax._src import compiler as _compiler
    compile_options = _compiler.get_compile_options(
        num_replicas=1, num_partitions=1,
        device_assignment=np.array([[jax.local_devices()[0].id]]))
    devices = np.array(jax.local_devices()[:1])

    comps = {}

    def h(name, fn):
        o = hashlib.sha256()
        fn(o)
        comps[name] = o.digest().hex()[:16]

    h('computation',
      lambda o: ck._hash_computation(o, module, ck.IgnoreCallbacks.NO))
    from jax._src.lib import version_str as jaxlib_version_str
    h('jaxlib', lambda o: o.update(jaxlib_version_str.encode()))
    h('backend_version', lambda o: ck._hash_platform(o, backend))
    h('xla_flags',
      lambda o: ck._hash_xla_flags(o, ck.get_flag_prefixes()))
    h('compile_options',
      lambda o: ck._hash_serialized_compile_options(
          o, compile_options, strip_device_assignment=False))
    h('accelerator_config',
      lambda o: ck._hash_accelerator_config(o, devices))
    h('compression', lambda o: ck._hash_string(o, 'zstandard'))
    h('custom_hook', lambda o: ck._hash_string(o, ck.custom_hook()))

    rec = {
        'ts': time.strftime('%Y-%m-%dT%H:%M:%S'),
        'platform_version': backend.platform_version,
        'xla_flags_env': os.environ.get('XLA_FLAGS', ''),
        'components': comps,
        'full_key': ck.get(module, devices, compile_options, backend),
    }
    print(json.dumps(rec, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs', 'CACHEKEY.jsonl')
    with open(out, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print('appended to %s' % out, file=sys.stderr)


if __name__ == '__main__':
    main()
