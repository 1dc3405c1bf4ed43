"""AOT export store: serialized whole-render executables.

The reference project ships one precompiled binary; the per-script
analog here is a ``jax.export`` artifact of the engine's one-dispatch
render function (engine._mono) for a given (Program IR, sample rate,
engine code state, platform). Loading one skips Python re-tracing
entirely (~2.6 s/script on the example corpus) and, combined with the
persistent XLA compile cache, makes a cold process start a corpus
render at executable-load speed.

Keys are content hashes: the program's canonical serialized IR (name
stripped -- the same script at two paths is one artifact), the sample
rate, the platform, a hash of every source file that shapes the traced
computation (render/ + dsp/ + parallel/), and the trace-shaping env
knobs. Any engine edit or knob change invalidates automatically.

Store layout (first hit wins):
  ~/.cache/saugns_tpu_xla/exports/<platform>/<key>.jaxexp   (user)
  saugns_tpu/aot/exports/<platform>/<key>.jaxexp            (shipped)

Build the shipped pack with tools/export_pack.py.
"""
from __future__ import annotations

import hashlib
import json
import os

_PKG = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sources whose content shapes the traced computation
CODE_DIRS = ('render', 'dsp', 'parallel')
# env knobs that alter the traced graph (values folded into the key);
# the cache/backend knobs don't shape the trace and are excluded
TRACE_ENVS = ('SAUGNS_TPU_FLAT', 'SAUGNS_TPU_FUSED',
              'SAUGNS_TPU_FUSED_FILL', 'SAUGNS_TPU_FUSED_OSC',
              'SAUGNS_TPU_GROUP_SEGS', 'SAUGNS_TPU_LEVELBATCH',
              'SAUGNS_TPU_MXU_SCAN', 'SAUGNS_TPU_PALLAS_SCAN',
              'SAUGNS_TPU_TAPKERNEL', 'SAUGNS_TPU_FFILL_FAST',
              'SAUGNS_TPU_DEBUG_BUFS', 'SAUGNS_TPU_TAPS4')

_code_hash_cache = None


def code_hash():
    global _code_hash_cache
    if _code_hash_cache is None:
        h = hashlib.sha256()
        for d in CODE_DIRS:
            p = os.path.join(_PKG, d)
            if not os.path.isdir(p):
                continue
            for fn in sorted(os.listdir(p)):
                if fn.endswith(('.py', '.c')):
                    h.update(fn.encode())
                    with open(os.path.join(p, fn), 'rb') as f:
                        h.update(f.read())
        _code_hash_cache = h.hexdigest()[:16]
    return _code_hash_cache


def program_key(prg, srate, kind='mono'):
    """Content key for one render executable."""
    from ..lang.serialize import program_to_dict
    d = program_to_dict(prg)
    d.pop('name', None)
    h = hashlib.sha256()
    h.update(json.dumps(d, sort_keys=True).encode())
    h.update(('|%d|%s|%s' % (srate, kind, code_hash())).encode())
    for e in TRACE_ENVS:
        h.update(('|%s=%s' % (e, os.environ.get(e, ''))).encode())
    return h.hexdigest()[:24]


def _user_dir(platform):
    root = os.environ.get('SAUGNS_TPU_CACHE',
                          os.path.expanduser('~/.cache/saugns_tpu_xla'))
    return os.path.join(root, 'exports', platform)


def _pack_dir(platform):
    return os.path.join(_PKG, 'aot', 'exports', platform)


def enabled():
    return os.environ.get('SAUGNS_TPU_EXPORT', '1') == '1'


def load(key, platform):
    """Deserialized ``jax.export.Exported`` for ``key``, or None."""
    if not enabled():
        return None
    import jax.export
    for d in (_user_dir(platform), _pack_dir(platform)):
        p = os.path.join(d, key + '.jaxexp')
        if os.path.isfile(p):
            try:
                with open(p, 'rb') as f:
                    return jax.export.deserialize(bytearray(f.read()))
            except Exception:
                # stale/corrupt artifact: fall back to tracing
                continue
    return None


def save(key, platform, exported):
    d = _user_dir(platform)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, key + '.jaxexp')
    tmp = p + '.tmp.%d' % os.getpid()
    with open(tmp, 'wb') as f:
        f.write(exported.serialize())
    os.replace(tmp, p)
    return p
