#!/usr/bin/env python
"""Snapshot the persistent XLA compile cache into the repo as an AOT
executable pack, or report its state.

The reference project ships a precompiled binary; the TPU-native
analog is shipping the compiled XLA/Mosaic executables for the
headline workloads. Cold Mosaic kernel compiles through the dev-rig
tunnel take minutes each (a wiped-cache `bench.py` run measured ~14
minutes end to end); with the pack seeded, the same run completes in
~3-4 minutes. `saugns_tpu.render.engine._ensure_compile_cache` seeds
the user cache dir from `saugns_tpu/aot/<backend>/` automatically.

Workflow (end of a round, AFTER engine-touching code is frozen):
  1. rm -rf ~/.cache/saugns_tpu_xla/tpu    # optional: prove coldness
  2. python bench.py                        # warms exactly the
                                            # headline executables
  3. python tools/aot_pack.py --snapshot    # copy them into the repo
  4. commit

Usage:
  python tools/aot_pack.py --snapshot [backend]   (default: tpu)
  python tools/aot_pack.py --status   [backend]
"""
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cache_dir(backend):
    return os.path.join(
        os.environ.get('SAUGNS_TPU_CACHE',
                       os.path.expanduser('~/.cache/saugns_tpu_xla')),
        backend)


def pack_dir(backend):
    return os.path.join(REPO, 'saugns_tpu', 'aot', backend)


def _write_manifest(dst, n_entries):
    """MANIFEST.json beside the pack: which rig built it and what the
    warm run covered. XLA cache keys hash rig-specific components
    (backend_version, accelerator_config -- see docs/CACHEKEY.jsonl),
    so the shipped pack is RIG-PINNED: on any other rig the entries
    simply miss and compilation proceeds cold. The manifest makes that
    provenance checkable instead of implicit."""
    import json
    import platform as _plat
    import datetime
    info = {
        'ts': datetime.datetime.now().isoformat(timespec='seconds'),
        'entries': n_entries,
        'host': _plat.node(),
        'covers': 'whatever executables the preceding warm run '
                  'compiled -- the documented workflow is a full '
                  'bench.py run (headline corpus + self-check + poly '
                  '+ corpus_full), see module docstring',
        'rig_pinned': True,
    }
    try:
        import jax
        d = jax.devices()[0]
        info['platform_version'] = getattr(
            d.client, 'platform_version', '?')
        info['device'] = str(d)
    except Exception as e:  # manifest must not block snapshotting
        info['platform_version'] = 'unavailable: %s' % e
    with open(os.path.join(dst, 'MANIFEST.json'), 'w') as f:
        json.dump(info, f, indent=1)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    backend = args[0] if args else 'tpu'
    src, dst = cache_dir(backend), pack_dir(backend)
    if '--snapshot' in sys.argv:
        if not os.path.isdir(src):
            print('no cache at %s' % src)
            return 1
        os.makedirs(dst, exist_ok=True)
        # replace the pack wholesale: stale entries (old code states)
        # would bloat the repo for no benefit
        for fn in os.listdir(dst):
            os.unlink(os.path.join(dst, fn))
        n, total = 0, 0
        for fn in sorted(os.listdir(src)):
            p = os.path.join(src, fn)
            if not os.path.isfile(p):
                continue
            shutil.copyfile(p, os.path.join(dst, fn))
            n += 1
            total += os.path.getsize(p)
        _write_manifest(dst, n)
        print('snapshot: %d entries, %.1f MiB -> %s'
              % (n, total / 2**20, dst))
        return 0
    # --status
    for label, d in (('cache', src), ('pack', dst)):
        if os.path.isdir(d):
            fs = [f for f in os.listdir(d)
                  if os.path.isfile(os.path.join(d, f))]
            sz = sum(os.path.getsize(os.path.join(d, f)) for f in fs)
            print('%s %s: %d entries, %.1f MiB'
                  % (label, d, len(fs), sz / 2**20))
        else:
            print('%s %s: absent' % (label, d))
    return 0


if __name__ == '__main__':
    sys.exit(main())
