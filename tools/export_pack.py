#!/usr/bin/env python
"""Build / snapshot the AOT export pack (render/aotstore.py).

Phase 1 (``--build``): for every renderable script in the reference
examples corpus (plus the Wsin smoke config), trace + lower the
engine's one-dispatch render function and store the ``jax.export``
artifact in the user export cache. Pure host work -- nothing executes
on the device, so it is immune to dev-rig tunnel weather -- but it
MUST run with the target platform selected (the engine picks Pallas
vs pure-jnp paths by platform at trace time).

Phase 2 (``--snapshot``): copy the user export cache into the repo at
saugns_tpu/aot/exports/<platform>/ and write MANIFEST.json recording
exactly which scripts each artifact covers (the pack is useless to
audit otherwise).

Usage:
  python tools/export_pack.py --build [--platform tpu]
  python tools/export_pack.py --snapshot [--platform tpu]
  python tools/export_pack.py --status [--platform tpu]
"""
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_GLOB = '/root/reference/examples/**/*.sau'
EXTRA_CONFIGS = [('wsin', 'Wsin', False)]


def corpus_configs():
    cfgs = [(os.path.relpath(p, '/root/reference'), p, True)
            for p in sorted(glob.glob(CORPUS_GLOB, recursive=True))]
    return cfgs + EXTRA_CONFIGS


def build(platform):
    import jax
    if platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render import aotstore
    from saugns_tpu.render.engine import JaxGenerator
    live = jax.default_backend()
    print('# building exports for platform %r (code %s)'
          % (live, aotstore.code_hash()), flush=True)
    os.environ.setdefault('SAUGNS_TPU_MONO', 'force')
    built = skipped = failed = 0
    entries = []
    for name, src, is_path in corpus_configs():
        prg = build_program(ScriptArg(str=src, is_path=is_path,
                                      no_time=True, predef=[]))
        if prg is None or prg.name is None or not prg.events:
            print('  skip (no program): %s' % name, flush=True)
            continue
        key = aotstore.program_key(prg, 96000)
        dst = os.path.join(aotstore._user_dir(live), key + '.jaxexp')
        if os.path.isfile(dst):
            skipped += 1
            entries.append({'script': name, 'key': key})
            continue
        t0 = time.time()
        try:
            g = JaxGenerator(prg, 96000)
            p = g.save_export()
        except Exception as e:
            print('  FAIL %-44s %s' % (name, e), flush=True)
            failed += 1
            continue
        if p is None:
            print('  skip (no mono path): %s' % name, flush=True)
            continue
        built += 1
        entries.append({'script': name, 'key': key})
        print('  %-44s %6.2fs %8d B' % (name, time.time() - t0,
                                        os.path.getsize(p)),
              flush=True)
    print('# built %d, already present %d, failed %d'
          % (built, skipped, failed), flush=True)
    man = {'platform': live, 'code_hash': aotstore.code_hash(),
           'srate': 96000, 'entries': entries}
    mp = os.path.join(aotstore._user_dir(live), 'MANIFEST.json')
    os.makedirs(os.path.dirname(mp), exist_ok=True)
    with open(mp, 'w') as f:
        json.dump(man, f, indent=1)
    return 0 if failed == 0 else 1


def snapshot(platform):
    from saugns_tpu.render import aotstore
    src = aotstore._user_dir(platform)
    dst = aotstore._pack_dir(platform)
    if not os.path.isdir(src):
        print('no export cache at %s' % src)
        return 1
    # copy only artifacts the MANIFEST (written by --build for the
    # CURRENT code hash) names -- the user cache accumulates exports
    # from earlier code states that can never load again
    mp = os.path.join(src, 'MANIFEST.json')
    keep = None
    if os.path.isfile(mp):
        with open(mp) as f:
            man = json.load(f)
        keep = {e['key'] + '.jaxexp' for e in man.get('entries', [])}
        keep.add('MANIFEST.json')
    os.makedirs(dst, exist_ok=True)
    for fn in os.listdir(dst):
        os.unlink(os.path.join(dst, fn))
    n = total = 0
    for fn in sorted(os.listdir(src)):
        p = os.path.join(src, fn)
        if os.path.isfile(p) and (keep is None or fn in keep):
            shutil.copyfile(p, os.path.join(dst, fn))
            n += 1
            total += os.path.getsize(p)
    print('snapshotted %d files (%.1f MiB) -> %s'
          % (n, total / 2**20, dst))
    return 0


def status(platform):
    from saugns_tpu.render import aotstore
    for label, d in (('user', aotstore._user_dir(platform)),
                     ('pack', aotstore._pack_dir(platform))):
        if os.path.isdir(d):
            fs = [f for f in os.listdir(d) if f.endswith('.jaxexp')]
            print('%s: %d artifacts at %s' % (label, len(fs), d))
        else:
            print('%s: none at %s' % (label, d))
    return 0


def main():
    platform = 'tpu'
    if '--platform' in sys.argv:
        platform = sys.argv[sys.argv.index('--platform') + 1]
    if '--build' in sys.argv:
        return build(platform)
    if '--snapshot' in sys.argv:
        return snapshot(platform)
    return status(platform)


if __name__ == '__main__':
    sys.exit(main())
