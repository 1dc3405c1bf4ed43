#!/usr/bin/env python
"""Device-trace profiler for the JAX engine.

Renders a script once (steady-state), captures a profiler trace, and
prints device-kernel time grouped by kernel name. Usage:

    python tools/trace_engine.py [script.sau] [srate]
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 \
        else '/root/reference/examples/rainy_thunder.sau'
    srate = int(sys.argv[2]) if len(sys.argv) > 2 else 96000
    import jax
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.engine import JaxGenerator
    from saugns_tpu.render import jdsp
    jdsp.get_tables()
    prg = build_program(ScriptArg(str=path, is_path=True, no_time=True,
                                  predef=[]))
    g = JaxGenerator(prg, srate)
    jax.block_until_ready(g.render_device())  # compile+warm
    t0 = time.time()
    jax.block_until_ready(g.render_device())
    wall = time.time() - t0
    audio = g.plan.signal_end / srate
    print('# wall %.3fs RTF %.1f  (%d epochs)'
          % (wall, audio / wall, len(g.plan.epochs)))

    tdir = tempfile.mkdtemp(prefix='saugns_trace_')
    with jax.profiler.trace(tdir):
        jax.block_until_ready(g.render_device())
    files = glob.glob(os.path.join(
        tdir, 'plugins/profile/*/*.trace.json.gz'))
    if not files:
        print('no trace file found under', tdir)
        return
    with gzip.open(files[0], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device-side complete events: pid of TPU device tracks
    pids_dev = set()
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            n = e['args'].get('name', '')
            if 'TPU' in n or 'tpu' in n or '/device' in n.lower():
                pids_dev.add(e['pid'])
    # container thunks (jit_*, while, closed_call, conditional) nest
    # the real kernels; counting both double-books the time. Keep only
    # LEAF events: events with no other event strictly inside them on
    # the same track.
    CONTAINERS = ('jit_', 'while', 'body', 'cond_wrapper')
    # NOTE: closed_call kept -- the Pallas tap-gather kernel reports
    # as a closed_call leaf; conditional kept likewise (lax.cond
    # thunk time is real even when the taken branch is trivial).
    by_name = {}
    total = 0.0
    tmin, tmax = float('inf'), 0.0
    n_ev = 0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in pids_dev:
            continue
        name = e.get('name', '?')
        if any(name.startswith(c) for c in CONTAINERS):
            continue
        dur = e.get('dur', 0) / 1e3  # ms
        key = name.split('.')[0]
        by_name[key] = by_name.get(key, [0.0, 0])
        by_name[key][0] += dur
        by_name[key][1] += 1
        total += dur
        n_ev += 1
        ts = e.get('ts', 0)
        tmin = min(tmin, ts)
        tmax = max(tmax, ts + e.get('dur', 0))
    span = (tmax - tmin) / 1e3 if n_ev else 0.0
    print('# device busy %.1f ms, span %.1f ms, %d kernel execs, '
          'gaps %.1f ms' % (total, span, n_ev, span - total))
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    for name, (ms, cnt) in rows[:28]:
        print('%9.2f ms %7d x  %s' % (ms, cnt, name[:90]))


if __name__ == '__main__':
    main()
