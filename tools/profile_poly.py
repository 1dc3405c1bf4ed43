#!/usr/bin/env python
"""Capture a device trace of the 1024-voice bank render and summarize
per-kernel time from the trace events. Usage:
python tools/profile_poly.py [n_voices] [duration_s]"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import saugns_tpu  # noqa: F401
import jax

SRATE = 96000
TRACE_DIR = '/tmp/poly_trace'


def main():
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.parallel.voicebank import (BankRender,
                                               make_bank_script)
    src = make_bank_script(nv, seed=1, duration=dur)
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    bank = BankRender(prg, SRATE, mesh=None, ordered_mix=False)
    jax.block_until_ready(bank.render_i16())
    t0 = time.time()
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(bank.render_i16())
    wall = time.time() - t0
    print('traced pass %.3fs' % wall, flush=True)

    files = glob.glob(os.path.join(
        TRACE_DIR, '**', '*.trace.json.gz'), recursive=True)
    if not files:
        print('no trace files found under', TRACE_DIR)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    # find device-lane events (TensorCore pids)
    pid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
    dev_pids = {p for p, n in pid_names.items()
                if 'TPU' in n or 'Device' in n or '/device' in n.lower()}
    agg = defaultdict(lambda: [0, 0.0])
    lanes = defaultdict(list)
    for e in events:
        if e.get('ph') != 'X':
            continue
        if dev_pids and e.get('pid') not in dev_pids:
            continue
        name = e.get('name', '?')
        d = e.get('dur', 0) / 1e6
        agg[name][0] += 1
        agg[name][1] += d
        lanes[(e.get('pid'), e.get('tid'))].append(
            (e.get('ts', 0), e.get('dur', 0)))
    total_busy = 0.0
    n_exec = 0
    # busy/gap per lane: use the busiest lane as the kernel stream
    best = None
    for k, v in lanes.items():
        busy = sum(d for _t, d in v) / 1e6
        if best is None or busy > best[1]:
            best = (k, busy, v)
    if best is not None:
        k, busy, v = best
        v.sort()
        span = (v[-1][0] + v[-1][1] - v[0][0]) / 1e6
        print('busiest lane %s: %d events, busy %.3fs, span %.3fs, '
              'gaps %.3fs' % (k, len(v), busy, span, span - busy))
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
    print('%-64s %8s %9s' % ('kernel', 'count', 'total_s'))
    for name, (c, t) in rows:
        total_busy += t
        n_exec += c
        print('%-64s %8d %9.4f' % (name[:64], c, t))
    print('TOTAL (top40): %d execs, %.3fs' % (n_exec, total_busy))


if __name__ == '__main__':
    main()
