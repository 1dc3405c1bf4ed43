#!/usr/bin/env python
"""Compare the flat (time-parallel) renderer against the sequential
engine, asserting bit-identical int16 output."""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

SCRIPTS = [
    ('inline', 'Wsin'),
    ('inline-pm', 'Wsin f500 p[Wsin f120 a.7]'),
    ('path', '/root/reference/examples/simple_sequence-pm.sau'),
    ('path', '/root/reference/examples/misc1-4fm_pm.sau'),
    ('path', '/root/reference/examples/rainy_thunder.sau'),
    ('path', '/root/reference/examples/tests/line_noisy.sau'),
    ('path', '/root/reference/examples/halfrect_ringmod.sau'),
    ('path', '/root/reference/examples/tests/hearingrange.sau'),
    ('path', '/root/reference/examples/sounds/voicelike-Rcos_rm.sau'),
    ('path', '/root/reference/examples/tests/through-zero-morph.sau'),
    ('path', '/root/reference/examples/tests/wavetypes.sau'),
    ('path', '/root/reference/examples/tests/sin_ramp_f-exp_log.sau'),
    ('path', '/root/reference/examples/tests/addrec15rand.sau'),
    ('path', '/root/reference/devtests/voice-reuse.sau'),
    ('path', '/root/reference/devtests/compnest.sau'),
    ('path', '/root/reference/examples/sounds/waves_n_noise.sau'),
    ('path', '/root/reference/examples/tests/noisetypes.sau'),
]


def render(prg, srate, flat):
    os.environ['SAUGNS_TPU_FLAT'] = '1' if flat else '0'
    from saugns_tpu.render.engine import JaxGenerator
    g = JaxGenerator(prg, srate)
    chunks = []
    buf = np.zeros(4096 * 2, dtype=np.int16)
    while True:
        more, n = g.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks) if chunks else np.zeros(0, np.int16)


def main():
    from saugns_tpu.lang.program import ScriptArg, build_program
    srate = int(os.environ.get('SRATE', '6000'))
    bad = 0
    for kind, src in SCRIPTS:
        is_path = kind == 'path'
        if is_path and not os.path.exists(src):
            continue
        prg = build_program(ScriptArg(str=src, is_path=is_path,
                                      no_time=True, predef=[]))
        if prg is None:
            print('PARSE FAIL', src)
            bad += 1
            continue
        a = render(prg, srate, flat=False)
        b = render(prg, srate, flat=True)
        name = os.path.basename(src) if is_path else repr(src)
        if a.shape != b.shape:
            print('%-34s SHAPE %s vs %s' % (name, a.shape, b.shape))
            bad += 1
        elif not np.array_equal(a, b):
            d = np.nonzero(a != b)[0]
            mx = np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
            print('%-34s DIFF %d/%d samples, max %d, first at %d'
                  % (name, len(d), len(a), mx, d[0]))
            bad += 1
        else:
            print('%-34s OK (%d samples)' % (name, len(a)))
    print('bad:', bad)
    sys.exit(1 if bad else 0)


if __name__ == '__main__':
    main()
