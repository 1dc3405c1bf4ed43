#!/usr/bin/env python
"""Validate + time the TPU self-PM scan (jdsp.wosc_selfmod_scan df64
branch) on the REAL chip against the CPU oracle.

The feedback loop (wosc.h:273-310) accumulates each sample's error
into the next sample's phase, so the per-sample df64 bound from
tools/validate_df64.py does not transfer automatically; this renders
a full self-PM script (examples/sounds/pm_feedback_pm.sau) on the TPU
and SNR-gates it against the NumPy host backend (itself byte-identical
to the reference binary on this script). Also reports steady-state RTF
so docs/BENCH.md can carry a before/after for the scan-body diet.

Usage (dev rig): python tools/validate_selfmod_df64.py [srate]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import saugns_tpu  # noqa: F401  (XLA flag guard)
import jax

SRC = '/root/reference/examples/sounds/pm_feedback_pm.sau'


def cpu_render(src, srate):
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.cpu import Generator as CpuGenerator
    prg = build_program(ScriptArg(str=src, is_path=True,
                                  no_time=True, predef=[]))
    g = CpuGenerator(prg, srate)
    buf = np.zeros(65536 * 2, np.int16)
    chunks = []
    while True:
        more, n = g.run(buf, 65536, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks).reshape(-1, 2)


def main():
    srate = int(sys.argv[1]) if len(sys.argv) > 1 else 96000
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.engine import JaxGenerator
    prg = build_program(ScriptArg(str=SRC, is_path=True,
                                  no_time=True, predef=[]))
    g = JaxGenerator(prg, srate)
    jax.block_until_ready(g.render_device())  # compile + warm
    dev = g.assemble(g.render_device())
    ref = cpu_render(SRC, srate)
    dev = dev[:len(ref)]
    err = (dev.astype(np.float64) - ref.astype(np.float64)).ravel()
    p = float((ref.astype(np.float64) ** 2).sum())
    e = float((err ** 2).sum())
    snr = float('inf') if e == 0 else 10 * np.log10(p / e)
    mism = int(np.any(dev != ref, axis=1).sum())
    print('selfmod pm_feedback_pm @%d: SNR %.1f dB, %d/%d frames '
          'differ' % (srate, snr, mism, len(ref)))
    import jax.numpy as jnp
    ck = jax.jit(lambda ps: sum(jnp.sum(p.astype(jnp.int32))
                                for p in ps))
    audio_s = g.plan.signal_end / srate
    wall = float('inf')
    for _ in range(3):
        t0 = time.time()
        # forced completion: block_until_ready can return without
        # waiting on the dev-rig runtime (bench._force)
        ck(list(g.render_device())).item()
        wall = min(wall, time.time() - t0)
    print('RTF %.1f (%.2fs audio in %.3fs)'
          % (audio_s / wall, audio_s, wall))
    ok = snr >= 90.0
    print('RESULT: %s' % ('ok' if ok else 'FAILED'))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
