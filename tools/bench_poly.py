#!/usr/bin/env python
"""Time the 1024-voice FM bank through the real engine on the TPU
(bench.py phase 5 in isolation). Usage: python tools/bench_poly.py
[n_voices] [duration_s]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import saugns_tpu  # noqa: F401
import jax

SRATE = 96000


def main():
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.parallel.voicebank import (BankRender,
                                               make_bank_script)
    src = make_bank_script(nv, seed=1, duration=dur)
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    import jax.numpy as jnp

    def force(arr):
        # dependent scalar fetch: block_until_ready can return
        # without waiting on the dev-rig runtime (see bench._force)
        return jnp.sum(arr.astype(jnp.int32)).item()

    t0 = time.time()
    bank = BankRender(prg, SRATE, mesh=None, ordered_mix=False)
    force(bank.render_i16())
    print('warm (compile) %.1fs' % (time.time() - t0), flush=True)
    audio_s = bank._n_valid() / SRATE
    wall = float('inf')
    for _ in range(4):
        t0 = time.time()
        force(bank.render_i16())
        w = time.time() - t0
        print('pass %.3fs  RTF %.2f' % (w, audio_s / w), flush=True)
        if audio_s / w < 5000:
            wall = min(wall, w)
    print('poly%d: %.1fs audio in %.2fs -> RTF %.2f'
          % (nv, audio_s, wall, audio_s / wall), flush=True)


if __name__ == '__main__':
    main()
