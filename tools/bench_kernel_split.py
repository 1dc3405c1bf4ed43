#!/usr/bin/env python
"""Decompose the fused wosc kernel's per-sample cost on the TPU:
which fraction is the 16-window tap gather vs the df64 Hermite vs the
diff/carry plumbing. Each variant strips one part out (outputs are NOT
meant to be audio-correct -- this is a cost model probe, the exact
kernel stays in jdsp.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import saugns_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from saugns_tpu.render import jdsp
from saugns_tpu.dsp import wavetables as W
from saugns_tpu.render.jdsp import (_df_add, _df_mul_f, _flat_shift,
                                    _herp_df64, _window_taps_body,
                                    SLENBITS, X_SCALE)

f32 = jnp.float32
i32 = jnp.int32


def make_kernel(TILE, mode):
    R = TILE // 128

    def kernel(ph_ref, tab_ref, out_ref):
        ph = ph_ref[:, :]
        cell = jax.lax.shift_right_logical(ph, np.int32(SLENBITS))
        x = (ph & np.int32(W.SLENMASK)).astype(f32) * X_SCALE
        if mode == 'copy':
            out_ref[:, :] = x
            return
        if mode in ('gather', 'gather1'):
            taps = _window_taps_body(tab_ref, cell, R,
                                     taps_needed=1 if mode == 'gather1'
                                     else 4)
            acc = taps[0]
            for t in taps[1:]:
                acc = acc + t
            out_ref[:, :] = acc
            return
        if mode == 'herp':
            # taps faked from cheap arithmetic; full df64 Hermite
            s0 = x
            s1 = x + np.float32(1.0)
            s2 = x + np.float32(2.0)
            s3 = x + np.float32(3.0)
            h2, l2 = _herp_df64(s0, s1, s2, s3, x)
            out_ref[:, :] = h2 + l2
            return
        if mode == 'gather+herp':
            taps = _window_taps_body(tab_ref, cell, R)
            h2, l2 = _herp_df64(taps[0], taps[1], taps[2], taps[3], x)
            out_ref[:, :] = h2 + l2
            return
        if mode == 'full':
            taps = _window_taps_body(tab_ref, cell, R)
            h2, l2 = _herp_df64(taps[0], taps[1], taps[2], taps[3], x)
            h1 = _flat_shift(h2, 1, R, np.float32(0.0))
            l1 = _flat_shift(l2, 1, R, np.float32(0.0))
            php = _flat_shift(ph, 1, R, np.int32(0))
            pd = ph - php
            valid = pd != np.int32(0)
            pdf = jnp.where(valid, pd, np.int32(1)).astype(f32)
            xf = np.float32(0.5) / pdf
            dh, dl = _df_add(h2, l2, -h1, -l1)
            mh, ml = _df_mul_f(dh, dl, xf)
            sh, sl = _df_add(mh, ml, np.float32(0.25), np.float32(0.0))
            out_ref[:, :] = sh + sl
            return
        raise ValueError(mode)
    return kernel


def call(ph, tab, TILE, mode):
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    N = ph.shape[0]
    R = TILE // 128
    return pl_.pallas_call(
        make_kernel(TILE, mode),
        grid=(N // TILE,),
        in_specs=[pl_.BlockSpec((R, 128), lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
                  pl_.BlockSpec((16, 128),
                                lambda i: (np.int32(0), np.int32(0)),
                                memory_space=pltpu.VMEM)],
        out_specs=pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), f32),
    )(ph.reshape(N // 128, 128), tab).reshape(N)


def main():
    wave = 0
    N = 32 * 98304
    TILE = jdsp._W_TILE
    rng = np.random.RandomState(3)
    incs = rng.randint(1 << 16, 1 << 25, N).astype(np.uint32)
    ph = np.cumsum(incs.astype(np.uint64)).astype(np.uint32)
    phi = jax.lax.bitcast_convert_type(jnp.asarray(ph), i32)
    tab = jnp.asarray(jdsp._build_window_tabs()[wave])
    K = 24
    for mode in ('copy', 'gather1', 'gather', 'herp', 'gather+herp',
                 'full'):
        def chained(p, mode=mode):
            acc = jnp.float32(0)
            for _ in range(K):
                o = call(p, tab, TILE, mode)
                acc = acc + o[0]
                p = p + jdsp.salt_zero(acc).astype(i32)
            return acc
        cf = jax.jit(chained)
        cf(phi).item()
        best = 1e9
        for _ in range(8):
            t0 = time.time()
            cf(phi).item()
            best = min(best, time.time() - t0)
        print('%-12s %.3f ms/call  %.3f ns/sample'
              % (mode, best * 1e3 / K, best / (K * N) * 1e9),
              flush=True)


if __name__ == '__main__':
    main()
