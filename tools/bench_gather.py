#!/usr/bin/env python
"""Microbenchmark tap-gather kernel variants on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saugns_tpu.render import jdsp

f32 = jnp.float32
i32 = jnp.int32


def variant_concat(cells, tapmat):
    """One big matmul per tile: concatenate the 8 row one-hots."""
    B = cells.shape[0]
    TILE = 2048
    grid = (B // TILE,)
    cells2 = cells.reshape(B // 256, 256)
    g = np.zeros((8, 256), np.float32)
    for k in range(12):
        g[k % 4, k * 16:(k + 1) * 16] = 1.0
    gmat = jnp.asarray(g)

    def kernel(idx_ref, t_ref, g_ref, out_ref):
        col16 = jax.lax.broadcasted_iota(i32, (TILE, 256), 1) \
            % np.int32(16)
        ohs = []
        sels = []
        for r in range(TILE // 256):
            idx = idx_ref[r, :]
            hi = idx >> np.int32(4)
            ohs.append((jax.lax.broadcasted_iota(i32, (256, 128), 1)
                        == hi[:, None]).astype(f32))
        oh = jnp.concatenate(ohs, axis=0)          # (TILE, 128)
        cand = jnp.dot(oh, t_ref[:], preferred_element_type=f32)
        los = []
        for r in range(TILE // 256):
            idx = idx_ref[r, :]
            los.append((idx & np.int32(15))[:, None])
        lo = jnp.concatenate(los, axis=0)           # (TILE, 1)
        sel = (col16 == lo).astype(f32)
        out_ref[:, :] = jax.lax.dot_general(
            g_ref[:], cand * sel, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((TILE // 256, 256),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), f32),
    )(cells2, tapmat, gmat)


def time_fn(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    jdsp.get_tables()
    mats = jdsp._build_tap_mats()
    rng = np.random.RandomState(0)
    N = 1 << 21
    cells = jnp.asarray(rng.randint(0, 2048, N), jnp.int32)

    cur = jax.jit(lambda c: jdsp._gather_taps_pallas(c, mats[0]))
    t = time_fn(cur, cells)
    print('current 8-row kernel : %.3f ms  (%.1f Msamp/s)'
          % (t * 1e3, N / t / 1e6))

    v1 = jax.jit(lambda c: variant_concat(c, mats[0]))
    o1 = v1(cells)
    o0 = cur(cells)
    print('concat variant exact:', bool(jnp.array_equal(o0, o1)))
    t1 = time_fn(v1, cells)
    print('concat one-matmul    : %.3f ms  (%.1f Msamp/s)'
          % (t1 * 1e3, N / t1 / 1e6))


if __name__ == '__main__':
    main()
