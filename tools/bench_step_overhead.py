#!/usr/bin/env python
"""Isolate the ~5 us per-grid-step overhead of the fused kernel:
which part is the invariant-table refetch vs DMA sync vs grid
bookkeeping. Variants of a pure copy kernel at TILE=16384:

  notab     -- in/out only, no window-table input
  tab       -- + (16,128) VMEM table with constant index map
  par       -- notab with dimension_semantics=('parallel',)
  smem      -- + 9 dummy SMEM scalar inputs (production arg shape)
"""
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

f32 = jnp.float32
i32 = jnp.int32


def call(ph, tab, TILE, variant):
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    N = ph.shape[0]
    R = TILE // 128

    def smem(n):
        return pl_.BlockSpec((n,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM)

    in_specs = [pl_.BlockSpec((R, 128), lambda i: (i, np.int32(0)),
                              memory_space=pltpu.VMEM)]
    args = [ph.reshape(N // 128, 128)]
    nsmem = 0
    if variant in ('tab', 'smem'):
        in_specs.append(pl_.BlockSpec(
            (16, 128), lambda i: (np.int32(0), np.int32(0)),
            memory_space=pltpu.VMEM))
        args.append(tab)
    if variant == 'smem':
        nsmem = 9
        for _ in range(nsmem):
            in_specs.append(smem(32))
            args.append(jnp.zeros(32, f32))

    def kernel(*refs):
        ph_ref = refs[0]
        out_ref = refs[-1]
        out_ref[:, :] = (ph_ref[:, :] & np.int32(W_SLENMASK)) \
            .astype(f32)

    W_SLENMASK = 0x1fffff
    params = {}
    if variant == 'par':
        params['compiler_params'] = pltpu.CompilerParams(
            dimension_semantics=('parallel',))
    return pl_.pallas_call(
        kernel,
        grid=(N // TILE,),
        in_specs=in_specs,
        out_specs=pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), f32),
        **params,
    )(*args).reshape(N)


def main():
    N = 32 * 98304
    rng = np.random.RandomState(3)
    ph = rng.randint(0, 1 << 31, N).astype(np.int32)
    phi = jnp.asarray(ph)
    tab = jnp.asarray(jdsp._build_window_tabs()[0])
    K = 24
    for variant in ('notab', 'par', 'tab', 'smem'):
        def chained(p, variant=variant):
            acc = jnp.float32(0)
            for _ in range(K):
                o = call(p, tab, 16384, variant)
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
        print('%-6s %.3f ms/call  %.3f ns/sample'
              % (variant, best * 1e3 / K, best / (K * N) * 1e9),
              flush=True)


if __name__ == '__main__':
    main()
