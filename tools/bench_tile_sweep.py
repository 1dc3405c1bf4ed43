#!/usr/bin/env python
"""Sweep the fused-kernel tile size on the TPU: the cost-split probe
(bench_kernel_split.py) showed ~5 us of per-grid-step overhead
dominating the kernel wall (a pure copy kernel costs 0.33 ns/sample of
the full kernel's 0.62 at TILE=16384). Bigger tiles amortize it."""
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
from tools.bench_kernel_split import call

f32 = jnp.float32
i32 = jnp.int32


def main():
    N = 32 * 98304   # 3.1M, divisible by 1024*3
    rng = np.random.RandomState(3)
    incs = rng.randint(1 << 16, 1 << 25, N).astype(np.uint32)
    ph = np.cumsum(incs.astype(np.uint64)).astype(np.uint32)
    phi = jax.lax.bitcast_convert_type(jnp.asarray(ph), i32)
    tab = jnp.asarray(jdsp._build_window_tabs()[0])
    K = 24
    for TILE in (16384, 32768, 65536, 131072, 262144, 524288):
        if N % TILE:
            continue
        for mode in ('copy', 'full'):
            def chained(p, mode=mode, TILE=TILE):
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
            print('TILE=%-7d %-5s %.3f ms/call  %.3f ns/sample'
                  % (TILE, mode, best * 1e3 / K,
                     best / (K * N) * 1e9), flush=True)


if __name__ == '__main__':
    main()
