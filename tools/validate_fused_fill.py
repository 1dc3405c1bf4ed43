#!/usr/bin/env python
"""Validate the one-pass fused wosc sample+fill kernel
(jdsp.wosc_s_filled) against the composed chain it replaces
(wosc_s_shifted + forward_fill_last_valid) on the REAL TPU.

The two paths execute the same IEEE f32 operations in the same order,
so the contract is bitwise equality -- on random phase walks with
pd == 0 runs, unconsumed resets at arbitrary row positions, rows
spanning multiple tiles, and vmapped voice batches.

Run on the dev rig (TPU visible): python tools/validate_fused_fill.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import saugns_tpu  # noqa: F401  (XLA flag guard)
import jax
import jax.numpy as jnp

from saugns_tpu.render import jdsp

u32 = jnp.uint32
f32 = jnp.float32
i32 = jnp.int32


def make_case(rng, n, dup_frac=0.1):
    """Random phase walk with pd == 0 runs (repeated phases)."""
    incs = rng.randint(0, 1 << 24, n).astype(np.uint32)
    incs[rng.rand(n) < dup_frac] = 0
    ph = (np.cumsum(incs.astype(np.uint64))
          + rng.randint(0, 1 << 32)).astype(np.uint32)
    return ph


def composed(wave, ph, pp, ps, fi, do_rst, rst_prev):
    ph = jnp.asarray(ph)
    pp = jnp.uint32(pp)
    p_prev = jnp.concatenate([jnp.reshape(pp, (1,)), ph[:-1]])
    p_prev = p_prev.at[fi].set(
        jnp.where(do_rst, rst_prev, p_prev[fi]))
    s_raw, valid = jdsp.wosc_s_shifted(
        wave, ph, p_prev, pp, first_ir=jnp.int32(fi),
        do_rst=jnp.asarray(do_rst), rst_prev=jnp.uint32(rst_prev))
    return jdsp.forward_fill_last_valid(s_raw, valid, jnp.float32(ps))


def fused(wave, ph, pp, ps, fi, do_rst, rst_prev):
    return jdsp.wosc_s_filled(
        wave, jnp.asarray(ph), jnp.uint32(pp), jnp.float32(ps),
        jnp.int32(fi), jnp.asarray(do_rst), jnp.uint32(rst_prev))


def main():
    assert jdsp._on_tpu(), 'run on the TPU rig (got %s)' % (
        jax.devices()[0].platform)
    rng = np.random.RandomState(7)
    bad = 0
    for wave in (0, 3, 9):          # sin, sqr, saw
        for n in (1024, 2048, 50000):   # sub-tile, tile, multi-tile
            for do_rst in (False, True):
                ph = make_case(rng, n)
                pp = np.uint32(rng.randint(0, 1 << 32))
                ps = np.float32(rng.randn())
                fi = int(rng.randint(0, n))
                rst_prev = np.uint32(int(ph[fi]) - 2048 * 2048
                                     & 0xffffffff)
                a = np.asarray(fused(wave, ph, pp, ps, fi, do_rst,
                                     rst_prev))
                b = np.asarray(composed(wave, ph, pp, ps, fi, do_rst,
                                        rst_prev))
                n_bad = int((a != b).sum())
                bad += n_bad
                print('wave %2d n %6d rst %d fi %6d: %s'
                      % (wave, n, do_rst, fi,
                         'ok' if n_bad == 0 else
                         'FAIL %d mismatches' % n_bad))
    # vmapped batch (the voice-bank shape): V rows, per-row scalars
    V, n = 8, 2048
    phs = np.stack([make_case(rng, n) for _ in range(V)])
    pps = rng.randint(0, 1 << 32, V).astype(np.uint32)
    pss = rng.randn(V).astype(np.float32)
    fis = rng.randint(0, n, V).astype(np.int32)
    rsts = (rng.rand(V) < 0.5)
    rps = (phs[np.arange(V), fis].astype(np.uint64)
           - 2048 * 2048).astype(np.uint32)
    for wave in (0, 9):
        va = jax.vmap(lambda p, q, s, f, d, r: jdsp.wosc_s_filled(
            wave, p, q, s, f, d, r))(
            jnp.asarray(phs), jnp.asarray(pps), jnp.asarray(pss),
            jnp.asarray(fis), jnp.asarray(rsts), jnp.asarray(rps))
        va = np.asarray(va)
        n_bad = 0
        for v in range(V):
            b = np.asarray(composed(wave, phs[v], pps[v], pss[v],
                                    int(fis[v]), bool(rsts[v]),
                                    rps[v]))
            n_bad += int((va[v] != b).sum())
        bad += n_bad
        print('wave %2d vmap V=%d: %s'
              % (wave, V, 'ok' if n_bad == 0 else
                 'FAIL %d mismatches' % n_bad))
    print('RESULT:', 'ok' if bad == 0 else 'FAILED (%d)' % bad)
    return 0 if bad == 0 else 1


if __name__ == '__main__':
    sys.exit(main())
