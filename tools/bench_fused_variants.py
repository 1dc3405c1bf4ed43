#!/usr/bin/env python
"""Microbenchmark variants of the fused wosc sample+fill kernel on the
TPU: (A) skip the forward-fill log-doubling when the whole tile is
valid (pd != 0 everywhere -- the overwhelmingly common case: a phase
that advances every sample), (B) 4 pre-shifted tap tables sharing one
(hi, lo)/select mask per window, (C) both. All variants must be
bitwise identical to the current kernel."""
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
                                    _herp_df64, _lane_gather,
                                    _window_taps_body, SLENBITS,
                                    X_SCALE)

f32 = jnp.float32
i32 = jnp.int32


def _build_shifted_tabs(wave):
    _, piluts = W.get_tables()
    pil = np.asarray(piluts, np.float32)[wave]
    idx = np.arange(2048)
    t4 = np.stack([pil[(idx + t - 1) & 2047].reshape(16, 128)
                   for t in range(4)])
    return jnp.asarray(t4)  # (4, 16, 128)


def _taps_shifted(tab4_ref, cell, R):
    hi = cell >> np.int32(7)
    lo = cell & np.int32(127)
    accs = [jnp.zeros((R, 128), f32) for _ in range(4)]
    for w in range(16):
        m = hi == np.int32(w)
        for t in range(4):
            tw = jnp.broadcast_to(tab4_ref[t, w, :][None, :],
                                  (R, 128))
            g = _lane_gather(tw, lo)
            accs[t] = jnp.where(m, g, accs[t])
    return accs


def make_factory(TILE, tpv, dvs, dvo, skip_fill, shifted):
    from jax.experimental import pallas as pl
    R = TILE // 128

    def kernel(ph_ref, pp_ref, ish_ref, isl_ref, ps_ref, fi_ref,
               drst_ref, rph_ref, rh_ref, rl_ref, tab_ref, out_ref,
               cf_ref):
        gi = pl.program_id(0)
        v = gi // np.int32(tpv)
        ti = gi % np.int32(tpv)
        start = ti == 0
        ph = ph_ref[:, :]
        cell = jax.lax.shift_right_logical(ph, np.int32(SLENBITS))
        x = (ph & np.int32(W.SLENMASK)).astype(f32) * X_SCALE
        if shifted:
            taps = _taps_shifted(tab_ref, cell, R)
        else:
            taps = _window_taps_body(tab_ref, cell, R)
        h2, l2 = _herp_df64(taps[0], taps[1], taps[2], taps[3], x)
        h1 = _flat_shift(h2, 1, R, np.float32(0.0))
        l1 = _flat_shift(l2, 1, R, np.float32(0.0))
        php = _flat_shift(ph, 1, R, np.int32(0))
        ch = jnp.where(start, ish_ref[v], cf_ref[0])
        cl = jnp.where(start, isl_ref[v], cf_ref[1])
        cfill = jnp.where(start, ps_ref[v], cf_ref[2])
        carry_ph = (cf_ref[4].astype(i32) << np.int32(16)) \
            | cf_ref[3].astype(i32)
        cph = jnp.where(start, pp_ref[v], carry_ph)
        row = jax.lax.broadcasted_iota(i32, (R, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (R, 128), 1)
        pos0 = (row == np.int32(0)) & (lane == np.int32(0))
        h1 = jnp.where(pos0, ch, h1)
        l1 = jnp.where(pos0, cl, l1)
        php = jnp.where(pos0, cph, php)
        ridx = ti * np.int32(TILE) + row * np.int32(128) + lane
        match = (ridx == fi_ref[v]) & (drst_ref[v] != np.int32(0))
        h1 = jnp.where(match, rh_ref[v], h1)
        l1 = jnp.where(match, rl_ref[v], l1)
        php = jnp.where(match, rph_ref[v], php)
        pd = ph - php
        valid = pd != np.int32(0)
        pdf = jnp.where(valid, pd, np.int32(1)).astype(f32)
        xf = np.float32(dvs) / pdf
        dh, dl = _df_add(h2, l2, -h1, -l1)
        mh, ml = _df_mul_f(dh, dl, xf)
        sh, sl = _df_add(mh, ml, np.float32(dvo), np.float32(0.0))
        s = sh + sl
        last = (row == np.int32(R - 1)) & (lane == np.int32(127))
        cf_ref[0] = jnp.sum(jnp.where(last, h2, np.float32(0.0)))
        cf_ref[1] = jnp.sum(jnp.where(last, l2, np.float32(0.0)))
        ph_lo = (ph & np.int32(0xffff)).astype(f32)
        ph_hi = jax.lax.shift_right_logical(
            ph, np.int32(16)).astype(f32)
        cf_ref[3] = jnp.sum(jnp.where(last, ph_lo, np.float32(0.0)))
        cf_ref[4] = jnp.sum(jnp.where(last, ph_hi, np.float32(0.0)))

        def fill_out():
            val = jnp.where(valid, s, np.float32(0.0))
            f = valid.astype(f32)
            k = 1
            while k < TILE:
                v2 = _flat_shift(val, k, R, np.float32(0.0))
                f2 = _flat_shift(f, k, R, np.float32(0.0))
                take = f == np.float32(0.0)
                val = jnp.where(take, v2, val)
                f = jnp.where(take, f2, f)
                k *= 2
            return jnp.where(f != np.float32(0.0), val, cfill)

        if not skip_fill:
            out = fill_out()
            out_ref[:, :] = out
            cf_ref[2] = jnp.sum(jnp.where(last, out, np.float32(0.0)))
        else:
            nhold = jnp.sum(jnp.where(valid, np.float32(0.0),
                                      np.float32(1.0)))

            @pl.when(nhold == np.float32(0.0))
            def _():
                out_ref[:, :] = s
                cf_ref[2] = jnp.sum(jnp.where(last, s,
                                              np.float32(0.0)))

            @pl.when(nhold != np.float32(0.0))
            def _():
                out = fill_out()
                out_ref[:, :] = out
                cf_ref[2] = jnp.sum(jnp.where(last, out,
                                              np.float32(0.0)))
    return kernel


def call_variant(ph, seeds, tab, tpv, TILE, dvs, dvo, skip_fill,
                 shifted):
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    N = ph.shape[0]
    R = TILE // 128
    nv = seeds[0].shape[0]

    def smem(n):
        return pl_.BlockSpec((n,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM)

    tab_spec = pl_.BlockSpec(
        (4, 16, 128), lambda i: (np.int32(0),) * 3,
        memory_space=pltpu.VMEM) if shifted else pl_.BlockSpec(
        (16, 128), lambda i: (np.int32(0),) * 2,
        memory_space=pltpu.VMEM)
    out = pl_.pallas_call(
        make_factory(TILE, tpv, dvs, dvo, skip_fill, shifted),
        grid=(N // TILE,),
        in_specs=[pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM)]
        + [smem(nv)] * 9 + [tab_spec],
        out_specs=pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), f32),
        scratch_shapes=[pltpu.SMEM((5,), f32)],
    )(ph.reshape(N // 128, 128), *seeds, tab)
    return out.reshape(N)


def main():
    wave = 0
    V, NPV = 32, 98304          # bank-like: 32 voices x 96k samples
    TILE = jdsp._tile_for(NPV)
    tpv = NPV // TILE
    dvs = np.float32(W.dvscale(wave))
    dvo = np.float32(W.dvoffset(wave))
    rng = np.random.RandomState(3)
    incs = rng.randint(1 << 16, 1 << 25, (V, NPV)).astype(np.uint32)
    ph = np.cumsum(incs.astype(np.uint64), axis=1).astype(np.uint32)
    pp = rng.randint(0, 1 << 32, V).astype(np.uint32)
    ps = rng.randn(V).astype(np.float32)
    fi = np.zeros(V, np.int32)
    drst = np.zeros(V, np.int32)
    rph = pp.copy()

    hp, lp = jax.jit(lambda p: jdsp._Is_df64(wave, p))(jnp.asarray(pp))
    hr, lr = hp, lp
    seeds = tuple(jnp.asarray(a) for a in (
        jax.lax.bitcast_convert_type(jnp.asarray(pp), i32), hp, lp,
        jnp.asarray(ps), jnp.asarray(fi), jnp.asarray(drst),
        jax.lax.bitcast_convert_type(jnp.asarray(rph), i32), hr, lr))
    phi = jax.lax.bitcast_convert_type(
        jnp.asarray(ph.reshape(V * NPV)), i32)
    tab1 = jdsp._build_window_tabs()[wave]
    tab4 = _build_shifted_tabs(wave)

    # reference: current production path
    ref_fn = jax.jit(jax.vmap(
        lambda p, q, h, l, s, f, d, r, rh_, rl_: jdsp.wosc_s_filled(
            wave, p, q, s, f, d != 0, r)))
    ref = ref_fn(jnp.asarray(ph), jnp.asarray(pp), hp, lp,
                 jnp.asarray(ps), jnp.asarray(fi), jnp.asarray(drst),
                 jnp.asarray(rph), hr, lr)
    ref = np.asarray(ref).reshape(-1)

    variants = [('base (copy)', False, False),
                ('skip-fill', True, False),
                ('shifted-tabs', False, True),
                ('both', True, True)]
    K = 24
    for name, sf, sh in variants:
        tab = tab4 if sh else tab1
        fn = jax.jit(lambda p, t=tab, sf=sf, sh=sh: call_variant(
            p, seeds, t, tpv, TILE, dvs, dvo, sf, sh))
        out = np.asarray(fn(phi))
        exact = bool((out == ref).all())

        # chain K launches inside ONE jit (each next input depends on
        # the previous output) so the ~28 ms tunnel round trip is paid
        # once, and the chain can't be replayed or reordered
        def chained(p, t=tab, sf=sf, sh=sh):
            acc = jnp.float32(0)
            for _ in range(K):
                o = call_variant(p, seeds, t, tpv, TILE, dvs, dvo,
                                 sf, sh)
                acc = acc + o[0]
                p = p + jdsp.salt_zero(acc).astype(i32)
            return acc
        cf = jax.jit(chained)
        cf(phi).item()   # forced completion (see bench._force)
        best = 1e9
        for _ in range(8):
            t0 = time.time()
            cf(phi).item()
            best = min(best, time.time() - t0)
        nspc = best / (K * V * NPV) * 1e9
        print('%-14s exact=%s  %.3f ms/call  %.3f ns/sample'
              % (name, exact, best * 1e3 / K, nspc), flush=True)


if __name__ == '__main__':
    main()
