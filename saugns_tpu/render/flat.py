"""Flat (time-parallel) epoch renderer.

The sequential engine (engine.py) scans event-aligned blocks one at a
time, threading all per-op scalar state through the scan carry --
~300 kernel launches per block, and the launches (not the math)
dominate the device time. This module renders an *entire epoch* as a
handful of big batched kernels instead:

- All deterministic scalar state (line sweeps, time counters, gates)
  is baked per block on the host (hostsim.py) -- it never touches the
  device carry.
- Oscillator phase state is a *linear* recurrence in the per-sample
  increments, so per-block phase bases fall out of one global prefix
  sum over the whole epoch (exact u32/u64 wraparound, MXU limb scans).
  This holds even under audio-rate FM: the modulator's samples are
  themselves computed flat first, in stage order.
- The PILUT differentiator's previous-sample pairing crosses block
  boundaries by construction: each block's first sample pairs with
  the held phase of the last *in-range* sample before it (a (blocks,)
  row-level carry fill), which is exactly the prev_phase the
  sequential scan would have threaded.
- The pd == 0 forward fill (wosc.h:247-261) becomes one last-valid
  scan over the flat timeline.

Output is bit-identical to the sequential engine (asserted by
tests/test_flat.py); epochs the host sim can't bake (self-PM
feedback, mid-epoch oscillator records, op rebinding, shared state
cells) fall back to the sequential path per epoch.

Work is chunked (FLAT_CHUNK samples per device step) so device memory
stays bounded for arbitrarily long epochs; chunks run under one
lax.scan with a tiny scalar carry.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from ..lang import program as P
from . import jdsp
from .engine import (C_LEND, C_LFLAGS, C_LPOS, C_LTYPE, C_LV0, C_LVT,
                     C_NN, C_NPREV, C_PHASE, C_RCPHI, C_RCPLO, C_TIME,
                     C_TINF, C_WPPH, C_WPS, C_WRESET, apply_records,
                     line_run_vec)
from .plan import (K_CONST1, K_LINE, K_MIX, K_NOISE, K_RANGEMOD,
                   K_RCYCLE, K_RRUN, K_VMIX, K_WPHASE, K_WRUN, K_ZERO)

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32
u64 = jnp.uint64

FLAT_CHUNK = 1 << 21   # samples per device chunk (8 MiB per buffer)

# noise color indices (P.NOISE_NAMES order)
N_WH, N_GW, N_BW, N_TW, N_RE, N_VI, N_BV = range(7)


def _u(x):
    return jax.lax.bitcast_convert_type(x, u32)


def _i(x):
    return jax.lax.bitcast_convert_type(x, i32)


def _row_fill(row_vals, row_active, seed):
    """Per-row carry fill: out[r] = row_vals at the last active row
    <= r, or ``seed`` if none yet. Rows are few (<= chunk blocks), so
    a log-depth scan on (nc,) is negligible."""
    nc = row_vals.shape[0]
    ridx = jnp.arange(nc, dtype=i32)
    last = jax.lax.associative_scan(
        jnp.maximum, jnp.where(row_active, ridx + 1, 0))
    ext = jnp.concatenate([jnp.reshape(seed, (1,) + row_vals.shape[1:]),
                           row_vals])
    return ext[last]


def _count_nonzero_mxu(mask):
    """Exact count of True lanes via two MXU dots (values 0/1, sums
    < 2^24); jnp.any on a megasample vector lowers to a slow
    slice/reduce chain."""
    N = mask.shape[0]
    if N % 128:
        return jnp.sum(mask.astype(f32))
    bm = mask.astype(f32).reshape(N // 128, 128)
    return jnp.dot(jnp.dot(bm, jnp.ones((128,), f32)),
                   jnp.ones((N // 128,), f32))


def _last_valid_fill(s_raw, valid, in_range, seed):
    """Flat forward fill: value at the last valid index <= i (seed if
    none) -- the whole-epoch form of wosc's pd == 0 hold
    (wosc.h:247-261). Three tiers like jdsp.forward_fill_valid:
    in-range positions all valid (the overwhelmingly common case) ->
    raw; isolated invalids with a valid predecessor -> one shift;
    else a gather-free associative scan on the values (combine keeps
    the right operand when valid; index-then-gather would serialize
    on TPU)."""
    bad = (~valid) & in_range
    # a valid source precedes position i if sample i-1 is valid; the
    # seed is always a source at position 0
    src_prev = jnp.concatenate(
        [jnp.ones((1,), bool), valid[:-1]])
    pair = bad & ~src_prev

    def fast(_):
        return s_raw

    def shift1(_):
        sh = jnp.concatenate([jnp.reshape(seed, (1,)), s_raw[:-1]])
        return jnp.where(valid, s_raw, sh)

    def slow(_):
        v0 = jnp.where(valid, s_raw, seed)
        vals, _ = jax.lax.associative_scan(
            lambda a, b: (jnp.where(b[1], b[0], a[0]), a[1] | b[1]),
            (v0, valid))
        return vals

    zero = np.float32(0.0)
    return jax.lax.cond(
        _count_nonzero_mxu(bad) == zero, fast,
        lambda _: jax.lax.cond(_count_nonzero_mxu(pair) == zero,
                               shift1, slow, None),
        None)


class FlatEpoch:
    """Compiled flat renderer for one eligible epoch."""

    _cache: Dict = {}

    def __init__(self, plan, ep, bake, srate):
        from ..dsp import wavetables as W
        self.plan = plan
        self.ep = ep
        self.bake = bake
        self.srate = srate
        stage_sig, inst_src, _ = ep.sig
        self.stage_sig = stage_sig
        nb = len(ep.blk_len)
        B = ep.block
        nc = max(min(FLAT_CHUNK // B, nb), 1)
        nch = -(-nb // nc)
        self.nb, self.B, self.nc, self.nch = nb, B, nc, nch
        self.stage_op = tuple(int(x) for x in
                              np.asarray(ep.blk_stage_op[0]).ravel()) \
            if len(ep.stages) else ()
        self.inst_op = tuple(int(x) for x in
                             np.asarray(ep.blk_inst_op[0]).ravel()) \
            if len(ep.instances) else ()
        self._bake_tables()
        self._fn = self._build()

    # -- host-side chunk table assembly ----------------------------------

    def _bake_tables(self):
        ep, bake = self.ep, self.bake
        nb, B, nc, nch = self.nb, self.B, self.nc, self.nch
        pad = nch * nc - nb

        def padb(a, fill=0):
            if pad == 0:
                return np.asarray(a)
            a = np.asarray(a)
            w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, w, constant_values=fill)

        n_insts = max(len(ep.instances), 1)
        lens = padb(bake.lens if bake.lens is not None
                    else np.zeros((nb, n_insts), np.int32))
        self.t_lens = lens.reshape(nch, nc, -1)
        # per-K_LINE-stage state tables, stacked (n_line, nch, nc)
        self.line_sis = [si for si, s in enumerate(ep.stages)
                         if s.kind == K_LINE]
        if self.line_sis:
            self.t_lv0 = np.stack([padb(bake.stages[si].v0)
                                   for si in self.line_sis]) \
                .reshape(len(self.line_sis), nch, nc)
            self.t_lvt = np.stack([padb(bake.stages[si].vt)
                                   for si in self.line_sis]) \
                .reshape(len(self.line_sis), nch, nc)
            self.t_lpos = np.stack([padb(bake.stages[si].pos)
                                    for si in self.line_sis]) \
                .reshape(len(self.line_sis), nch, nc)
            self.t_lend = np.stack([padb(bake.stages[si].end)
                                    for si in self.line_sis]) \
                .reshape(len(self.line_sis), nch, nc)
            self.t_lflags = np.stack([padb(bake.stages[si].flags)
                                      for si in self.line_sis]) \
                .reshape(len(self.line_sis), nch, nc)
        self.noise_sis = [si for si, s in enumerate(ep.stages)
                          if s.kind == K_NOISE]
        if self.noise_sis:
            self.t_noff = np.stack([padb(bake.stages[si].noff)
                                    for si in self.noise_sis]) \
                .reshape(len(self.noise_sis), nch, nc).astype(np.uint32)
        # stateful stages: per-chunk last in-range flat index + active
        self.state_sis = [si for si, s in enumerate(ep.stages)
                          if s.kind in (K_WRUN, K_NOISE)]
        li_tab = np.zeros((len(self.state_sis), nch), np.int32)
        act_tab = np.zeros((len(self.state_sis), nch), bool)
        for k, si in enumerate(self.state_sis):
            inst = ep.stages[si].inst
            sl = lens[:, inst].reshape(nch, nc)
            for c in range(nch):
                rows = np.nonzero(sl[c] > 0)[0]
                if len(rows):
                    r = rows[-1]
                    li_tab[k, c] = r * B + sl[c, r] - 1
                    act_tab[k, c] = True
        self.t_last_ir = li_tab
        self.t_act = act_tab
        # epoch totals for noise counter advance (per noise stage)
        self.noise_total = {}
        for si in self.noise_sis:
            inst = ep.stages[si].inst
            self.noise_total[si] = np.uint32(
                np.sum(lens[:, inst].astype(np.uint64))
                & np.uint64(0xffffffff))
        # any-active per stateful cell (for WRESET / state-write gates)
        self.stage_active = {si: bool(np.any(
            lens[:, ep.stages[si].inst] > 0))
            for si in range(len(ep.stages))}

    # -- device function ---------------------------------------------------

    def _build(self):
        from ..dsp import wavetables as W
        ep = self.ep
        plan = self.plan
        stage_sig = self.stage_sig
        stages = ep.stages
        nb, B, nc, nch = self.nb, self.B, self.nc, self.nch
        srate = self.srate
        coeff = np.float32(np.float32(4294967296.0)
                           / np.float64(srate))
        amp_scale = np.float32(plan.amp_scale)
        SLENu = np.uint32(W.SLEN)
        line_pos = {si: k for k, si in enumerate(self.line_sis)}
        noise_pos = {si: k for k, si in enumerate(self.noise_sis)}
        state_pos = {si: k for k, si in enumerate(self.state_sis)}
        stage_op = self.stage_op
        inst_op = self.inst_op
        stage_active = self.stage_active
        noise_total = self.noise_total
        n_insts = len(ep.instances)
        rec_lo0 = int(ep.blk_rec_lo[0])
        rec_hi0 = int(ep.blk_rec_hi[0])

        # carries: one slot per stateful stage
        ph_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_WPHASE]
        cy_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_RCYCLE]
        wr_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_WRUN]
        no_sis = list(self.noise_sis)

        def epoch_fn(st, recs, xs_tables, end_tabs):
            if rec_hi0 > rec_lo0:
                st = apply_records(st, rec_lo0, rec_hi0, recs)
            jdsp.get_tables()

            def op_of(si):
                return stage_op[si]

            carry0 = {}
            for si in ph_sis:
                carry0['ph%d' % si] = _u(st['si'][op_of(si), C_PHASE])
            for si in cy_sis:
                op = op_of(si)
                carry0['cp%d' % si] = (
                    (_u(st['si'][op, C_RCPHI]).astype(u64)
                     << np.uint64(32))
                    | _u(st['si'][op, C_RCPLO]).astype(u64))
            for si in wr_sis:
                op = op_of(si)
                carry0['pp%d' % si] = _u(st['si'][op, C_WPPH])
                carry0['ps%d' % si] = st['sf'][op, C_WPS]
                carry0['rst%d' % si] = st['si'][op, C_WRESET] != 0
            for si in no_sis:
                op = op_of(si)
                carry0['nn%d' % si] = _u(st['si'][op, C_NN])
                carry0['np%d' % si] = _u(st['si'][op, C_NPREV])

            idx_b = jnp.arange(B, dtype=i32)[None, :]

            def chunk(carry, xs):
                lens = xs['lens']                      # (nc, n_insts)
                vals: Dict[int, jnp.ndarray] = {}
                mixl = jnp.zeros((nc, B), f32)
                mixr = jnp.zeros((nc, B), f32)
                new_carry = dict(carry)

                def stage_len(s):
                    return lens[:, s.inst]

                def mask_of(s):
                    return idx_b < stage_len(s)[:, None]

                for si, s in enumerate(stages):
                    kind = s.kind
                    mask2 = mask_of(s)
                    if kind == K_LINE:
                        k = line_pos[si]
                        ls = {'v0': xs['lv0'][k][:, None],
                              'vt': xs['lvt'][k][:, None],
                              'pos': xs['lpos'][k][:, None],
                              'end': xs['lend'][k][:, None],
                              'type': xs['lflags'][k][:, None] * 0,
                              'flags': xs['lflags'][k][:, None]}
                        mul = vals[s.a] if s.a >= 0 else None
                        out, _ = line_run_vec(
                            ls, B, stage_len(s)[:, None], mul,
                            static_type=s.ltype, idx=idx_b)
                        vals[s.dst] = out
                    elif kind == K_RANGEMOD:
                        par = vals[s.dst]
                        vals[s.dst] = jnp.where(
                            mask2,
                            par + (vals[s.a] - par) * vals[s.b], par)
                    elif kind == K_CONST1:
                        vals[s.dst] = jnp.ones((nc, B), f32)
                    elif kind == K_ZERO:
                        vals[s.dst] = jnp.zeros((nc, B), f32)
                    elif kind == K_NOISE:
                        self._noise_stage(s, si, xs, carry, new_carry,
                                          vals, mask2, noise_pos,
                                          state_pos, nc, B, idx_b)
                    elif kind == K_WPHASE:
                        freq = vals[s.a]
                        incs = jnp.where(
                            mask2, jdsp.ftoi(coeff * freq).astype(u32),
                            np.uint32(0))
                        run_flat = jdsp.prefix_sum(
                            incs.reshape(nc * B))
                        run = carry['ph%d' % si] \
                            + run_flat.reshape(nc, B)
                        ofs = self._phase_ofs(s, vals, freq,
                                              jdsp.P31, u32, (nc, B))
                        vals[s.dst] = ofs + run
                        new_carry['ph%d' % si] = carry['ph%d' % si] \
                            + run_flat[-1]
                    elif kind == K_WRUN:
                        self._wrun_stage(s, si, xs, carry, new_carry,
                                         vals, mask2, stage_len(s),
                                         state_pos, nc, B, SLENu)
                    elif kind == K_RCYCLE:
                        r2x = s.ras[5]
                        coeff_e = np.float32(coeff * 2) if r2x \
                            else coeff
                        pscale = np.float32(jdsp.P31 * 2) if r2x \
                            else jdsp.P31
                        freq = vals[s.a]
                        incs = jnp.where(
                            mask2,
                            jdsp.ftoi(coeff_e * freq).astype(u64),
                            np.uint64(0))
                        csum_flat = jdsp.prefix_sum(
                            incs.reshape(nc * B))
                        csum = csum_flat.reshape(nc, B)
                        base = carry['cp%d' % si] + (csum - incs)
                        ofs = self._phase_ofs(s, vals, freq, pscale,
                                              u64, (nc, B))
                        cph = ofs + base
                        vals[s.dst] = (cph >> np.uint64(32)).astype(u32)
                        phs = cph.astype(u32) >> np.uint32(1)
                        vals[s.dst + 1] = jdsp.asi32(phs).astype(f32) \
                            * jdsp.SCALE31
                        new_carry['cp%d' % si] = carry['cp%d' % si] \
                            + csum_flat[-1]
                    elif kind == K_RRUN:
                        rline, func, level, alpha, oflags, _ = s.ras
                        av, bv = jdsp.rasg_map(func, level, alpha,
                                               oflags, vals[s.a])
                        vals[s.dst] = jdsp.rasg_shape(
                            rline, oflags, vals[s.dst], av, bv)
                    elif kind == K_MIX:
                        src = vals[s.a]
                        amp = vals[s.b]
                        prev = vals.get(s.dst,
                                        jnp.zeros((nc, B), f32)) \
                            if s.layer else jnp.zeros((nc, B), f32)
                        if s.wave_env:
                            s_amp = amp * np.float32(0.5)
                            sv = src * s_amp + jnp.abs(s_amp)
                            new = prev * sv if s.layer else sv
                        else:
                            new = prev + src * amp if s.layer \
                                else src * amp
                        if s.layer:
                            vals[s.dst] = jnp.where(mask2, new, prev)
                        else:
                            vals[s.dst] = jnp.where(mask2, new,
                                                    np.float32(0.0))
                    elif kind == K_VMIX:
                        pan = vals[s.dst]
                        sv = vals[s.a] * amp_scale
                        sr = sv * pan
                        mixl = mixl + jnp.where(mask2, sv - sr,
                                                np.float32(0))
                        mixr = mixr + jnp.where(mask2, sv + sr,
                                                np.float32(0))
                out = jnp.stack([mixl, mixr], axis=-1)
                return new_carry, out

            xs_all = {k: jnp.asarray(v) for k, v in xs_tables.items()}
            carry_end, outs = jax.lax.scan(chunk, carry0, xs_all)

            # -- write back state -------------------------------------
            sf, si_arr = st['sf'], st['si']
            for si in ph_sis:
                if not stage_active[si]:
                    continue
                si_arr = si_arr.at[op_of(si), C_PHASE].set(
                    _i(carry_end['ph%d' % si]))
            for si in cy_sis:
                if not stage_active[si]:
                    continue
                cp = carry_end['cp%d' % si]
                si_arr = si_arr.at[op_of(si), C_RCPLO].set(
                    _i(cp.astype(u32)))
                si_arr = si_arr.at[op_of(si), C_RCPHI].set(
                    _i((cp >> np.uint64(32)).astype(u32)))
            for si in wr_sis:
                if not stage_active[si]:
                    continue
                op = op_of(si)
                si_arr = si_arr.at[op, C_WPPH].set(
                    _i(carry_end['pp%d' % si]))
                sf = sf.at[op, C_WPS].set(carry_end['ps%d' % si])
                si_arr = si_arr.at[op, C_WRESET].set(0)
            for si in no_sis:
                if not stage_active[si]:
                    continue
                op = op_of(si)
                si_arr = si_arr.at[op, C_NN].set(
                    _i(carry_end['nn%d' % si] + noise_total[si]))
                # nn carry stays at its epoch-start value; noff tables
                # are epoch-absolute, so the total advance adds once
                si_arr = si_arr.at[op, C_NPREV].set(
                    _i(carry_end['np%d' % si]))
            # host-authoritative columns
            sf = sf.at[:, C_LV0:C_LV0 + 6].set(end_tabs['lv0'])
            sf = sf.at[:, C_LVT:C_LVT + 6].set(end_tabs['lvt'])
            si_arr = si_arr.at[:, C_LPOS:C_LPOS + 6].set(
                end_tabs['lpos'])
            si_arr = si_arr.at[:, C_LEND:C_LEND + 6].set(
                end_tabs['lend'])
            si_arr = si_arr.at[:, C_LTYPE:C_LTYPE + 6].set(
                end_tabs['ltype'])
            si_arr = si_arr.at[:, C_LFLAGS:C_LFLAGS + 6].set(
                end_tabs['lflags'])
            si_arr = si_arr.at[:, C_TIME].set(end_tabs['time'])
            si_arr = si_arr.at[:, C_TINF].set(end_tabs['tinf'])
            st = dict(st)
            st['sf'] = sf
            st['si'] = si_arr
            st['vdur'] = end_tabs['vdur']
            return st, outs

        return jax.jit(epoch_fn)

    # -- stage helpers (traced inside chunk) -------------------------------

    @staticmethod
    def _phase_ofs(s, vals, freq, pscale, dtype, shape):
        if s.b >= 0 and s.c >= 0:
            s_pofs = vals[s.b] + vals[s.c] * jdsp.HUMMID_INV * freq
            return jdsp.ftoi(s_pofs * pscale).astype(dtype)
        if s.b >= 0:
            return jdsp.ftoi(vals[s.b] * pscale).astype(dtype)
        if s.c >= 0:
            s_pofs = vals[s.c] * jdsp.HUMMID_INV * freq
            return jdsp.ftoi(s_pofs * pscale).astype(dtype)
        return jnp.zeros(shape, dtype)

    def _wrun_stage(self, s, si, xs, carry, new_carry, vals, mask2,
                    slen, state_pos, nc, B, SLENu):
        wave = s.wave
        phase2 = vals[s.a]                              # (nc, B)
        li = jnp.maximum(slen - 1, 0)
        row_last = jnp.take_along_axis(phase2, li[:, None],
                                       axis=1)[:, 0]   # (nc,)
        row_act = slen > 0
        is_first = xs['first']
        pp_in = jnp.where(is_first & carry['rst%d' % si],
                          phase2[0, 0] - SLENu, carry['pp%d' % si])
        row_hold = _row_fill(row_last, row_act, pp_in)   # (nc,)
        held = jnp.where(mask2, phase2, row_hold[:, None])
        ph_flat = held.reshape(nc * B)
        p_prev = jnp.concatenate([jnp.reshape(pp_in, (1,)),
                                  ph_flat[:-1]])
        cells2 = jdsp.wosc_cells(ph_flat)
        taps2 = jdsp.gather_taps(cells2, wave)
        ptaps = jdsp.taps_at(pp_in >> jdsp.SLENBITS, wave)
        taps1 = jnp.concatenate([jnp.reshape(ptaps, (4, 1)),
                                 taps2[:, :-1]], axis=1)
        from ..dsp import wavetables as W
        x1 = (p_prev & np.uint32(W.SLENMASK)).astype(f32) \
            * jdsp.X_SCALE
        x2 = (ph_flat & np.uint32(W.SLENMASK)).astype(f32) \
            * jdsp.X_SCALE
        pd = jdsp.asi32(ph_flat - p_prev)
        s_raw, valid = jdsp._wosc_s64(wave, pd, x1, x2, taps1, taps2)
        out = _last_valid_fill(s_raw, valid, mask2.reshape(nc * B),
                               carry['ps%d' % si])
        k = state_pos[si]
        has_act = xs['act'][k]
        last_ir = xs['last_ir'][k]
        new_carry['pp%d' % si] = row_hold[-1]
        new_carry['ps%d' % si] = jnp.where(has_act, out[last_ir],
                                           carry['ps%d' % si])
        new_carry['rst%d' % si] = carry['rst%d' % si] & ~has_act
        vals[s.dst] = out.reshape(nc, B)

    def _noise_stage(self, s, si, xs, carry, new_carry, vals, mask2,
                     noise_pos, state_pos, nc, B, idx_b):
        ntype = s.ntype
        k = noise_pos[si]
        n = (carry['nn%d' % si] + xs['noff'][k][:, None]
             + idx_b.astype(u32))                       # (nc, B)
        nprev = carry['np%d' % si]
        sk = state_pos[si]
        has_act = xs['act'][sk]
        last_ir = xs['last_ir'][sk]
        li = jnp.maximum(
            jnp.sum(mask2.astype(i32), axis=1) - 1, 0)

        def held_roll(r):
            row_last = jnp.take_along_axis(r, li[:, None],
                                           axis=1)[:, 0]
            row_act = jnp.any(mask2, axis=1)
            return r, row_last, row_act

        if ntype == N_WH:
            out = jdsp.asi32(jdsp.ranfast32(n)).astype(f32) \
                * jdsp.SCALE31
        elif ntype == N_GW:
            out = jdsp.franssgauss32(n)
        elif ntype == N_BW:
            out = ((jdsp.asi32(jdsp.ranfast32(n)) >> 31) * 2
                   + 1).astype(f32)
        elif ntype == N_TW:
            odd = (n & np.uint32(1)).astype(bool)
            sb = (jdsp.asi32(jdsp.ranfast32(n)) >> 31) * 2 + 1
            out = jnp.where(odd, sb.astype(f32), np.float32(0))
        elif ntype == N_RE:
            inc = jnp.where(
                mask2,
                jdsp.asu32(jdsp.asi32(jdsp.ranfast32(n)) >> 6),
                np.uint32(0))
            sums = nprev + jdsp.prefix_sum(inc.reshape(nc * B))
            out = (jdsp.asi32(jdsp.foldhd32(sums)).astype(f32)
                   * jdsp.SCALE31).reshape(nc, B)
            new_carry['np%d' % si] = jnp.where(has_act, sums[-1],
                                               nprev)
        elif ntype == N_VI:
            r = jdsp.ranfast32(n)
            r2, row_last, row_act = held_roll(r)
            row_hold = _row_fill(row_last, row_act, nprev)
            r_held = jnp.where(mask2, r2, row_hold[:, None]) \
                .reshape(nc * B)
            prev = jnp.concatenate([jnp.reshape(nprev, (1,)),
                                    r_held[:-1]])
            out = (jdsp.asi32(r_held // np.uint32(2)
                              - prev // np.uint32(2)).astype(f32)
                   * jdsp.SCALE31).reshape(nc, B)
            new_carry['np%d' % si] = jnp.where(
                has_act, r_held[last_ir], nprev)
        else:  # N_BV
            odd = (n & np.uint32(1)).astype(bool)
            sb1 = jnp.where(
                odd, (jdsp.asi32(jdsp.ranfast32(n)) >> 31) * 2 + 1, 0)
            r2, row_last, row_act = held_roll(sb1)
            row_hold = _row_fill(row_last, row_act,
                                 jdsp.asi32(nprev))
            s_held = jnp.where(mask2, sb1, row_hold[:, None]) \
                .reshape(nc * B)
            prev = jnp.concatenate(
                [jnp.reshape(jdsp.asi32(nprev), (1,)), s_held[:-1]])
            out = (s_held - prev).astype(f32).reshape(nc, B)
            new_carry['np%d' % si] = jnp.where(
                has_act, jdsp.asu32(s_held[last_ir]), nprev)
        vals[s.dst] = out

    # -- public API ---------------------------------------------------------

    def run(self, st, recs):
        """Render the epoch; returns (st', outs (nb, B, 2) f32)."""
        xs = {'lens': self.t_lens.astype(np.int32),
              'last_ir': np.ascontiguousarray(self.t_last_ir.T),
              'act': np.ascontiguousarray(self.t_act.T),
              'first': np.arange(self.nch) == 0}
        if self.line_sis:
            xs['lv0'] = np.ascontiguousarray(
                self.t_lv0.transpose(1, 0, 2))
            xs['lvt'] = np.ascontiguousarray(
                self.t_lvt.transpose(1, 0, 2))
            xs['lpos'] = np.ascontiguousarray(
                self.t_lpos.transpose(1, 0, 2))
            xs['lend'] = np.ascontiguousarray(
                self.t_lend.transpose(1, 0, 2))
            xs['lflags'] = np.ascontiguousarray(
                self.t_lflags.transpose(1, 0, 2))
        if self.noise_sis:
            xs['noff'] = np.ascontiguousarray(
                self.t_noff.transpose(1, 0, 2))
        bake = self.bake
        end_tabs = {'lv0': bake.end_lv0, 'lvt': bake.end_lvt,
                    'lpos': bake.end_lpos, 'lend': bake.end_lend,
                    'ltype': bake.end_ltype,
                    'lflags': bake.end_lflags,
                    'time': bake.end_time, 'tinf': bake.end_tinf,
                    'vdur': bake.end_vdur}
        st, outs = self._fn(st, recs, xs, end_tabs)
        outs = outs.reshape(self.nch * self.nc, self.B, 2)[:self.nb]
        return st, outs
