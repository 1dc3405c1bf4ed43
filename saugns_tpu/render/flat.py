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

import functools
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from ..lang import program as P
from . import jdsp
from .engine import (C_LEND, C_LFLAGS, C_LPOS, C_LTYPE, C_LV0, C_LVT,
                     C_NN, C_NPREV, C_PHASE, C_RCPHI, C_RCPLO, C_RFB,
                     C_RPS, C_TIME, C_TINF, C_WFB, C_WPPH, C_WPS,
                     C_WRESET, apply_records, line_run_vec)
from .plan import (K_CONST1, K_LINE, K_MIX, K_NOISE, K_RANGEMOD,
                   K_RCYCLE, K_RRUN, K_RRUN_SELF, K_VMIX, K_WPHASE,
                   K_WRUN, K_WRUN_SELF, K_ZERO)

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32
u64 = jnp.uint64

FLAT_CHUNK = 1 << 21   # samples per device chunk (8 MiB per buffer)
STREAM_GROUP = 8       # chunks per device dispatch (memory bound)

# noise color indices (P.NOISE_NAMES order)
N_WH, N_GW, N_BW, N_TW, N_RE, N_VI, N_BV = range(7)


def _u(x):
    return jax.lax.bitcast_convert_type(x, u32)


def _i(x):
    return jax.lax.bitcast_convert_type(x, i32)


def _row_fill(row_vals, row_active, seed):
    """Per-row carry fill: out[r] = row_vals at the last active row
    <= r, or ``seed`` if none yet. Rows are few (<= chunk blocks);
    lax.cummax keeps the lowering to XLA's native cumulative path
    (same integer results as the old associative_scan(maximum))."""
    nc = row_vals.shape[0]
    ridx = jnp.arange(nc, dtype=i32)
    last = jax.lax.cummax(jnp.where(row_active, ridx + 1, 0), axis=0)
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
    (wosc.h:247-261). The all-valid and isolated-invalid cases unify
    branchlessly (a shifted copy selected per lane: where valid is
    True the shift is a no-op, so the all-valid fast path costs one
    fused select instead of a lax.cond -- cond thunks dominate the
    launch count on TPU, ~2 ms of slice/copy plumbing per render on
    misc1). Only the rare run-of-invalids case (>= 2 consecutive
    pd == 0 samples) takes a conditional into the gather-free
    associative scan (combine keeps the right operand when valid;
    index-then-gather would serialize on TPU)."""
    if jdsp._on_tpu() and jdsp._tap_kernel_mode() == 'window':
        # one sequential-grid Pallas pass (VMEM log-doubling + SMEM
        # carry): scan semantics at every position, no cond -- under
        # vmap a lax.cond lowers to select and BOTH branches run,
        # which made the scan tree's per-level slice/pad HBM round
        # trips ~60% of a 1024-voice bank's device time
        return jdsp.forward_fill_last_valid(s_raw, valid, seed)
    bad = (~valid) & in_range
    # a valid source precedes position i if sample i-1 is valid; the
    # seed is always a source at position 0
    src_prev = jnp.concatenate(
        [jnp.ones((1,), bool), valid[:-1]])
    pair = bad & ~src_prev

    def fast(_):
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
        _count_nonzero_mxu(pair) == zero, fast, slow, None)


class FlatSegment:
    """Compiled flat renderer for one eligible segment (a block range
    of an epoch with constant operator bindings and oscillator records
    only at its first block). The jitted function is cached by
    structural signature -- operator ids, record ranges, and active
    flags enter as data -- so every segment of an epoch (and any other
    epoch with the same schedule) shares one compile."""

    _cache: Dict = {}

    def __init__(self, plan, ep, bake, seg, srate,
                 chunk_samples=None, row_multiple=1):
        from .engine import _ensure_compile_cache
        _ensure_compile_cache()
        self.plan = plan
        self.ep = ep
        self.bake = bake
        self.seg = seg
        self.srate = srate
        stage_sig, inst_src, _ = ep.sig
        self.stage_sig = stage_sig
        lo, hi = seg.lo, seg.hi
        nb = hi - lo
        B = ep.block
        # chunk_samples caps the per-chunk working set: vmapped
        # consumers (voice banks) shrink it so the traced body stays
        # small -- Mosaic compile time grows superlinearly with the
        # per-chunk array sizes (a (8, 12, 65536) bank body never
        # finished compiling through the dev-rig tunnel; (8, 2,
        # 65536) with an inner 6-step scan compiles fine)
        cap = max((chunk_samples or FLAT_CHUNK) // B, 1)
        # quantize the padded block count (8 steps per octave) so
        # segments of similar size share one compile while padding
        # waste stays under ~12% (power-of-2 rounding cost 45% on an
        # 88-block epoch)
        q = 1
        while q * 8 < nb:
            q *= 2
        nb_r = -(-nb // q) * q
        # row_multiple: round the padded block-row count up so the
        # row axis divides a mesh axis (time-axis sharding,
        # parallel/timeshard.py); padded rows are inert (lens 0)
        if row_multiple > 1:
            nb_r = -(-nb_r // row_multiple) * row_multiple
        nc = min(cap, nb_r)
        nch = -(-nb_r // nc)
        # chunks run in groups of <= STREAM_GROUP under one dispatch;
        # bounded memory for arbitrarily long segments, and the last
        # group is padded with inert chunks so one compile serves all.
        # The group width is balanced across groups (ceil(nch/ng), not
        # STREAM_GROUP): unbalanced groups padded a 12-chunk bank
        # segment to 2x8 slots -- 25% of the render spent on inert
        # chunks. Single-group segments (nch <= STREAM_GROUP, the
        # common corpus shape) are unaffected.
        gch = min(nch, STREAM_GROUP)
        ng = -(-nch // gch)
        gch = -(-nch // ng)
        nch = ng * gch
        nb_r = nch * nc
        self.lo, self.nb, self.B, self.nc, self.nch = lo, nb, B, nc, nch
        self.gch, self.ng = gch, ng
        self.stage_op = tuple(int(x) for x in
                              np.asarray(ep.blk_stage_op[lo]).ravel()) \
            if len(ep.stages) else ()
        self.inst_op = tuple(int(x) for x in
                             np.asarray(ep.blk_inst_op[lo]).ravel()) \
            if len(ep.instances) else ()
        self._bake_tables()
        self._fn = self._build()

    # -- host-side chunk table assembly ----------------------------------

    def _bake_tables(self):
        ep, bake, seg = self.ep, self.bake, self.seg
        lo, nb, B, nc, nch = self.lo, self.nb, self.B, self.nc, self.nch
        hi = seg.hi
        pad = nch * nc - nb

        def padb(a, fill=0):
            a = np.asarray(a)[lo:hi]
            if pad == 0:
                return a
            w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, w, constant_values=fill)

        n_insts = max(len(ep.instances), 1)
        lens = padb(bake.lens if bake.lens is not None
                    else np.zeros((hi, n_insts), np.int32))
        self.t_lens = lens.reshape(nch, nc, -1)
        # per-K_LINE-stage state tables, stacked (n_line, nch, nc)
        self.line_sis = [si for si, st_ in enumerate(ep.stages)
                         if st_.kind == K_LINE]
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
        self.noise_sis = [si for si, st_ in enumerate(ep.stages)
                          if st_.kind == K_NOISE]
        if self.noise_sis:
            # noise counter offsets relative to segment start (the
            # device re-reads the op's counter at segment entry)
            self.t_noff = np.stack(
                [padb(np.asarray(bake.stages[si].noff)
                      - bake.stages[si].noff[lo])
                 for si in self.noise_sis]) \
                .reshape(len(self.noise_sis), nch, nc).astype(np.uint32)
        # stateful stages: per-chunk last in-range flat index + active
        self.state_sis = [si for si, st_ in enumerate(ep.stages)
                          if st_.kind in (K_WRUN, K_NOISE,
                                          K_WRUN_SELF, K_RRUN_SELF)]
        li_tab = np.zeros((max(len(self.state_sis), 1), nch), np.int32)
        fi_tab = np.zeros((max(len(self.state_sis), 1), nch), np.int32)
        act_tab = np.zeros((max(len(self.state_sis), 1), nch), bool)
        for k, si in enumerate(self.state_sis):
            inst = ep.stages[si].inst
            sl = lens[:, inst].reshape(nch, nc)
            for c in range(nch):
                rows = np.nonzero(sl[c] > 0)[0]
                if len(rows):
                    r = rows[-1]
                    li_tab[k, c] = r * B + sl[c, r] - 1
                    fi_tab[k, c] = rows[0] * B
                    act_tab[k, c] = True
        self.t_last_ir = li_tab
        self.t_first_ir = fi_tab
        self.t_act = act_tab
        # per-stage totals / activity over the segment
        self.noise_total = {}
        for si in self.noise_sis:
            inst = ep.stages[si].inst
            self.noise_total[si] = np.uint32(
                np.sum(lens[:, inst].astype(np.uint64))
                & np.uint64(0xffffffff))
        self.stage_active = {si: bool(np.any(
            lens[:, ep.stages[si].inst] > 0))
            for si in range(len(ep.stages))}
        self._analyze_const_lines()

    def _analyze_const_lines(self):
        """Constant-line analysis: a K_LINE stage whose blocks never
        carry an active goal holds v0 for every sample (sauLine_run's
        no-goal path, sau/line.c:417-445), optionally scaled by its
        multiplier when STATE_RATIO is set -- so its output is a
        per-block *scalar*, not an (nc, B) buffer. Downstream, a
        scalar-frequency phase cumsum collapses to an exact affine
        ramp (inc * count mod 2^32/2^64), replacing the MXU limb
        prefix scan. This is the shape of every generated voice bank
        (all parameters constant) and of held parameters in ordinary
        scripts; outputs stay bitwise identical."""
        from .engine import LF_GOAL, LF_SRATIO
        ep, bake = self.ep, self.bake
        lo, hi = self.seg.lo, self.seg.hi
        const_ids = set()     # buffer ids scalar-valued *at this point*
        const_sis = []
        const_mul = {}
        scalar_freq = {}      # K_WPHASE/K_RCYCLE si -> freq is scalar
        for si, st_ in enumerate(ep.stages):
            if st_.kind == K_LINE:
                bs = bake.stages.get(si)
                flags = np.asarray(bs.flags)[lo:hi] \
                    if bs is not None else None
                needs_mul = flags is not None \
                    and bool(np.any(flags & LF_SRATIO)) and st_.a >= 0
                if flags is not None \
                        and not np.any(flags & LF_GOAL) \
                        and (not needs_mul or st_.a in const_ids):
                    const_ids.add(st_.dst)
                    const_sis.append(si)
                    const_mul[si] = needs_mul
                else:
                    const_ids.discard(st_.dst)
                continue
            if st_.kind in (K_WPHASE, K_RCYCLE):
                scalar_freq[si] = st_.a in const_ids
            # every other stage writes dst (K_RCYCLE also dst+1)
            const_ids.discard(st_.dst)
            if st_.kind == K_RCYCLE:
                const_ids.discard(st_.dst + 1)
        self.const_sis = tuple(const_sis)
        self.const_mul = tuple(const_mul[si] for si in const_sis)
        self.scalar_freq = tuple(sorted(
            si for si, ok in scalar_freq.items() if ok))

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
        n_insts = len(ep.instances)

        # carries: one slot per stateful stage
        ph_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_WPHASE]
        cy_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_RCYCLE]
        wr_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_WRUN]
        ws_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_WRUN_SELF]
        rs_sis = [si for si, s in enumerate(stages)
                  if s.kind == K_RRUN_SELF]
        no_sis = list(self.noise_sis)

        def init_fn(st, recs, dyn):
            # operator bindings, record ranges, activity flags and
            # counter totals are data, so one compile serves every
            # segment with this schedule signature
            # device-authoritative columns only: fini_fn overwrites
            # every host-authoritative column (line slots, time,
            # vdur) from the host sim's end tables, so the full
            # sauLine_copy machinery would be dead weight here
            st = jax.lax.cond(
                dyn['rec_hi'] > dyn['rec_lo'],
                lambda s_: apply_records(s_, dyn['rec_lo'],
                                         dyn['rec_hi'], recs,
                                         device_cols_only=True),
                lambda s_: s_, st)

            def op_of(si):
                return dyn['ops'][si]

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
            for si in ws_sis:
                # wosc self-PM: prev phase / prev sample / feedback
                # memory / pending reset (wosc.h:273-310 state)
                op = op_of(si)
                carry0['pp%d' % si] = _u(st['si'][op, C_WPPH])
                carry0['ps%d' % si] = st['sf'][op, C_WPS]
                carry0['fb%d' % si] = st['sf'][op, C_WFB]
                carry0['rst%d' % si] = st['si'][op, C_WRESET] != 0
            for si in rs_sis:
                # rasg self-PM: prev sample / feedback memory
                op = op_of(si)
                carry0['ps%d' % si] = st['sf'][op, C_RPS]
                carry0['fb%d' % si] = st['sf'][op, C_RFB]
            for si in no_sis:
                op = op_of(si)
                carry0['nn%d' % si] = _u(st['si'][op, C_NN])
                carry0['np%d' % si] = _u(st['si'][op, C_NPREV])
            return st, carry0

        from .engine import LF_SRATIO
        const_set = frozenset(self.const_sis)
        const_mul = dict(zip(self.const_sis, self.const_mul))
        sfreq_set = frozenset(self.scalar_freq)

        def scan_fn(carry, xs_tables):
            jdsp.get_tables()
            idx_b = jnp.arange(B, dtype=i32)[None, :]

            def chunk(carry, xs):
                lens = xs['lens']                      # (nc, n_insts)
                vals: Dict[int, jnp.ndarray] = {}
                sval: Dict[int, jnp.ndarray] = {}  # (nc,) scalar rows
                mixl = jnp.zeros((nc, B), f32)
                mixr = jnp.zeros((nc, B), f32)
                new_carry = dict(carry)

                def stage_len(s):
                    return lens[:, s.inst]

                def mask_of(s):
                    return idx_b < stage_len(s)[:, None]

                def getb(bid):
                    """Buffer view of a value (scalar rows broadcast
                    lazily; XLA fuses the broadcast into consumers)."""
                    if bid in vals:
                        return vals[bid]
                    return jnp.broadcast_to(sval[bid][:, None],
                                            (nc, B))

                def setb(bid, v):
                    sval.pop(bid, None)
                    vals[bid] = v

                def row_ramp(fv, s, cf, dtype, inclusive):
                    """Exact affine phase run for a scalar-frequency
                    row: inc * count (mod 2^32/2^64) + exclusive
                    row-total prefix -- identical (integer) to the
                    flat prefix sum over masked per-sample incs."""
                    inc = jdsp.ftoi(cf * fv).astype(dtype)      # (nc,)
                    ln = stage_len(s)
                    cap = ln[:, None]
                    cnt = jnp.minimum(idx_b + (1 if inclusive else 0),
                                      cap).astype(dtype)
                    row_tot = inc * ln.astype(dtype)
                    row_base = jnp.concatenate(
                        [jnp.zeros(1, dtype),
                         jnp.cumsum(row_tot)[:-1]])
                    run = row_base[:, None] + inc[:, None] * cnt
                    total = row_base[-1] + row_tot[-1]
                    return run, total

                for si, s in enumerate(stages):
                    kind = s.kind
                    mask2 = mask_of(s)
                    if kind == K_LINE:
                        k = line_pos[si]
                        if si in const_set:
                            # goal-less hold: out == v0 (x mul when
                            # STATE_RATIO) for every sample -- a
                            # per-row scalar, bitwise equal to the
                            # line_run_vec no-goal path
                            v0r = xs['lv0'][k]
                            if const_mul[si]:
                                v = jnp.where(
                                    (xs['lflags'][k]
                                     & LF_SRATIO) != 0,
                                    v0r * sval[s.a], v0r)
                            else:
                                v = v0r
                            vals.pop(s.dst, None)
                            sval[s.dst] = v
                            continue
                        ls = {'v0': xs['lv0'][k][:, None],
                              'vt': xs['lvt'][k][:, None],
                              'pos': xs['lpos'][k][:, None],
                              'end': xs['lend'][k][:, None],
                              'type': xs['lflags'][k][:, None] * 0,
                              'flags': xs['lflags'][k][:, None]}
                        mul = getb(s.a) if s.a >= 0 else None
                        out, _ = line_run_vec(
                            ls, B, stage_len(s)[:, None], mul,
                            static_type=s.ltype, idx=idx_b)
                        setb(s.dst, out)
                    elif kind == K_RANGEMOD:
                        par = getb(s.dst)
                        setb(s.dst, jnp.where(
                            mask2,
                            par + (getb(s.a) - par) * getb(s.b), par))
                    elif kind == K_CONST1:
                        setb(s.dst, jnp.ones((nc, B), f32))
                    elif kind == K_ZERO:
                        setb(s.dst, jnp.zeros((nc, B), f32))
                    elif kind == K_NOISE:
                        sval.pop(s.dst, None)
                        self._noise_stage(s, si, xs, carry, new_carry,
                                          vals, mask2, noise_pos,
                                          state_pos, nc, B, idx_b)
                    elif kind == K_WPHASE:
                        if si in sfreq_set:
                            run, total = row_ramp(sval[s.a], s, coeff,
                                                  u32, True)
                            run = carry['ph%d' % si] + run
                        else:
                            freq = getb(s.a)
                            incs = jnp.where(
                                mask2,
                                jdsp.ftoi(coeff * freq).astype(u32),
                                np.uint32(0))
                            run_flat = jdsp.prefix_sum(
                                incs.reshape(nc * B))
                            run = carry['ph%d' % si] \
                                + run_flat.reshape(nc, B)
                            total = run_flat[-1]
                        ofs = self._phase_ofs(s, getb,
                                              jdsp.P31, u32, (nc, B))
                        setb(s.dst, ofs + run)
                        new_carry['ph%d' % si] = carry['ph%d' % si] \
                            + total
                    elif kind == K_WRUN:
                        sval.pop(s.dst, None)
                        self._wrun_stage(s, si, xs, carry, new_carry,
                                         vals, mask2, stage_len(s),
                                         state_pos, nc, B, SLENu)
                    elif kind == K_WRUN_SELF:
                        sval.pop(s.dst, None)
                        self._wrun_self_stage(
                            s, si, xs, carry, new_carry, vals, getb,
                            mask2, stage_len(s), state_pos, nc, B,
                            SLENu)
                    elif kind == K_RRUN_SELF:
                        sval.pop(s.dst, None)
                        self._rrun_self_stage(
                            s, si, xs, carry, new_carry, vals, getb,
                            mask2, stage_len(s), state_pos, nc, B)
                    elif kind == K_RCYCLE:
                        r2x = s.ras[5]
                        coeff_e = np.float32(coeff * 2) if r2x \
                            else coeff
                        pscale = np.float32(jdsp.P31 * 2) if r2x \
                            else jdsp.P31
                        if si in sfreq_set:
                            excl, total = row_ramp(sval[s.a], s,
                                                   coeff_e, u64, False)
                            base = carry['cp%d' % si] + excl
                        else:
                            freq = getb(s.a)
                            incs = jnp.where(
                                mask2,
                                jdsp.ftoi(coeff_e * freq).astype(u64),
                                np.uint64(0))
                            csum_flat = jdsp.prefix_sum(
                                incs.reshape(nc * B))
                            csum = csum_flat.reshape(nc, B)
                            base = carry['cp%d' % si] + (csum - incs)
                            total = csum_flat[-1]
                        ofs = self._phase_ofs(s, getb, pscale,
                                              u64, (nc, B))
                        cph = ofs + base
                        setb(s.dst,
                             (cph >> np.uint64(32)).astype(u32))
                        phs = cph.astype(u32) >> np.uint32(1)
                        setb(s.dst + 1,
                             jdsp.asi32(phs).astype(f32)
                             * jdsp.SCALE31)
                        new_carry['cp%d' % si] = carry['cp%d' % si] \
                            + total
                    elif kind == K_RRUN:
                        rline, func, level, alpha, oflags, _ = s.ras
                        av, bv = jdsp.rasg_map(func, level, alpha,
                                               oflags, getb(s.a))
                        setb(s.dst, jdsp.rasg_shape(
                            rline, oflags, getb(s.dst), av, bv))
                    elif kind == K_MIX:
                        src = getb(s.a)
                        amp = getb(s.b)
                        prev = (getb(s.dst)
                                if s.dst in vals or s.dst in sval
                                else jnp.zeros((nc, B), f32)) \
                            if s.layer else jnp.zeros((nc, B), f32)
                        if s.wave_env:
                            s_amp = amp * np.float32(0.5)
                            sv = src * s_amp + jnp.abs(s_amp)
                            new = prev * sv if s.layer else sv
                        else:
                            new = prev + src * amp if s.layer \
                                else src * amp
                        if s.layer:
                            setb(s.dst, jnp.where(mask2, new, prev))
                        else:
                            setb(s.dst, jnp.where(mask2, new,
                                                  np.float32(0.0)))
                    elif kind == K_VMIX:
                        pan = getb(s.dst)
                        sv = getb(s.a) * amp_scale
                        sr = sv * pan
                        mixl = mixl + jnp.where(mask2, sv - sr,
                                                np.float32(0))
                        mixr = mixr + jnp.where(mask2, sv + sr,
                                                np.float32(0))
                out = jnp.stack([mixl, mixr], axis=-1)
                return new_carry, out

            carry_end, outs = jax.lax.scan(chunk, carry, xs_tables)
            return carry_end, outs

        def fini_fn(st, carry_end, end_tabs, dyn):
            def op_of(si):
                return dyn['ops'][si]

            # -- write back state (gated by per-stage activity) ---------
            sf, si_arr = st['sf'], st['si']

            def seti(arr, op, col, v, act):
                return arr.at[op, col].set(
                    jnp.where(act, v, arr[op, col]))

            for si in ph_sis:
                act = dyn['sact'][si]
                si_arr = seti(si_arr, op_of(si), C_PHASE,
                              _i(carry_end['ph%d' % si]), act)
            for si in cy_sis:
                act = dyn['sact'][si]
                cp = carry_end['cp%d' % si]
                si_arr = seti(si_arr, op_of(si), C_RCPLO,
                              _i(cp.astype(u32)), act)
                si_arr = seti(si_arr, op_of(si), C_RCPHI,
                              _i((cp >> np.uint64(32)).astype(u32)),
                              act)
            for si in wr_sis:
                act = dyn['sact'][si]
                op = op_of(si)
                si_arr = seti(si_arr, op, C_WPPH,
                              _i(carry_end['pp%d' % si]), act)
                sf = seti(sf, op, C_WPS, carry_end['ps%d' % si], act)
                si_arr = seti(si_arr, op, C_WRESET, 0, act)
            for si in ws_sis:
                act = dyn['sact'][si]
                op = op_of(si)
                si_arr = seti(si_arr, op, C_WPPH,
                              _i(carry_end['pp%d' % si]), act)
                sf = seti(sf, op, C_WPS, carry_end['ps%d' % si], act)
                sf = seti(sf, op, C_WFB, carry_end['fb%d' % si], act)
                si_arr = seti(si_arr, op, C_WRESET, 0, act)
            for si in rs_sis:
                act = dyn['sact'][si]
                op = op_of(si)
                sf = seti(sf, op, C_RPS, carry_end['ps%d' % si], act)
                sf = seti(sf, op, C_RFB, carry_end['fb%d' % si], act)
            for si in no_sis:
                act = dyn['sact'][si]
                op = op_of(si)
                # nn carry stays at its segment-start value; noff
                # tables are segment-relative, so the total adds once
                si_arr = seti(si_arr, op, C_NN,
                              _i(carry_end['nn%d' % si]
                                 + dyn['ntot'][noise_pos[si]]), act)
                si_arr = seti(si_arr, op, C_NPREV,
                              _i(carry_end['np%d' % si]), act)
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
            return st

        def fused_fn(st, recs, xs_list, end_tabs, dyn):
            # whole segment in one dispatch -- host-call latency per
            # jit invocation is material through the dev-rig tunnel
            st, carry = init_fn(st, recs, dyn)
            outs = []
            for xsg in xs_list:
                carry, o = scan_fn(carry, xsg)
                outs.append(o)
            st = fini_fn(st, carry, end_tabs, dyn)
            return st, tuple(outs)

        key = (stage_sig, self.B, self.nc, self.gch, srate,
               float(amp_scale), plan.n_ops, plan.n_voices,
               plan.n_recs, self.const_sis, self.const_mul,
               self.scalar_freq)
        self._key = key
        fns = FlatSegment._cache.get(key)
        if fns is None:
            fns = {'init': jax.jit(init_fn), 'scan': jax.jit(scan_fn),
                   'fini': jax.jit(fini_fn), 'fused': {},
                   'fused_py': fused_fn, 'group': {}}
            FlatSegment._cache[key] = fns
        if self.ng not in fns['fused']:
            fns['fused'][self.ng] = jax.jit(fused_fn)
        self._fused = fns['fused'][self.ng]
        self._fns_entry = fns
        return (fns['init'], fns['scan'], fns['fini'])

    # -- stage helpers (traced inside chunk) -------------------------------

    @staticmethod
    def _phase_ofs(s, getb, pscale, dtype, shape):
        if s.b >= 0 and s.c >= 0:
            s_pofs = getb(s.b) \
                + getb(s.c) * jdsp.HUMMID_INV * getb(s.a)
            return jdsp.ftoi(s_pofs * pscale).astype(dtype)
        if s.b >= 0:
            return jdsp.ftoi(getb(s.b) * pscale).astype(dtype)
        if s.c >= 0:
            s_pofs = getb(s.c) * jdsp.HUMMID_INV * getb(s.a)
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
        k = state_pos[si]
        has_act = xs['act'][k]
        last_ir = xs['last_ir'][k]
        first_ir = xs['first_ir'][k]
        pp_in = carry['pp%d' % si]
        row_hold = _row_fill(row_last, row_act, pp_in)   # (nc,)
        held = jnp.where(mask2, phase2, row_hold[:, None])
        ph_flat = held.reshape(nc * B)
        # an unconsumed reset (prepare/mode record) pairs the FIRST
        # ACTIVE sample with its own phase minus SLEN (wosc.h:215-231)
        # -- delayed modulators activate mid-segment, so this is not
        # necessarily sample 0
        do_rst = carry['rst%d' % si] & has_act
        ph_fi = ph_flat[first_ir]
        rst_prev = ph_fi - SLENu
        if jdsp.fused_fill_available():
            # the whole sample path -- tap gather, df64 Hermite,
            # shifted-Is diff, head/reset pairing, pd == 0 forward
            # fill -- in ONE Pallas pass (bitwise equal to the
            # composed chain below)
            out = jdsp.wosc_s_filled(
                wave, ph_flat, pp_in, carry['ps%d' % si],
                first_ir, do_rst, rst_prev)
            new_carry['pp%d' % si] = row_hold[-1]
            new_carry['ps%d' % si] = jnp.where(
                has_act, out[last_ir], carry['ps%d' % si])
            new_carry['rst%d' % si] = carry['rst%d' % si] & ~has_act
            vals[s.dst] = out.reshape(nc, B)
            return
        p_prev = jnp.concatenate([jnp.reshape(pp_in, (1,)),
                                  ph_flat[:-1]])
        p_prev = p_prev.at[first_ir].set(
            jnp.where(do_rst, rst_prev, p_prev[first_ir]))
        if jdsp.use_fused_osc():
            # one gather + one df64 Hermite per sample; the head and
            # reset rows are patched with scalar Is evaluations
            s_raw, valid = jdsp.wosc_s_shifted(
                wave, ph_flat, p_prev, pp_in, first_ir=first_ir,
                do_rst=do_rst, rst_prev=rst_prev)
        else:
            cells2 = jdsp.wosc_cells(ph_flat)
            taps2 = jdsp.gather_taps(cells2, wave)
            ptaps = jdsp.taps_at(pp_in >> jdsp.SLENBITS, wave)
            taps1 = jnp.concatenate([jnp.reshape(ptaps, (4, 1)),
                                     taps2[:, :-1]], axis=1)
            rtaps = jdsp.taps_at(rst_prev >> jdsp.SLENBITS, wave)
            fi32 = first_ir.astype(i32)
            old_col = jax.lax.dynamic_slice(
                taps1, (jnp.int32(0), fi32), (4, 1))
            taps1 = jax.lax.dynamic_update_slice(
                taps1, jnp.where(do_rst, rtaps[:, None], old_col),
                (jnp.int32(0), fi32))
            from ..dsp import wavetables as W
            x1 = (p_prev & np.uint32(W.SLENMASK)).astype(f32) \
                * jdsp.X_SCALE
            x2 = (ph_flat & np.uint32(W.SLENMASK)).astype(f32) \
                * jdsp.X_SCALE
            pd = jdsp.asi32(ph_flat - p_prev)
            s_raw, valid = jdsp._wosc_s64(wave, pd, x1, x2, taps1,
                                          taps2)
        out = _last_valid_fill(s_raw, valid, mask2.reshape(nc * B),
                               carry['ps%d' % si])
        new_carry['pp%d' % si] = row_hold[-1]
        new_carry['ps%d' % si] = jnp.where(has_act, out[last_ir],
                                           carry['ps%d' % si])
        new_carry['rst%d' % si] = carry['rst%d' % si] & ~has_act
        vals[s.dst] = out.reshape(nc, B)

    def _wrun_self_stage(self, s, si, xs, carry, new_carry, vals,
                         getb, mask2, slen, state_pos, nc, B, SLENu):
        """wosc self-PM (wosc.h:273-310) as one masked sequential pass
        over the chunk's flattened sample stream: the feedback
        recurrence is the one true per-sample chain, so it runs in the
        Pallas scalar-loop kernel (lax.scan off-TPU) while every other
        stage of the chunk stays parallel. Inactive samples (block
        masks) are skipped without advancing state -- exactly the
        sequential engine's block gating."""
        wave = s.wave
        phase2 = getb(s.a)                              # (nc, B) u32
        am2 = getb(s.b)                                 # (nc, B) f32
        k = state_pos[si]
        has_act = xs['act'][k]
        first_ir = xs['first_ir'][k]
        mask_flat = mask2.reshape(nc * B)
        ph_flat = phase2.reshape(nc * B)
        am_flat = am2.reshape(nc * B)
        pp_in = carry['pp%d' % si]
        # an unconsumed reset pairs the FIRST ACTIVE sample with its
        # own raw phase minus SLEN (wosc.h:215-231; the engine's
        # per-block reset consumes at the first length>0 block)
        do_rst = carry['rst%d' % si] & has_act
        rst_prev = ph_flat[first_ir] - SLENu
        pp0 = jnp.where(do_rst, rst_prev, pp_in)
        pilut = jdsp.get_tables()[1][wave]
        out, pp, ps, fb = jdsp.wosc_selfmod_masked(
            pilut, wave, ph_flat, am_flat, mask_flat, pp0,
            carry['ps%d' % si], carry['fb%d' % si])
        vals[s.dst] = out.reshape(nc, B)
        new_carry['pp%d' % si] = pp
        new_carry['ps%d' % si] = ps
        new_carry['fb%d' % si] = fb
        new_carry['rst%d' % si] = carry['rst%d' % si] & ~has_act

    def _rrun_self_stage(self, s, si, xs, carry, new_carry, vals,
                         getb, mask2, slen, state_pos, nc, B):
        """RasG self-PM (rasg.h:242-294,764-772): masked sequential
        pass over the flattened chunk stream (Pallas scalar kernel on
        TPU, lax.scan off-TPU); inputs are the K_RCYCLE stage's cycle
        (dst) and phase (dst+1) fills plus the self-PM amp buffer."""
        rline, func, level, alpha, oflags, _r2x = s.ras
        phase2 = getb(s.dst)                            # (nc, B) f32
        cycle2 = getb(s.a)                              # (nc, B) u32
        am2 = getb(s.b)
        mask_flat = mask2.reshape(nc * B)
        out, ps, fb = jdsp.rasg_selfmod_masked(
            func, rline, level, alpha, oflags,
            phase2.reshape(nc * B), cycle2.reshape(nc * B),
            am2.reshape(nc * B), mask_flat,
            carry['ps%d' % si], carry['fb%d' % si])
        vals[s.dst] = out.reshape(nc, B)
        new_carry['ps%d' % si] = ps
        new_carry['fb%d' % si] = fb

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

    def host_xs_groups(self):
        """Per-chunk-group xs tables as host numpy dicts."""
        xs = {'lens': self.t_lens.astype(np.int32),
              'last_ir': np.ascontiguousarray(self.t_last_ir.T),
              'first_ir': np.ascontiguousarray(self.t_first_ir.T),
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
        gch, ng = self.gch, self.ng
        out = []
        for g in range(ng):
            sl = slice(g * gch, (g + 1) * gch)
            out.append({k: np.ascontiguousarray(v[sl])
                        for k, v in xs.items()})
        return out

    def host_dyn(self):
        """Dynamic-binding arrays as host numpy."""
        ep = self.ep
        n_stages = len(ep.stages)
        sact = np.zeros(max(n_stages, 1), bool)
        for si in range(n_stages):
            sact[si] = self.stage_active[si]
        ntot = np.zeros(max(len(self.noise_sis), 1), np.uint32)
        for k, si in enumerate(self.noise_sis):
            ntot[k] = self.noise_total[si]
        return {'ops': np.asarray(self.stage_op, np.int32)
                if self.stage_op else np.zeros(1, np.int32),
                'rec_lo': np.int32(ep.blk_rec_lo[self.lo]),
                'rec_hi': np.int32(ep.blk_rec_hi[self.lo]),
                'sact': sact, 'ntot': ntot}

    def _upload(self):
        """One-time device upload of the baked tables (the tunnel
        moves host data at ~33 MB/s; per-render H2D would dominate)."""
        if getattr(self, '_xs_dev', None) is not None:
            return
        self._xs_groups = [
            {k: jax.device_put(v) for k, v in g.items()}
            for g in self.host_xs_groups()]
        seg = self.seg
        end_tabs = {'lv0': seg.end_lv0, 'lvt': seg.end_lvt,
                    'lpos': seg.end_lpos, 'lend': seg.end_lend,
                    'ltype': seg.end_ltype,
                    'lflags': seg.end_lflags,
                    'time': seg.end_time, 'tinf': seg.end_tinf,
                    'vdur': seg.end_vdur}
        self._end_dev = {k: jax.device_put(v)
                         for k, v in end_tabs.items()}
        self._dyn_dev = {k: jax.device_put(v)
                         for k, v in self.host_dyn().items()}

    def run(self, st, recs):
        """Render the segment in one device dispatch; returns
        (st', outs (nb, B, 2) f32). Use stream() for bounded-memory
        delivery of long segments."""
        import os
        if os.environ.get('SAUGNS_TPU_FUSED', '1') != '1':
            pieces = []
            for kind, val, nv in self.stream(st, recs):
                if kind == 'out':
                    pieces.append(val.reshape(self.gch * self.nc,
                                              self.B, 2))
                else:
                    st = val
            full = pieces[0] if len(pieces) == 1 \
                else jnp.concatenate(pieces, axis=0)
            return st, full[:self.nb]
        self._upload()
        st, outs = self._fused(st, recs, tuple(self._xs_groups),
                               self._end_dev, self._dyn_dev)
        pieces = [o.reshape(self.gch * self.nc, self.B, 2)
                  for o in outs]
        full = pieces[0] if len(pieces) == 1 \
            else jnp.concatenate(pieces, axis=0)
        return st, full[:self.nb]

    def stream(self, st, recs):
        """Yield ('out', outs (gch, nc, B, 2) f32, n_valid_blocks)
        per chunk group in order, then ('st', st'). Device memory per
        step is bounded by one group regardless of segment length."""
        self._upload()
        init_fn, scan_fn, fini_fn = self._fn
        st, carry = init_fn(st, recs, self._dyn_dev)
        done = 0
        for g, xsg in enumerate(self._xs_groups):
            carry, outs = scan_fn(carry, xsg)
            n_valid = min(self.nb - done, self.gch * self.nc)
            yield 'out', outs, n_valid
            done += n_valid
        st = fini_fn(st, carry, self._end_dev, self._dyn_dev)
        yield 'st', st, 0


# maximum f32 output bytes materialized by one grouped dispatch
GROUP_OUT_CAP = 1 << 29    # 512 MiB


def plan_groups(segs):
    """Partition a segment list into runs of consecutive segments
    that share one compiled template (same FlatSegment._cache key and
    chunk-group count), bounded by GROUP_OUT_CAP of f32 output."""
    import os
    allow = os.environ.get('SAUGNS_TPU_GROUP_SEGS', '1') == '1'
    groups = []
    i = 0
    while i < len(segs):
        s0 = segs[i]
        j = i + 1
        bytes_per = s0.ng * s0.gch * s0.nc * s0.B * 8
        if allow:
            total = bytes_per
            while j < len(segs) \
                    and segs[j]._key == s0._key \
                    and segs[j].ng == s0.ng \
                    and total + bytes_per <= GROUP_OUT_CAP:
                total += bytes_per
                j += 1
        groups.append(segs[i:j])
        i = j
    return groups


def group_stacked_args(group):
    """Device-resident stacked (xs, end_tabs, dyn) tables for a
    segment group, cached on the group's first segment."""
    s0 = group[0]
    k = len(group)
    for s_ in group:
        s_._upload()
    stk = getattr(s0, '_group_stk', None)
    if stk is None or s0._group_n != k:
        xs_stk = tuple(
            {kk: jnp.stack([s_._xs_groups[g][kk] for s_ in group])
             for kk in group[0]._xs_groups[g]}
            for g in range(s0.ng))
        end_stk = {kk: jnp.stack([s_._end_dev[kk] for s_ in group])
                   for kk in group[0]._end_dev}
        dyn_stk = {kk: jnp.stack([s_._dyn_dev[kk] for s_ in group])
                   for kk in group[0]._dyn_dev}
        stk = (xs_stk, end_stk, dyn_stk)
        s0._group_stk = stk
        s0._group_n = k
    return stk


def group_scan(fused_py, st, recs, stk):
    """lax.scan of one fused segment body over stacked per-segment
    tables. Returns (st', outs) with outs a tuple over chunk groups
    of (k, gch, nc, B, 2). Small groups unroll fully: the rolled
    scan's per-iteration dynamic slicing of ~60 xs leaves lowered to
    ~15 us slice kernels each (~17 ms per misc1 render); unrolled,
    the slices are static and fuse into their consumers."""
    k = jax.tree_util.tree_leaves(stk)[0].shape[0]
    def body(st, per_seg):
        xs_list, end_tabs, dyn = per_seg
        st, outs = fused_py(st, recs, xs_list, end_tabs, dyn)
        return st, outs
    return jax.lax.scan(body, st, stk, unroll=k if k <= 8 else 1)


def split_group_outs(group, outs):
    """Per-segment (nb, B, 2) views of group_scan outputs."""
    full_list = []
    for si, s_ in enumerate(group):
        pieces = [o[si].reshape(s_.gch * s_.nc, s_.B, 2)
                  for o in outs]
        full = pieces[0] if len(pieces) == 1 \
            else jnp.concatenate(pieces, axis=0)
        full_list.append(full[:s_.nb])
    return full_list


def run_segments_grouped(segs, st, recs):
    """Render a list of FlatSegments in order, yielding
    (st', seg, outs (nb, B, 2) f32) per segment.

    Consecutive segments that share one compiled template (same
    FlatSegment._cache key and chunk-group count) run as ONE
    ``lax.scan`` over the stacked per-segment tables -- one device
    dispatch for the whole run. Through the dev-rig tunnel each
    dispatch boundary costs a ~20 ms host round trip (measured:
    misc1-4fm_pm's four per-epoch dispatches spent 69 ms in
    inter-dispatch gaps vs 58 ms of device work), so sequences of
    structurally identical epochs -- the shape of every
    note-sequence script -- collapse to a single launch."""
    for group in plan_groups(segs):
        s0 = group[0]
        if len(group) == 1:
            st, outs = s0.run(st, recs)
            yield st, s0, outs
            continue
        k = len(group)
        fns = s0._fns_entry
        gfn = fns['group'].get((s0.ng, k))
        if gfn is None:
            fused_py = fns['fused_py']
            gfn = jax.jit(functools.partial(group_scan, fused_py))
            fns['group'][(s0.ng, k)] = gfn
        stk = group_stacked_args(group)
        st, outs = gfn(st, recs, stk)
        for s_, full in zip(group, split_group_outs(group, outs)):
            yield st, s_, full
