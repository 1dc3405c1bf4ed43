"""TPU render engine: executes a RenderPlan with JAX.

The whole program timeline runs on device: each epoch is one
``lax.scan`` over event-aligned sample blocks. A scan step applies the
block's parameter-update records (sparse scatters; mirrors
handle_event/update_op, sau/generator.c:245-377), then executes the
epoch's static stage schedule -- the unrolled operator-DAG traversal --
as masked vector ops over (BLOCK,) buffers, and accumulates the stereo
mix. Per-sample recurrences (self-PM feedback) run as inner scans;
everything else is closed-form / prefix-sum vectorized.

Float32 throughout (TPU-native); integer phase state is exact u32/u64.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import os

import jax

# exact u32/u64 phase arithmetic requires 64-bit integer support
jax.config.update('jax_enable_x64', True)
# TPU (Mosaic) compiles of gather-bearing scan bodies are expensive;
# cache compilations persistently across processes
_cache_dir = os.environ.get('SAUGNS_TPU_CACHE',
                            os.path.expanduser('~/.cache/saugns_tpu_xla'))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:
    pass

import jax.numpy as jnp

from ..dsp import prim
from ..dsp import wavetables as W
from ..lang import program as P
from . import jdsp
from .plan import (BLOCK, K_CONST1, K_LINE, K_MIX, K_NOISE, K_RANGEMOD,
                   K_RCYCLE, K_RRUN, K_RRUN_SELF, K_VMIX, K_WPHASE,
                   K_WRUN, K_WRUN_SELF, K_ZERO, L_AMP, L_AMP2, L_FREQ,
                   L_FREQ2, L_PAN, L_PMA, RenderPlan)

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32
u64 = jnp.uint64

BIG_TIME = np.int32(0x7fffffff)

# line flags
LF_STATE = P.LINEP_STATE
LF_SRATIO = P.LINEP_STATE_RATIO
LF_GOAL = P.LINEP_GOAL
LF_GRATIO = P.LINEP_GOAL_RATIO
LF_TYPE = P.LINEP_TYPE
LF_TIME = P.LINEP_TIME
LF_TIFNEW = P.LINEP_TIME_IF_NEW

SIN_ADJ = np.uint32(W.PICOEFFS[W.N_sin][2] & 0xffffffff)


def make_state(plan: RenderPlan):
    n = plan.n_ops
    nv = plan.n_voices
    z = lambda dt: jnp.zeros((n, 6) if dt == 'line' else (n,),
                             dtype=jnp.float32)
    st = {
        'lv0': jnp.zeros((n, 6), f32),
        'lvt': jnp.zeros((n, 6), f32),
        'lpos': jnp.zeros((n, 6), i32),
        'lend': jnp.zeros((n, 6), i32),
        'ltype': jnp.zeros((n, 6), i32),
        'lflags': jnp.zeros((n, 6), i32),
        'time': jnp.zeros((n,), i32),
        'tinf': jnp.zeros((n,), jnp.bool_),
        'phase': jnp.zeros((n,), u32),
        'wave': jnp.zeros((n,), i32),
        'wreset': jnp.zeros((n,), i32),
        'wpphase': jnp.zeros((n,), u32),
        'wps': jnp.zeros((n,), f32),
        'wfb': jnp.zeros((n,), f32),
        'rcp': jnp.zeros((n,), u64),
        'rline': jnp.zeros((n,), i32),
        'rfunc': jnp.zeros((n,), i32),
        'rlevel': jnp.zeros((n,), i32),
        'ralpha': jnp.zeros((n,), u32),
        'rflags': jnp.zeros((n,), i32),
        'rrate2x': jnp.zeros((n,), jnp.bool_),
        'rps': jnp.zeros((n,), f32),
        'rfb': jnp.zeros((n,), f32),
        'nn': jnp.zeros((n,), u32),
        'nprev': jnp.zeros((n,), u32),
        'ntype': jnp.zeros((n,), i32),
        'vdur': jnp.zeros((nv,), i32),
    }
    return st


# -- line state machine ------------------------------------------------------

def line_run_vec(ls, B, length, mulbuf, static_type=None):
    """sauLine_run vectorized over one (op, slot) scalar state ``ls``
    (dict of scalars). ``static_type``: plan-baked fill shape (python
    int) to prune the 13-way dispatch. Returns (out (B,), new_ls)."""
    v0 = ls['v0']
    vt = ls['vt']
    pos = ls['pos']
    end = ls['end']
    typ = ls['type']
    flags = ls['flags']
    goal = (flags & LF_GOAL) != 0
    gratio = (flags & LF_GRATIO) != 0
    sratio = (flags & LF_SRATIO) != 0
    has_mul = mulbuf is not None
    if has_mul:
        m0 = mulbuf[0]
        v0 = jnp.where(goal & gratio & ~sratio, v0 / m0, v0)
        v0 = jnp.where(goal & ~gratio & sratio, v0 * m0, v0)
    sratio_g = jnp.where(goal, gratio, sratio)
    idx = jnp.arange(B, dtype=i32)
    remaining = jnp.maximum(end - pos, 0)
    lg = jnp.where(goal, jnp.minimum(remaining, length), 0)
    fillv = jdsp.line_fill(typ if static_type is None else static_type,
                           (pos + idx).astype(u32), end, v0, vt)
    if has_mul:
        fillv = jnp.where(gratio, fillv * mulbuf, fillv)
    adv = jnp.where(goal, lg, jnp.minimum(remaining, length))
    pos_new = pos + adv
    reached = pos_new >= end
    v0_after = jnp.where(goal & reached, vt, v0)
    sahv = jnp.full((B,), 1.0, f32) * v0_after
    if has_mul:
        sahv = jnp.where(sratio_g, sahv * mulbuf, sahv)
    out = jnp.where(idx < lg, fillv, sahv)
    # flags/pos transitions
    clear_goal = goal & reached
    clear_time = reached  # both paths clear TIME on expiry
    flags_new = flags
    flags_new = jnp.where(goal,
                          (flags_new & ~(LF_SRATIO))
                          | jnp.where(gratio, LF_SRATIO, 0), flags_new)
    flags_new = jnp.where(clear_goal,
                          flags_new & ~(LF_GOAL | LF_GRATIO | LF_TIME),
                          flags_new)
    flags_new = jnp.where(~goal & reached, flags_new & ~LF_TIME,
                          flags_new)
    pos_final = jnp.where(reached, 0, pos_new)
    new = dict(ls)
    new['v0'] = v0_after
    new['pos'] = pos_final
    new['flags'] = flags_new
    return out, new


def line_skip_vec(ls, length):
    """sauLine_skip (sau/line.c:456-473) on scalar state."""
    pos = ls['pos']
    end = ls['end']
    flags = ls['flags']
    goal = (flags & LF_GOAL) != 0
    gratio = (flags & LF_GRATIO) != 0
    remaining = jnp.maximum(end - pos, 0)
    adv = jnp.minimum(remaining, length)
    pos_new = pos + adv
    reached = pos_new >= end
    new = dict(ls)
    new['pos'] = jnp.where(reached, 0, pos_new)
    fl = jnp.where(reached, flags & ~LF_TIME, flags)
    do_tr = reached & goal
    new['v0'] = jnp.where(do_tr, ls['vt'], ls['v0'])
    fl = jnp.where(do_tr & gratio, fl | LF_SRATIO, fl)
    fl = jnp.where(do_tr & ~gratio, fl & ~LF_SRATIO, fl)
    fl = jnp.where(do_tr, fl & ~(LF_GOAL | LF_GRATIO), fl)
    new['flags'] = fl
    return new


def _gather_line(st, op, slot):
    return {'v0': st['lv0'][op, slot], 'vt': st['lvt'][op, slot],
            'pos': st['lpos'][op, slot], 'end': st['lend'][op, slot],
            'type': st['ltype'][op, slot], 'flags': st['lflags'][op, slot]}


def _scatter_line(st, op, slot, ls, gate):
    for k, key in (('v0', 'lv0'), ('vt', 'lvt'), ('pos', 'lpos'),
                   ('end', 'lend'), ('type', 'ltype'),
                   ('flags', 'lflags')):
        cur = st[key][op, slot]
        st[key] = st[key].at[op, slot].set(jnp.where(gate, ls[k], cur))
    return st


# -- record application ------------------------------------------------------

def _line_copy_scalar(cur, rflags, rv0, rvt, rend, rtype, present):
    """sauLine_copy (sau/line.c:287-332) on scalar line state."""
    src_state = (rflags & LF_STATE) != 0
    src_goal = (rflags & LF_GOAL) != 0
    src_type = (rflags & LF_TYPE) != 0
    src_time = (rflags & LF_TIME) != 0
    src_tifnew = (rflags & LF_TIFNEW) != 0
    cur_goal = (cur['flags'] & LF_GOAL) != 0
    cur_gratio = (cur['flags'] & LF_GRATIO) != 0
    cur_sratio = (cur['flags'] & LF_SRATIO) != 0

    mask = jnp.where(src_state, LF_STATE | LF_SRATIO, 0)
    # "pick current point" when old goal unfinished & replaced
    # (get of 1 sample with NULL mulbuf; ratio flag flips included)
    within = cur['pos'] < cur['end']
    pick = ~src_state & cur_goal & src_goal
    at_val = jdsp.line_val_at(cur['type'], cur['pos'], cur['end'],
                              cur['v0'], cur['vt'])
    v0 = jnp.where(src_state, rv0,
                   jnp.where(pick & within, at_val, cur['v0']))
    # get()'s ratio flag flips apply when pick path runs
    fl = cur['flags']
    fl = jnp.where(pick & cur_gratio & ~cur_sratio, fl | LF_SRATIO, fl)
    fl = jnp.where(pick & ~cur_gratio & cur_sratio, fl & ~LF_SRATIO, fl)

    vt = jnp.where(src_goal, rvt, cur['vt'])
    end = jnp.where(src_goal & src_tifnew,
                    cur['end'] - cur['pos'], cur['end'])
    pos = jnp.where(src_goal, 0, cur['pos'])
    mask = mask | jnp.where(src_goal, LF_GOAL | LF_GRATIO, 0)
    typ = jnp.where(src_type, rtype, cur['type'])
    mask = mask | jnp.where(src_type, LF_TYPE, 0)
    cur_time = (fl & LF_TIME) != 0
    time_override = (~cur_time | ~src_tifnew) & src_time
    end = jnp.where(time_override, rend, end)
    mask = mask | jnp.where(time_override, LF_TIME, 0)
    fl = (fl & ~mask) | (rflags & mask)
    out = dict(cur)
    for k, v in (('v0', v0), ('vt', vt), ('pos', pos), ('end', end),
                 ('type', typ), ('flags', fl)):
        out[k] = jnp.where(present, v, cur[k])
    return out


def apply_records(st, lo, hi, recs):
    """Apply update records [lo, hi) (handle_event + update_op,
    sau/generator.c:245-377)."""

    def body(ri, st):
        g = lambda k: recs[k][ri]
        op = g('op')
        kind = g('kind')
        is_op = kind == 0

        # --- prepare (prepare_op, generator.c:245-278) ---------------
        prep = g('prepare') & is_op
        typ = g('type')
        for key, dv in (('lv0', 0.0), ('lvt', 0.0)):
            st[key] = st[key].at[op].set(
                jnp.where(prep, jnp.zeros(6, f32), st[key][op]))
        for key in ('lpos', 'lend', 'ltype', 'lflags'):
            st[key] = st[key].at[op].set(
                jnp.where(prep, jnp.zeros(6, i32), st[key][op]))
        def setp(key, val):
            st[key] = st[key].at[op].set(
                jnp.where(prep, jnp.asarray(val, st[key].dtype),
                          st[key][op]))
            return st
        st = setp('time', 0)
        st = setp('tinf', False)
        st = setp('phase', SIN_ADJ)
        st = setp('wave', W.N_sin)
        st = setp('wreset', 1)
        st = setp('wpphase', 0)
        st = setp('wps', 0.0)
        st = setp('wfb', 0.0)
        st = setp('rcp', 0)
        st = setp('rline', 1)      # SAU_LINE_N_lin
        st = setp('rfunc', P.RAS_F_URAND)
        st = setp('rlevel', P.ras_level(9))
        st = setp('ralpha', prim.FIBH32)
        st = setp('rflags', 0)
        st = setp('rrate2x', True)
        st = setp('rps', 0.0)
        st = setp('rfb', 0.0)
        st = setp('nn', 0)
        st = setp('nprev', 0)
        st = setp('ntype', 0)

        # --- update (update_op, generator.c:283-343) ------------------
        params = g('params')
        has_mode = is_op & ((params & P.POPP_MODE) != 0)
        has_phase = is_op & ((params & P.POPP_PHASE) != 0)
        has_seed = is_op & ((params & P.POPP_SEED) != 0)
        has_time = is_op & ((params & P.POPP_TIME) != 0)
        is_noise = typ == P.POPT_NOISE
        is_wave = typ == P.POPT_WAVE
        is_rasg = typ == P.POPT_RASEG

        # noise
        st['ntype'] = st['ntype'].at[op].set(
            jnp.where(has_mode & is_noise, g('mode_main'),
                      st['ntype'][op]))
        st['nprev'] = st['nprev'].at[op].set(
            jnp.where(has_mode & is_noise, 0, st['nprev'][op]))
        st['nn'] = st['nn'].at[op].set(
            jnp.where(has_seed & is_noise, g('seed'), st['nn'][op]))

        # wave: set_wave (wosc.h:81-91), set_phase (wosc.h:73-79)
        wave_old = st['wave'][op]
        wave_new = jnp.where(has_mode & is_wave, g('mode_main'),
                             wave_old)
        adj_old = jdsp.PHASE_ADJ[wave_old]
        adj_new = jdsp.PHASE_ADJ[wave_new]
        ph = st['phase'][op]
        ph = jnp.where(has_mode & is_wave, ph + adj_new - adj_old, ph)
        st['wave'] = st['wave'].at[op].set(wave_new)
        st['wreset'] = st['wreset'].at[op].set(
            jnp.where(has_mode & is_wave, st['wreset'][op] | 1,
                      st['wreset'][op]))
        ph = jnp.where(has_phase & is_wave,
                       g('phase') + jdsp.PHASE_ADJ[wave_new], ph)
        st['phase'] = st['phase'].at[op].set(ph)

        # rasg: set_opt (rasg.h:97-119), set_phase, set_cycle
        rf = g('ras_flags')
        line_set = (rf & P.RAS_O_LINE_SET) != 0
        func_set = (rf & P.RAS_O_FUNC_SET) != 0
        level_set = (rf & P.RAS_O_LEVEL_SET) != 0
        alpha_set = (rf & P.RAS_O_ASUBVAL_SET) != 0
        upd_r = has_mode & is_rasg
        st['rline'] = st['rline'].at[op].set(
            jnp.where(upd_r & line_set, g('ras_line'), st['rline'][op]))
        st['rfunc'] = st['rfunc'].at[op].set(
            jnp.where(upd_r & func_set, g('ras_func'), st['rfunc'][op]))
        st['rlevel'] = st['rlevel'].at[op].set(
            jnp.where(upd_r & level_set, g('ras_level'),
                      st['rlevel'][op]))
        st['ralpha'] = st['ralpha'].at[op].set(
            jnp.where(upd_r & alpha_set, g('ras_alpha'),
                      st['ralpha'][op]))
        flags_eff = jnp.where(func_set, rf, rf | st['rflags'][op])
        st['rflags'] = st['rflags'].at[op].set(
            jnp.where(upd_r, flags_eff, st['rflags'][op]))
        # rate2x toggle preserving cycle/phase (rasg.h:111-118)
        old2x = st['rrate2x'][op]
        new2x = (flags_eff & P.RAS_O_HALFSHAPE) == 0
        cp = st['rcp'][op]
        cyc = ((cp >> np.uint64(32)).astype(u32) & np.uint32(~1 &
                                                            0xffffffff))
        phs = jnp.where(old2x, (cp >> np.uint64(1)).astype(u32),
                        cp.astype(u32))
        cp_re = (cyc.astype(u64) << np.uint64(32)) | jnp.where(
            new2x, phs.astype(u64) << np.uint64(1), phs.astype(u64))
        cp = jnp.where(upd_r & (new2x != old2x), cp_re, cp)
        st['rrate2x'] = st['rrate2x'].at[op].set(
            jnp.where(upd_r, new2x, old2x))
        r2x = jnp.where(upd_r, new2x, old2x)
        # set_phase (rasg.h:88-92)
        cyc2 = ((cp >> np.uint64(32)).astype(u32)
                & np.uint32(~1 & 0xffffffff))
        newph = g('phase')
        ph64 = jnp.where(r2x, newph.astype(u64) << np.uint64(1),
                         newph.astype(u64))
        cp = jnp.where(has_phase & is_rasg,
                       (cyc2.astype(u64) << np.uint64(32)) | ph64, cp)
        # set_cycle (rasg.h:76-86)
        phs2 = jnp.where(r2x, (cp >> np.uint64(1)).astype(u32),
                         cp.astype(u32))
        ph64b = jnp.where(r2x, phs2.astype(u64) << np.uint64(1),
                          phs2.astype(u64))
        seedc = (g('seed') & np.uint32(~1 & 0xffffffff)).astype(u64)
        cp = jnp.where(has_seed & is_rasg,
                       (seedc << np.uint64(32)) | ph64b, cp)
        st['rcp'] = st['rcp'].at[op].set(cp)

        # osc-common line copies: freq, freq2, pm_a
        is_osc = is_wave | is_rasg
        for slot in (L_FREQ, L_FREQ2, L_PMA):
            cur = _gather_line(st, op, slot)
            newl = _line_copy_scalar(
                cur, g('l%d_flags' % slot), g('l%d_v0' % slot),
                g('l%d_vt' % slot), g('l%d_end' % slot),
                g('l%d_type' % slot),
                is_osc & g('l%d_present' % slot))
            st = _scatter_line(st, op, slot, newl, is_op)

        # time
        st['time'] = st['time'].at[op].set(
            jnp.where(has_time, g('time_v'), st['time'][op]))
        st['tinf'] = st['tinf'].at[op].set(
            jnp.where(has_time, g('time_implicit'), st['tinf'][op]))

        # amp/amp2/pan copies (always attempted)
        for slot in (L_AMP, L_AMP2, L_PAN):
            cur = _gather_line(st, op, slot)
            newl = _line_copy_scalar(
                cur, g('l%d_flags' % slot), g('l%d_v0' % slot),
                g('l%d_vt' % slot), g('l%d_end' % slot),
                g('l%d_type' % slot), g('l%d_present' % slot))
            st = _scatter_line(st, op, slot, newl, is_op)

        # voice record: duration = carrier time (set_voice_duration)
        vo = g('vo')
        carr = g('carr')
        dur = jnp.where(st['tinf'][carr], 0, st['time'][carr])
        st['vdur'] = st['vdur'].at[vo].set(
            jnp.where(kind == 1, dur, st['vdur'][vo]))
        return st

    return jax.lax.fori_loop(lo, hi, body, st)


# -- epoch execution ---------------------------------------------------------

def build_epoch_fn(sig, n_stages, n_insts, n_bufs, B, amp_scale,
                   inst_parent, stage_voices, srate):
    """Build the scan step for one epoch schedule. ``sig`` is the
    static schedule tuple from the planner; per-stage operator ids and
    per-instance op ids arrive as traced arrays."""
    coeff = np.float32(np.float32(4294967296.0) / np.float64(srate))
    amp_scale = np.float32(amp_scale)

    def epoch_fn(st, blk_len, blk_rlo, blk_rhi, blk_stage_op,
                 blk_inst_op, recs):
        luts, piluts = jdsp.get_tables()

        def step(st, blk):
            blen, rlo, rhi, stage_op, inst_op = blk
            st = apply_records(st, rlo, rhi, recs)
            idx = jnp.arange(B, dtype=i32)
            bufs: Dict[int, jnp.ndarray] = {}
            mixl = jnp.zeros(B, f32)
            mixr = jnp.zeros(B, f32)
            lens = [None] * n_insts
            gates = [None] * n_insts
            inst_done = [False] * n_insts
            # voice gates
            vgate = {}
            vlen = {}
            for v in set(stage_voices):
                if v < 0:
                    continue
                vd = st['vdur'][v]
                vlen[v] = jnp.minimum(vd, blen)
                vgate[v] = (vd > 0) & (blen > 0)

            def inst_begin(ii, v):
                par = inst_parent[ii]
                op = inst_op[ii]
                plen = vlen[v] if par < 0 else lens[par]
                own = jnp.where(st['tinf'][op], BIG_TIME,
                                st['time'][op])
                lens[ii] = jnp.minimum(plen, own)
                g = vgate[v] if par < 0 else gates[par]
                # carrier gate includes time > 0 (run_voice guard)
                if par < 0:
                    g = g & ((st['time'][op] > 0) | st['tinf'][op])
                gates[ii] = g

            def inst_end(ii):
                op = inst_op[ii]
                newt = st['time'][op] - lens[ii]
                st['time'] = st['time'].at[op].set(
                    jnp.where(gates[ii] & ~st['tinf'][op], newt,
                              st['time'][op]))

            # find last stage index per instance
            last_stage = {}
            for si, s in enumerate(sig):
                if s[1] >= 0:
                    last_stage[s[1]] = si

            for si, s in enumerate(sig):
                (kind, inst, dst, a, b, c, line, wave_env, layer,
                 skip_line, freq_buf_id, _par, wave, ntype, ltype,
                 ras) = s
                op = stage_op[si]
                v = stage_voices[si]
                if inst >= 0 and not inst_done[inst]:
                    inst_begin(inst, v)
                    inst_done[inst] = True
                if inst >= 0:
                    length = lens[inst]
                    gate = gates[inst]
                else:
                    length = jnp.minimum(st['vdur'][v], blen)
                    gate = vgate[v]
                mask = idx < length

                if kind == K_LINE:
                    slot = line
                    mul = bufs.get(a) if a >= 0 else None
                    ls = _gather_line(st, op, slot)
                    out, nls = line_run_vec(ls, B, length, mul,
                                            static_type=ltype)
                    bufs[dst] = out
                    st = _scatter_line(st, op, slot, nls, gate)
                elif kind == K_RANGEMOD:
                    par = bufs[dst]
                    rpar = bufs[a]
                    mod = bufs[b]
                    bufs[dst] = jnp.where(mask,
                                          par + (rpar - par) * mod, par)
                elif kind == K_CONST1:
                    bufs[dst] = jnp.ones(B, f32)
                elif kind == K_NOISE:
                    out, nprev = jdsp.noise_run(
                        ntype, st['nn'][op], st['nprev'][op],
                        length, B)
                    bufs[dst] = out
                    st['nn'] = st['nn'].at[op].set(
                        jnp.where(gate, st['nn'][op]
                                  + length.astype(u32),
                                  st['nn'][op]))
                    st['nprev'] = st['nprev'].at[op].set(
                        jnp.where(gate, nprev, st['nprev'][op]))
                elif kind == K_WPHASE:
                    freq = bufs[a]
                    incs = jdsp.ftoi(coeff * freq).astype(u32)
                    incs = jnp.where(mask, incs, np.uint32(0))
                    run = jdsp.prefix_sum(incs) + st['phase'][op]
                    if b >= 0 and c >= 0:
                        s_pofs = bufs[b] + bufs[c] \
                            * jdsp.HUMMID_INV * freq
                        ofs = jdsp.ftoi(s_pofs * jdsp.P31).astype(u32)
                    elif b >= 0:
                        ofs = jdsp.ftoi(bufs[b] * jdsp.P31).astype(u32)
                    elif c >= 0:
                        s_pofs = bufs[c] * jdsp.HUMMID_INV * freq
                        ofs = jdsp.ftoi(s_pofs * jdsp.P31).astype(u32)
                    else:
                        ofs = jnp.zeros(B, u32)
                    bufs[dst] = ofs + run
                    st['phase'] = st['phase'].at[op].set(
                        jnp.where(gate & (length > 0), run[B - 1],
                                  st['phase'][op]))
                elif kind in (K_WRUN, K_WRUN_SELF):
                    pilut = piluts[wave]
                    reset = (st['wreset'][op] != 0) & (length > 0)
                    if kind == K_WRUN:
                        out, npp, nps = jdsp.wosc_run_taps(
                            wave, bufs[a], st['wpphase'][op],
                            st['wps'][op], reset, length)
                    else:
                        out, npp, nps, nfb = jdsp.wosc_selfmod_scan(
                            pilut, wave, bufs[a], bufs[b],
                            st['wpphase'][op], st['wps'][op],
                            st['wfb'][op], reset, length)
                        st['wfb'] = st['wfb'].at[op].set(
                            jnp.where(gate, nfb, st['wfb'][op]))
                    bufs[dst] = out
                    upd = gate & (length > 0)
                    st['wpphase'] = st['wpphase'].at[op].set(
                        jnp.where(upd, npp, st['wpphase'][op]))
                    st['wps'] = st['wps'].at[op].set(
                        jnp.where(upd, nps, st['wps'][op]))
                    st['wreset'] = st['wreset'].at[op].set(
                        jnp.where(upd, 0, st['wreset'][op]))
                elif kind == K_RCYCLE:
                    freq = bufs[a]
                    r2x = ras[5]
                    coeff_e = np.float32(coeff * 2) if r2x else coeff
                    pscale = np.float32(jdsp.P31 * 2) if r2x \
                        else jdsp.P31
                    incs = jdsp.ftoi(coeff_e * freq).astype(u64)
                    incs = jnp.where(mask, incs, np.uint64(0))
                    csum = jdsp.prefix_sum(incs)
                    base = st['rcp'][op] + csum - incs
                    if b >= 0 and c >= 0:
                        s_pofs = bufs[b] + bufs[c] \
                            * jdsp.HUMMID_INV * freq
                        ofs = jdsp.ftoi(s_pofs * pscale).astype(u64)
                    elif b >= 0:
                        ofs = jdsp.ftoi(bufs[b] * pscale).astype(u64)
                    elif c >= 0:
                        s_pofs = bufs[c] * jdsp.HUMMID_INV * freq
                        ofs = jdsp.ftoi(s_pofs * pscale).astype(u64)
                    else:
                        ofs = jnp.zeros(B, u64)
                    cph = ofs + base
                    bufs[dst] = (cph >> np.uint64(32)).astype(u32)
                    phs = (cph.astype(u32) >> np.uint32(1))
                    bufs[dst + 1] = jdsp.asi32(phs).astype(f32) \
                        * jdsp.SCALE31
                    st['rcp'] = st['rcp'].at[op].set(
                        jnp.where(gate & (length > 0),
                                  st['rcp'][op] + csum[B - 1],
                                  st['rcp'][op]))
                elif kind in (K_RRUN, K_RRUN_SELF):
                    rline, func, level, alpha, oflags, _r2x = ras
                    if kind == K_RRUN:
                        av, bv = jdsp.rasg_map(func, level, alpha,
                                               oflags, bufs[a])
                        out = jdsp.rasg_shape(rline, oflags,
                                              bufs[dst], av, bv)
                    else:
                        out, nps, nfb = jdsp.rasg_selfmod_scan(
                            func, rline, level, alpha, oflags,
                            bufs[dst], bufs[a], bufs[b],
                            st['rps'][op], st['rfb'][op], length)
                        st['rps'] = st['rps'].at[op].set(
                            jnp.where(gate, nps, st['rps'][op]))
                        st['rfb'] = st['rfb'].at[op].set(
                            jnp.where(gate, nfb, st['rfb'][op]))
                    bufs[dst] = out
                elif kind == K_MIX:
                    src = bufs[a]
                    amp = bufs[b]
                    prev = bufs.get(dst, jnp.zeros(B, f32))
                    if wave_env:
                        s_amp = amp * np.float32(0.5)
                        sv = src * s_amp + jnp.abs(s_amp)
                        new = prev * sv if layer else sv
                    else:
                        new = prev + src * amp if layer else src * amp
                    if layer:
                        bufs[dst] = jnp.where(mask, new, prev)
                    else:
                        bufs[dst] = jnp.where(mask, new,
                                              np.float32(0.0))
                elif kind == K_ZERO:
                    bufs[dst] = jnp.zeros(B, f32)
                elif kind == K_VMIX:
                    pan = bufs[dst]
                    sv = bufs[0] * amp_scale
                    sr = sv * pan
                    mgate = mask & gate
                    mixl = mixl + jnp.where(mgate, sv - sr,
                                            np.float32(0))
                    mixr = mixr + jnp.where(mgate, sv + sr,
                                            np.float32(0))

                if skip_line:
                    for slot in skip_line:
                        ls = _gather_line(st, op, slot)
                        nls = line_skip_vec(ls, length)
                        st = _scatter_line(st, op, slot, nls, gate)
                if inst >= 0 and last_stage.get(inst) == si:
                    inst_end(inst)

            # voice duration decrement
            for v in sorted(vgate.keys()):
                dec = jnp.where(vgate[v], vlen[v], 0)
                st['vdur'] = st['vdur'].at[v].set(st['vdur'][v] - dec)
            out = jnp.stack([mixl, mixr], axis=-1)
            return st, out

        blks = (blk_len, blk_rlo, blk_rhi, blk_stage_op, blk_inst_op)
        st, outs = jax.lax.scan(step, st, blks)
        return st, outs

    return epoch_fn


class JaxGenerator:
    """Generator-compatible renderer driving the JAX engine.

    Renders the full program on first use, then serves int16 chunks
    through the same run() API as the CPU Generator."""

    _cache = {}

    def __init__(self, prg: P.Program, srate: int, block: int = BLOCK):
        self.prg = prg
        self.srate = srate
        self.plan = RenderPlan(prg, srate, block)
        self._rendered = None
        self._pos = 0

    def _render_f32(self):
        """Render the whole signal; returns float32 (total, 2)."""
        plan = self.plan
        st = make_state(plan)
        recs = {k: jnp.asarray(v) for k, v in plan.rec_arrays.items()}
        pieces = []
        piece_meta = []
        for ep in plan.epochs:
            sig = ep.sig
            n_stages = len(ep.stages)
            n_insts = len(ep.instances)
            inst_parent = tuple(i.parent for i in ep.instances)
            stage_voices = tuple(s.voice for s in ep.stages)
            nb = len(ep.blk_len)
            B = ep.block
            key = (sig, n_stages, n_insts, plan.n_bufs, B,
                   plan.amp_scale, inst_parent, stage_voices,
                   self.srate, nb, plan.n_ops, plan.n_voices,
                   plan.n_recs)
            fn = self._cache.get(key)
            if fn is None:
                fn = jax.jit(build_epoch_fn(
                    sig, n_stages, n_insts, plan.n_bufs, B,
                    plan.amp_scale, inst_parent, stage_voices,
                    self.srate))
                self._cache[key] = fn
            st, outs = fn(st, jnp.asarray(ep.blk_len),
                          jnp.asarray(ep.blk_rec_lo),
                          jnp.asarray(ep.blk_rec_hi),
                          jnp.asarray(ep.blk_stage_op),
                          jnp.asarray(ep.blk_inst_op), recs)
            pieces.append(outs)
            piece_meta.append(ep.blk_len)
        # compact variable-length blocks into a contiguous signal
        total = plan.signal_end
        out = np.zeros((total, 2), dtype=np.float32)
        pos = 0
        for outs, blens in zip(pieces, piece_meta):
            arr = np.asarray(outs)
            for bi, blen in enumerate(blens):
                if blen > 0:
                    out[pos:pos + blen] = arr[bi, :blen]
                    pos += blen
        assert pos == total, (pos, total)
        return out

    def _to_i16(self, f):
        l = np.clip(f[:, 0], np.float32(-1.0), np.float32(1.0))
        r = np.clip(f[:, 1], np.float32(-1.0), np.float32(1.0))
        li = np.rint((l * np.float32(32767.0)).astype(np.float64)) \
            .astype(np.int16)
        ri = np.rint((r * np.float32(32767.0)).astype(np.float64)) \
            .astype(np.int16)
        return li, ri

    def run(self, out_i16, buf_len, stereo):
        """sauGenerator_run-compatible chunked delivery."""
        if self._rendered is None:
            self._rendered = self._render_f32()
        total = self._rendered.shape[0]
        out_i16[:] = 0
        n = min(buf_len, total - self._pos)
        if n > 0:
            seg = self._rendered[self._pos:self._pos + n]
            li, ri = self._to_i16(seg)
            if stereo:
                out_i16[0:n * 2:2] = li
                out_i16[1:n * 2:2] = ri
            else:
                m = (seg[:, 0] + seg[:, 1]) * np.float32(0.5)
                m = np.clip(m, np.float32(-1.0), np.float32(1.0))
                out_i16[:n] = np.rint(
                    (m * np.float32(32767.0)).astype(np.float64)) \
                    .astype(np.int16)
        self._pos += n
        if self._pos >= total:
            return False, n
        return True, buf_len
