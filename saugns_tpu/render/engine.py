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

# Bit-parity with the reference binary (gcc, baseline x86-64: SSE2, no
# FMA) requires XLA:CPU not to contract mul+add chains into FMAs -- the
# contraction changes one rounding, and FM chains integrate the result
# into audible phase drift.  No XLA pass/flag disables contraction
# directly (LLVM emits it from `contract`-flagged IR inside fusions;
# optimization_barrier/bitcast/select tricks all get folded), but
# capping the ISA below FMA removes it wholesale.  TPU compilation is
# unaffected.  Opt out with SAUGNS_TPU_CPU_FMA=1 (faster, non-parity).
if 'xla_cpu_max_isa' not in os.environ.get('XLA_FLAGS', '') \
        and os.environ.get('SAUGNS_TPU_CPU_FMA') != '1':
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_cpu_max_isa=AVX').strip()

import jax

# exact u32/u64 phase arithmetic requires 64-bit integer support
jax.config.update('jax_enable_x64', True)
# TPU (Mosaic) compiles of gather-bearing scan bodies are expensive;
# cache compilations persistently across processes. The directory is
# keyed by the LIVE backend (jax.default_backend()), not the
# JAX_PLATFORMS env var: the dev rig exports JAX_PLATFORMS=axon while
# tests pin the CPU platform through the config API, and entries must
# never mix across backends. Resolved lazily at first generator
# construction so jax.config.update('jax_platforms', ...) done after
# import is respected. CPU caching defaults ON (opt out with
# SAUGNS_TPU_CPU_CACHE=0): the historical jaxlib-0.9
# (de)serialization segfault traced to vm.max_map_count exhaustion,
# which tests/conftest.py bounds, so cold-process renders of
# already-seen schedules skip XLA entirely.
_cache_ready = False


def _ensure_compile_cache():
    global _cache_ready
    if _cache_ready:
        return
    _cache_ready = True
    try:
        backend = jax.default_backend()
    except Exception:
        return
    on_tpu = backend in ('tpu', 'axon') or 'tpu' in backend
    if not on_tpu and os.environ.get('SAUGNS_TPU_CPU_CACHE',
                                     '1') == '0':
        return
    cache_dir = os.path.join(
        os.environ.get('SAUGNS_TPU_CACHE',
                       os.path.expanduser('~/.cache/saugns_tpu_xla')),
        backend)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # seed from the shipped AOT executable pack (the build-time
        # analog of the reference's precompiled binary): cold Mosaic
        # kernel compiles through the dev-rig tunnel take minutes;
        # the pack (saugns_tpu/aot/<backend>/, written by
        # tools/aot_pack.py after the headline corpus is warmed)
        # makes a wiped-cache first run start at load speed
        pack = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            '..', 'aot', backend)
        if os.path.isdir(pack):
            import shutil
            for fn in os.listdir(pack):
                if fn == 'MANIFEST.json':  # provenance, not a cache entry
                    continue
                dst = os.path.join(cache_dir, fn)
                if not os.path.exists(dst):
                    try:
                        shutil.copyfile(os.path.join(pack, fn), dst)
                    except OSError:
                        pass
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
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


# Packed per-op state: the TPU runtime pays a large fixed cost per
# gather/scatter kernel, so all per-op scalars live in two matrices
# and each scan step does ONE row gather and ONE row scatter.
#
# SF (n_ops, NF) float32 columns:
C_LV0 = 0      # ..5   line v0 per slot
C_LVT = 6      # ..11  line vt per slot
C_WPS = 12     # wosc prev_s
C_WFB = 13     # wosc feedback
C_RPS = 14     # rasg prev_s
C_RFB = 15     # rasg feedback
NF = 16
# SI (n_ops, NI) int32 columns (u32 values bitcast):
C_LPOS = 0     # ..5
C_LEND = 6     # ..11
C_LTYPE = 12   # ..17
C_LFLAGS = 18  # ..23
C_TIME = 24
C_TINF = 25
C_PHASE = 26   # u32 wosc phase
C_WRESET = 27
C_WPPH = 28    # u32 wosc prev phase
C_RCPLO = 29   # u32 rasg cycle_phase low word
C_RCPHI = 30   # u32 rasg cycle_phase high word
C_NN = 31      # u32 noise counter
C_NPREV = 32   # u32 noise prev
NI = 33


def make_state(plan: RenderPlan):
    # host zeros + transfer, NOT jnp.zeros: the jnp path dispatches a
    # tiny `full` executable per distinct shape -- per-script compile
    # round trips through the dev-rig tunnel on the corpus load path
    n = plan.n_ops
    nv = plan.n_voices
    return {
        'sf': jnp.asarray(np.zeros((n, NF), np.float32)),
        'si': jnp.asarray(np.zeros((n, NI), np.int32)),
        'vdur': jnp.asarray(np.zeros((nv,), np.int32)),
    }


def _u(x):
    return jax.lax.bitcast_convert_type(x, u32)


def _i(x):
    return jax.lax.bitcast_convert_type(x, i32)


# -- line state machine ------------------------------------------------------

def line_run_vec(ls, B, length, mulbuf, static_type=None, idx=None):
    """sauLine_run vectorized over one (op, slot) scalar state ``ls``
    (dict of scalars). ``static_type``: plan-baked fill shape (python
    int) to prune the 13-way dispatch. Shape-polymorphic: with ``idx``
    = (1, B), (n, 1)-shaped state scalars and (n, B) mulbuf, it runs n
    independent lines at once (bit-identical per row). Returns
    (out, new_ls)."""
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
        m0 = mulbuf[..., 0:1] if mulbuf.ndim > 1 else mulbuf[0]
        v0 = jnp.where(goal & gratio & ~sratio, v0 / m0, v0)
        v0 = jnp.where(goal & ~gratio & sratio, v0 * m0, v0)
    sratio_g = jnp.where(goal, gratio, sratio)
    if idx is None:
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
    sahv = jnp.ones_like(fillv) * v0_after
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


def apply_records(st, lo, hi, recs, device_cols_only=False):
    """Apply update records [lo, hi) (handle_event + update_op,
    sau/generator.c:245-377) to the packed state.

    ``device_cols_only``: apply only the device-authoritative columns
    (phase/cycle/reset/noise counters and the full prepare row).  The
    flat renderer's fini_fn overwrites every host-authoritative column
    (line slots, time, vdur) from the host simulation's end tables, so
    tracing the 6-slot sauLine_copy machinery (~2700 jaxpr eqns, ~70%
    of a flat executable) into its init_fn is pure compile cost."""

    def body(ri, st):
        g = lambda k: recs[k][ri]
        op = g('op')
        kind = g('kind')
        is_op = kind == 0
        fr = st['sf'][op]
        ir = st['si'][op]

        # --- prepare (prepare_op, generator.c:245-278) ---------------
        prep = g('prepare') & is_op
        prep_f = jnp.zeros((NF,), f32)
        prep_i = jnp.zeros((NI,), i32)
        prep_i = prep_i.at[C_LTYPE:C_LTYPE + 6].set(0)
        prep_i = prep_i.at[C_PHASE].set(_i(SIN_ADJ))
        prep_i = prep_i.at[C_WRESET].set(1)
        fr = jnp.where(prep, prep_f, fr)
        ir = jnp.where(prep, prep_i, ir)

        # --- update (update_op, generator.c:283-343) ------------------
        params = g('params')
        typ = g('type')
        has_mode = is_op & ((params & P.POPP_MODE) != 0)
        has_phase = is_op & ((params & P.POPP_PHASE) != 0)
        has_seed = is_op & ((params & P.POPP_SEED) != 0)
        has_time = is_op & ((params & P.POPP_TIME) != 0)
        is_noise = typ == P.POPT_NOISE
        is_wave = typ == P.POPT_WAVE
        is_rasg = typ == P.POPT_RASEG

        # noise
        ir = ir.at[C_NPREV].set(jnp.where(has_mode & is_noise, 0,
                                          ir[C_NPREV]))
        ir = ir.at[C_NN].set(jnp.where(has_seed & is_noise,
                                       _i(g('seed')), ir[C_NN]))

        # wave: set_wave/set_phase with plan-precomputed adjustments
        ph = _u(ir[C_PHASE])
        ph = jnp.where(has_mode & is_wave, ph + g('wadj_delta'), ph)
        ir = ir.at[C_WRESET].set(jnp.where(has_mode & is_wave, 1,
                                           ir[C_WRESET]))
        ph = jnp.where(has_phase & is_wave, g('phase_w'), ph)
        ir = ir.at[C_PHASE].set(_i(ph))

        # rasg cycle/phase state (rasg.h:59-119); rate2x transitions
        # are plan-precomputed booleans
        cp = (_u(ir[C_RCPHI]).astype(jnp.uint64) << np.uint64(32)) \
            | _u(ir[C_RCPLO]).astype(jnp.uint64)
        r2x_old = g('r2x_old')
        r2x_new = g('r2x_new')
        cyc = ((cp >> np.uint64(32)).astype(u32)
               & np.uint32(~1 & 0xffffffff))
        phs = jnp.where(r2x_old, (cp >> np.uint64(1)).astype(u32),
                        cp.astype(u32))
        cp_re = (cyc.astype(jnp.uint64) << np.uint64(32)) | jnp.where(
            r2x_new, phs.astype(jnp.uint64) << np.uint64(1),
            phs.astype(jnp.uint64))
        cp = jnp.where(has_mode & is_rasg & (r2x_new != r2x_old),
                       cp_re, cp)
        # set_phase
        cyc2 = ((cp >> np.uint64(32)).astype(u32)
                & np.uint32(~1 & 0xffffffff))
        newph = g('phase')
        ph64 = jnp.where(r2x_new,
                         newph.astype(jnp.uint64) << np.uint64(1),
                         newph.astype(jnp.uint64))
        cp = jnp.where(has_phase & is_rasg,
                       (cyc2.astype(jnp.uint64) << np.uint64(32))
                       | ph64, cp)
        # set_cycle
        phs2 = jnp.where(r2x_new, (cp >> np.uint64(1)).astype(u32),
                         cp.astype(u32))
        ph64b = jnp.where(r2x_new,
                          phs2.astype(jnp.uint64) << np.uint64(1),
                          phs2.astype(jnp.uint64))
        seedc = (g('seed') & np.uint32(~1 & 0xffffffff)).astype(
            jnp.uint64)
        cp = jnp.where(has_seed & is_rasg,
                       (seedc << np.uint64(32)) | ph64b, cp)
        ir = ir.at[C_RCPLO].set(_i(cp.astype(u32)))
        ir = ir.at[C_RCPHI].set(_i((cp >> np.uint64(32)).astype(u32)))

        # line copies: freq/freq2/pm_a gated osc-type; amp/amp2/pan
        is_osc = is_wave | is_rasg
        slots = () if device_cols_only \
            else (L_FREQ, L_FREQ2, L_PMA, L_AMP, L_AMP2, L_PAN)
        for slot in slots:
            gate_l = (is_osc if slot in (L_FREQ, L_FREQ2, L_PMA)
                      else True) & g('l%d_present' % slot) & is_op
            cur = {'v0': fr[C_LV0 + slot], 'vt': fr[C_LVT + slot],
                   'pos': ir[C_LPOS + slot], 'end': ir[C_LEND + slot],
                   'type': ir[C_LTYPE + slot],
                   'flags': ir[C_LFLAGS + slot]}
            newl = _line_copy_scalar(
                cur, g('l%d_flags' % slot), g('l%d_v0' % slot),
                g('l%d_vt' % slot), g('l%d_end' % slot),
                g('l%d_type' % slot), gate_l)
            fr = fr.at[C_LV0 + slot].set(newl['v0'])
            fr = fr.at[C_LVT + slot].set(newl['vt'])
            ir = ir.at[C_LPOS + slot].set(newl['pos'])
            ir = ir.at[C_LEND + slot].set(newl['end'])
            ir = ir.at[C_LTYPE + slot].set(newl['type'])
            ir = ir.at[C_LFLAGS + slot].set(newl['flags'])

        if not device_cols_only:
            # time
            ir = ir.at[C_TIME].set(jnp.where(has_time, g('time_v'),
                                             ir[C_TIME]))
            ir = ir.at[C_TINF].set(jnp.where(
                has_time, g('time_implicit').astype(i32), ir[C_TINF]))

        st['sf'] = st['sf'].at[op].set(jnp.where(is_op, fr,
                                                 st['sf'][op]))
        st['si'] = st['si'].at[op].set(jnp.where(is_op, ir,
                                                 st['si'][op]))

        if not device_cols_only:
            # voice record: duration = carrier time
            # (set_voice_duration)
            vo = g('vo')
            carr = g('carr')
            dur = jnp.where(st['si'][carr, C_TINF] != 0, 0,
                            st['si'][carr, C_TIME])
            st['vdur'] = st['vdur'].at[vo].set(
                jnp.where(kind == 1, dur, st['vdur'][vo]))
        return st

    return jax.lax.fori_loop(lo, hi, body, st)


# -- epoch execution ---------------------------------------------------------

def _analyze_schedule(stage_sig, inst_src):
    """Host-side dependency analysis of an epoch schedule.

    Buffers are SSA-renamed (each write creates a new version) and
    per-op state cells are sequentially chained, giving a DAG whose
    longest-path levels define a correct parallel order: stages at the
    same level are independent, so their fusion-breaking primitives
    (phasor prefix scans, tap gathers) can be batched into single
    kernel calls. This is pure reordering -- every stage computes
    bit-identical values to the sequential schedule.

    Returns (plan, rkey, wkey): plan is a list of execution groups
    ('stages', [si..]) / ('wphase', [si..]) / ('rcycle', [si..]) /
    ('wrun', wave, [si..]); rkey[si]/wkey[si] map buffer slots to
    SSA (slot, version) keys."""
    n = len(stage_sig)
    deps = [set() for _ in range(n)]
    rkey = [dict() for _ in range(n)]
    wkey = [dict() for _ in range(n)]
    cur: Dict[int, tuple] = {}
    cells_last: Dict[tuple, int] = {}
    mix_last = None

    def rd(si, slot):
        if slot is None or slot < 0:
            return
        ver, prod = cur.get(slot, (0, None))
        rkey[si][slot] = (slot, ver)
        if prod is not None:
            deps[si].add(prod)

    def wr(si, slot):
        ver, _ = cur.get(slot, (0, None))
        cur[slot] = (ver + 1, si)
        wkey[si][slot] = (slot, ver + 1)

    def cell(si, key):
        prev = cells_last.get(key)
        if prev is not None and prev != si:
            deps[si].add(prev)
        cells_last[key] = si

    for si, s in enumerate(stage_sig):
        (kind, inst, dst, a, b, c, line, wave_env, layer, skip_line,
         fbid, par, wave, ntype, ltype, ras) = s
        row = inst_src[inst] if inst >= 0 and inst_src[inst] >= 0 \
            else inst
        if kind == K_LINE:
            rd(si, a)
            wr(si, dst)
            cell(si, (row, 'L', line))
        elif kind == K_RANGEMOD:
            rd(si, dst)
            rd(si, a)
            rd(si, b)
            wr(si, dst)
        elif kind in (K_CONST1, K_ZERO):
            wr(si, dst)
        elif kind == K_NOISE:
            wr(si, dst)
            cell(si, (row, 'N'))
        elif kind == K_WPHASE:
            rd(si, a)
            rd(si, b)
            rd(si, c)
            wr(si, dst)
            cell(si, (row, 'PH'))
        elif kind in (K_WRUN, K_WRUN_SELF):
            rd(si, a)
            if kind == K_WRUN_SELF:
                rd(si, b)
            wr(si, dst)
            cell(si, (row, 'W'))
        elif kind == K_RCYCLE:
            rd(si, a)
            rd(si, b)
            rd(si, c)
            wr(si, dst)
            wr(si, dst + 1)
            cell(si, (row, 'RC'))
        elif kind in (K_RRUN, K_RRUN_SELF):
            rd(si, a)
            rd(si, dst)
            if kind == K_RRUN_SELF:
                rd(si, b)
            wr(si, dst)
            if kind == K_RRUN_SELF:
                cell(si, (row, 'RS'))
        elif kind == K_MIX:
            rd(si, a)
            rd(si, b)
            if layer:
                rd(si, dst)
            wr(si, dst)
        elif kind == K_VMIX:
            rd(si, dst)
            rd(si, a)
            # stereo accumulation order is part of the bit-exact
            # contract: chain VMIX stages
            if mix_last is not None:
                deps[si].add(mix_last)
            mix_last = si
        for sl in skip_line:
            cell(si, (row, 'L', sl))

    level = [0] * n
    for si in range(n):
        level[si] = 1 + max((level[d] for d in deps[si]), default=-1)

    import os
    plan = []
    if os.environ.get('SAUGNS_TPU_LEVELBATCH', '1') != '1':
        if n:
            plan.append(('stages', list(range(n))))
        return plan, rkey, wkey
    for lv in range((max(level) + 1) if n else 0):
        sis = [si for si in range(n) if level[si] == lv]
        rest = []
        wp = []
        rc = []
        wrun_by_wave: Dict[int, list] = {}
        line_by: Dict[tuple, list] = {}
        for si in sis:
            kind = stage_sig[si][0]
            if kind == K_WPHASE:
                wp.append(si)
            elif kind == K_RCYCLE:
                rc.append(si)
            elif kind == K_WRUN:
                wrun_by_wave.setdefault(stage_sig[si][12],
                                        []).append(si)
            elif kind == K_LINE:
                line_by.setdefault(
                    (stage_sig[si][14], stage_sig[si][3] >= 0),
                    []).append(si)
            else:
                rest.append(si)
        for _key, group in sorted(line_by.items()):
            if len(group) > 1:
                plan.append(('line', group))
            else:
                rest = group + rest
        if len(wp) > 1:
            plan.append(('wphase', wp))
        else:
            rest = wp + rest
        if len(rc) > 1:
            plan.append(('rcycle', rc))
        else:
            rest = rc + rest
        for wave, group in sorted(wrun_by_wave.items()):
            if len(group) > 1:
                plan.append(('wrun', wave, group))
            else:
                rest = group + rest
        if rest:
            plan.append(('stages', sorted(rest)))
    return plan, rkey, wkey


def build_epoch_fn(sig, n_stages, n_insts, n_bufs, B, amp_scale,
                   inst_parent, stage_voices, srate):
    """Build the scan step for one epoch schedule. ``sig`` =
    (stage entries, inst_src, scatter_list) from the planner; per-stage
    operator ids arrive as per-block arrays. Per-op scalar state is
    gathered into packed rows once per block and scattered back once
    (per-scalar dynamic indexing fragments the XLA program into dozens
    of kernel launches, each with a large fixed cost on TPU)."""
    stage_sig, inst_src, scatter_list = sig
    coeff = np.float32(np.float32(4294967296.0) / np.float64(srate))
    amp_scale = np.float32(amp_scale)
    exec_plan, rkey, wkey = _analyze_schedule(stage_sig, inst_src)

    def epoch_fn(st, blk_len, blk_rlo, blk_rhi, blk_stage_op,
                 blk_inst_op, recs):
        luts, piluts = jdsp.get_tables()

        def step(st, blk):
            blen, rlo, rhi, stage_op, inst_op = blk
            # most blocks carry no events; skip the record machinery
            st = jax.lax.cond(rhi > rlo,
                              lambda s_: apply_records(s_, rlo, rhi,
                                                       recs),
                              lambda s_: s_, st)
            idx = jnp.arange(B, dtype=i32)
            mixl = jnp.zeros(B, f32)
            mixr = jnp.zeros(B, f32)
            # one row gather for all per-op scalars this block
            fi = st['sf'][inst_op] if n_insts else st['sf'][:0]
            ii = st['si'][inst_op] if n_insts else st['si'][:0]
            fvals = {}
            ivals = {}

            def src_row(inst):
                sr = inst_src[inst]
                return inst if sr < 0 else sr

            def gf(inst, col):
                key = (src_row(inst), col)
                return fvals.get(key, fi[key[0], col])

            def gi(inst, col):
                key = (src_row(inst), col)
                return ivals.get(key, ii[key[0], col])

            def pf(inst, col, v, gate):
                key = (src_row(inst), col)
                fvals[key] = jnp.where(gate, v, gf(inst, col))

            def pi(inst, col, v, gate):
                key = (src_row(inst), col)
                ivals[key] = jnp.where(gate, v, gi(inst, col))

            def gu(inst, col):
                return _u(gi(inst, col))

            def pu(inst, col, v, gate):
                pi(inst, col, _i(v), gate)

            lens = [None] * n_insts
            gates = [None] * n_insts
            inst_done = [False] * n_insts
            vgate = {}
            vlen = {}
            for v in set(stage_voices):
                if v < 0:
                    continue
                vd = st['vdur'][v]
                vlen[v] = jnp.minimum(vd, blen)
                vgate[v] = (vd > 0) & (blen > 0)

            def inst_begin(ii_, v):
                par = inst_parent[ii_]
                tinf = gi(ii_, C_TINF) != 0
                own = jnp.where(tinf, BIG_TIME, gi(ii_, C_TIME))
                plen = vlen[v] if par < 0 else lens[par]
                lens[ii_] = jnp.minimum(plen, own)
                g = vgate[v] if par < 0 else gates[par]
                if par < 0:
                    g = g & ((gi(ii_, C_TIME) > 0) | tinf)
                gates[ii_] = g

            def inst_end(ii_):
                tinf = gi(ii_, C_TINF) != 0
                pi(ii_, C_TIME, gi(ii_, C_TIME) - lens[ii_],
                   gates[ii_] & ~tinf)

            last_stage = {}
            for si_, s in enumerate(stage_sig):
                if s[1] >= 0:
                    last_stage[s[1]] = si_

            def line_state(inst, slot):
                return {'v0': gf(inst, C_LV0 + slot),
                        'vt': gf(inst, C_LVT + slot),
                        'pos': gi(inst, C_LPOS + slot),
                        'end': gi(inst, C_LEND + slot),
                        'type': gi(inst, C_LTYPE + slot),
                        'flags': gi(inst, C_LFLAGS + slot)}

            def put_line(inst, slot, ls, gate):
                pf(inst, C_LV0 + slot, ls['v0'], gate)
                pi(inst, C_LPOS + slot, ls['pos'], gate)
                pi(inst, C_LFLAGS + slot, ls['flags'], gate)
                if 'end' in ls:
                    pi(inst, C_LEND + slot, ls['end'], gate)

            # instance begin/end bookkeeping in original order
            # (scalar-only; reads/writes only C_TIME/C_TINF cells,
            # which no vector stage touches)
            for si_, s in enumerate(stage_sig):
                inst = s[1]
                if inst >= 0:
                    if not inst_done[inst]:
                        inst_begin(inst, stage_voices[si_])
                        inst_done[inst] = True
                    if last_stage.get(inst) == si_:
                        inst_end(inst)

            # SSA-versioned buffer values
            vals: Dict[tuple, jnp.ndarray] = {}

            def rdbuf(si_, slot, default=None):
                if slot is None or slot < 0:
                    return default
                key = rkey[si_].get(slot)
                if key is None or key not in vals:
                    return default
                return vals[key]

            def wrbuf(si_, slot, v):
                vals[wkey[si_][slot]] = v

            def stage_lg(si_, s):
                inst = s[1]
                if inst >= 0:
                    return lens[inst], gates[inst]
                v = stage_voices[si_]
                return jnp.minimum(st['vdur'][v], blen), vgate[v]

            def wphase_incs(si_, s, length):
                freq = rdbuf(si_, s[3])
                incs = jdsp.ftoi(coeff * freq).astype(u32)
                return jnp.where(idx < length, incs, np.uint32(0)), \
                    freq

            def wphase_finish(si_, s, run0, freq, length, gate):
                (kind, inst, dst, a, b, c) = s[:6]
                run = run0 + gu(inst, C_PHASE)
                if b >= 0 and c >= 0:
                    s_pofs = rdbuf(si_, b) + rdbuf(si_, c) \
                        * jdsp.HUMMID_INV * freq
                    ofs = jdsp.ftoi(s_pofs * jdsp.P31).astype(u32)
                elif b >= 0:
                    ofs = jdsp.ftoi(rdbuf(si_, b)
                                    * jdsp.P31).astype(u32)
                elif c >= 0:
                    s_pofs = rdbuf(si_, c) * jdsp.HUMMID_INV * freq
                    ofs = jdsp.ftoi(s_pofs * jdsp.P31).astype(u32)
                else:
                    ofs = jnp.zeros(B, u32)
                wrbuf(si_, dst, ofs + run)
                pu(inst, C_PHASE, run[B - 1], gate & (length > 0))

            def rcycle_incs(si_, s, length):
                freq = rdbuf(si_, s[3])
                r2x = s[15][5]
                coeff_e = np.float32(coeff * 2) if r2x else coeff
                incs = jdsp.ftoi(coeff_e * freq).astype(jnp.uint64)
                return jnp.where(idx < length, incs,
                                 np.uint64(0)), freq

            def rcycle_finish(si_, s, csum, incs, freq, length, gate):
                (kind, inst, dst, a, b, c) = s[:6]
                ras = s[15]
                r2x = ras[5]
                pscale = np.float32(jdsp.P31 * 2) if r2x \
                    else jdsp.P31
                cp0 = (gu(inst, C_RCPHI).astype(jnp.uint64)
                       << np.uint64(32)) \
                    | gu(inst, C_RCPLO).astype(jnp.uint64)
                base = cp0 + csum - incs
                if b >= 0 and c >= 0:
                    s_pofs = rdbuf(si_, b) + rdbuf(si_, c) \
                        * jdsp.HUMMID_INV * freq
                    ofs = jdsp.ftoi(s_pofs * pscale).astype(
                        jnp.uint64)
                elif b >= 0:
                    ofs = jdsp.ftoi(rdbuf(si_, b) * pscale).astype(
                        jnp.uint64)
                elif c >= 0:
                    s_pofs = rdbuf(si_, c) * jdsp.HUMMID_INV * freq
                    ofs = jdsp.ftoi(s_pofs * pscale).astype(
                        jnp.uint64)
                else:
                    ofs = jnp.zeros(B, jnp.uint64)
                cph = ofs + base
                wrbuf(si_, dst, (cph >> np.uint64(32)).astype(u32))
                phs = (cph.astype(u32) >> np.uint32(1))
                wrbuf(si_, dst + 1,
                      jdsp.asi32(phs).astype(f32) * jdsp.SCALE31)
                cp1 = cp0 + csum[B - 1]
                upd = gate & (length > 0)
                pu(inst, C_RCPLO, cp1.astype(u32), upd)
                pu(inst, C_RCPHI,
                   (cp1 >> np.uint64(32)).astype(u32), upd)

            def wrun_exec(si_, s, length, gate, taps2=None):
                (kind, inst, dst, a, b) = s[:5]
                wave = s[12]
                reset = (gi(inst, C_WRESET) != 0) & (length > 0)
                if kind == K_WRUN:
                    out, npp, nps = jdsp.wosc_run_taps(
                        wave, rdbuf(si_, a), gu(inst, C_WPPH),
                        gf(inst, C_WPS), reset, length, taps2=taps2)
                else:
                    out, npp, nps, nfb = jdsp.wosc_selfmod_scan(
                        piluts[wave], wave, rdbuf(si_, a),
                        rdbuf(si_, b), gu(inst, C_WPPH),
                        gf(inst, C_WPS), gf(inst, C_WFB), reset,
                        length)
                    pf(inst, C_WFB, nfb, gate)
                wrbuf(si_, dst, out)
                upd = gate & (length > 0)
                pu(inst, C_WPPH, npp, upd)
                pf(inst, C_WPS, nps, upd)
                pi(inst, C_WRESET, 0, upd)

            def exec_stage(si_):
                nonlocal mixl, mixr
                s = stage_sig[si_]
                (kind, inst, dst, a, b, c, line, wave_env, layer,
                 skip_line, freq_buf_id, _par, wave, ntype, ltype,
                 ras) = s
                length, gate = stage_lg(si_, s)
                mask = idx < length

                if kind == K_LINE:
                    mul = rdbuf(si_, a) if a >= 0 else None
                    ls = line_state(inst, line)
                    out, nls = line_run_vec(ls, B, length, mul,
                                            static_type=ltype)
                    wrbuf(si_, dst, out)
                    put_line(inst, line, nls, gate)
                elif kind == K_RANGEMOD:
                    par = rdbuf(si_, dst)
                    wrbuf(si_, dst, jnp.where(
                        mask,
                        par + (rdbuf(si_, a) - par) * rdbuf(si_, b),
                        par))
                elif kind == K_CONST1:
                    wrbuf(si_, dst, jnp.ones(B, f32))
                elif kind == K_NOISE:
                    out, nprev = jdsp.noise_run(
                        ntype, gu(inst, C_NN), gu(inst, C_NPREV),
                        length, B)
                    wrbuf(si_, dst, out)
                    pu(inst, C_NN,
                       gu(inst, C_NN) + length.astype(u32), gate)
                    pu(inst, C_NPREV, nprev, gate)
                elif kind == K_WPHASE:
                    incs, freq = wphase_incs(si_, s, length)
                    run0 = jdsp.prefix_sum(incs)
                    wphase_finish(si_, s, run0, freq, length, gate)
                elif kind in (K_WRUN, K_WRUN_SELF):
                    wrun_exec(si_, s, length, gate)
                elif kind == K_RCYCLE:
                    incs, freq = rcycle_incs(si_, s, length)
                    csum = jdsp.prefix_sum(incs)
                    rcycle_finish(si_, s, csum, incs, freq, length,
                                  gate)
                elif kind in (K_RRUN, K_RRUN_SELF):
                    rline, func, level, alpha, oflags, _r2x = ras
                    if kind == K_RRUN:
                        av, bv = jdsp.rasg_map(func, level, alpha,
                                               oflags, rdbuf(si_, a))
                        out = jdsp.rasg_shape(rline, oflags,
                                              rdbuf(si_, dst), av, bv)
                    else:
                        out, nps, nfb = jdsp.rasg_selfmod_scan(
                            func, rline, level, alpha, oflags,
                            rdbuf(si_, dst), rdbuf(si_, a),
                            rdbuf(si_, b),
                            gf(inst, C_RPS), gf(inst, C_RFB), length)
                        pf(inst, C_RPS, nps, gate)
                        pf(inst, C_RFB, nfb, gate)
                    wrbuf(si_, dst, out)
                elif kind == K_MIX:
                    src = rdbuf(si_, a)
                    amp = rdbuf(si_, b)
                    prev = rdbuf(si_, dst, jnp.zeros(B, f32)) \
                        if layer else jnp.zeros(B, f32)
                    if wave_env:
                        s_amp = amp * np.float32(0.5)
                        sv = src * s_amp + jnp.abs(s_amp)
                        new = prev * sv if layer else sv
                    else:
                        new = prev + src * amp if layer else src * amp
                    if layer:
                        wrbuf(si_, dst, jnp.where(mask, new, prev))
                    else:
                        wrbuf(si_, dst, jnp.where(mask, new,
                                                  np.float32(0.0)))
                elif kind == K_ZERO:
                    wrbuf(si_, dst, jnp.zeros(B, f32))
                elif kind == K_VMIX:
                    pan = rdbuf(si_, dst)
                    sv = rdbuf(si_, a) * amp_scale
                    sr = sv * pan
                    mgate = mask & gate
                    mixl = mixl + jnp.where(mgate, sv - sr,
                                            np.float32(0))
                    mixr = mixr + jnp.where(mgate, sv + sr,
                                            np.float32(0))

                if skip_line:
                    for slot in skip_line:
                        ls = line_state(inst, slot)
                        nls = line_skip_vec(ls, length)
                        put_line(inst, slot, nls, gate)

            for group in exec_plan:
                if group[0] == 'stages':
                    for si_ in group[1]:
                        exec_stage(si_)
                elif group[0] == 'wphase':
                    sis = group[1]
                    lgs = [stage_lg(si_, stage_sig[si_])
                           for si_ in sis]
                    ifs = [wphase_incs(si_, stage_sig[si_], lg[0])
                           for si_, lg in zip(sis, lgs)]
                    runs = jdsp.prefix_sum_rows(
                        jnp.stack([inc for inc, _ in ifs]))
                    for k, si_ in enumerate(sis):
                        wphase_finish(si_, stage_sig[si_], runs[k],
                                      ifs[k][1], lgs[k][0], lgs[k][1])
                elif group[0] == 'rcycle':
                    sis = group[1]
                    lgs = [stage_lg(si_, stage_sig[si_])
                           for si_ in sis]
                    ifs = [rcycle_incs(si_, stage_sig[si_], lg[0])
                           for si_, lg in zip(sis, lgs)]
                    csums = jdsp.prefix_sum_rows(
                        jnp.stack([inc for inc, _ in ifs]))
                    for k, si_ in enumerate(sis):
                        rcycle_finish(si_, stage_sig[si_], csums[k],
                                      ifs[k][0], ifs[k][1],
                                      lgs[k][0], lgs[k][1])
                elif group[0] == 'line':
                    sis = group[1]
                    n_g = len(sis)
                    lgs = [stage_lg(si_, stage_sig[si_])
                           for si_ in sis]
                    lss = [line_state(stage_sig[si_][1],
                                      stage_sig[si_][6])
                           for si_ in sis]
                    bls = {k: jnp.stack([ls[k] for ls in lss])
                           .reshape(n_g, 1) for k in lss[0]}
                    lengths = jnp.stack(
                        [lg[0] for lg in lgs]).reshape(n_g, 1)
                    has_mul = stage_sig[sis[0]][3] >= 0
                    muls = jnp.stack(
                        [rdbuf(si_, stage_sig[si_][3])
                         for si_ in sis]) if has_mul else None
                    out, nls = line_run_vec(
                        bls, B, lengths, muls,
                        static_type=stage_sig[sis[0]][14],
                        idx=jnp.arange(B, dtype=i32)[None, :])
                    for k, si_ in enumerate(sis):
                        s = stage_sig[si_]
                        wrbuf(si_, s[2], out[k])
                        put_line(s[1], s[6],
                                 {key: nls[key][k, 0] for key in
                                  ('v0', 'pos', 'flags', 'end')},
                                 lgs[k][1])
                        for slot in s[9]:
                            nsk = line_skip_vec(
                                line_state(s[1], slot), lgs[k][0])
                            put_line(s[1], slot, nsk, lgs[k][1])
                elif group[0] == 'wrun':
                    wave, sis = group[1], group[2]
                    lgs = [stage_lg(si_, stage_sig[si_])
                           for si_ in sis]
                    cells = [jdsp.wosc_cells(
                        rdbuf(si_, stage_sig[si_][3]))
                        for si_ in sis]
                    taps_all = jdsp.gather_taps(
                        jnp.concatenate(cells), wave)
                    for k, si_ in enumerate(sis):
                        wrun_exec(si_, stage_sig[si_], lgs[k][0],
                                  lgs[k][1],
                                  taps2=taps_all[:, k * B:(k + 1) * B])

            # write back packed rows (only the last instance per op)
            if n_insts:
                frows = jnp.stack([
                    jnp.stack([gf(ii_, col) for col in range(NF)])
                    for ii_ in scatter_list])
                irows = jnp.stack([
                    jnp.stack([gi(ii_, col) for col in range(NI)])
                    for ii_ in scatter_list])
                sel = jnp.asarray(list(scatter_list), dtype=i32)
                ops_sel = inst_op[sel]
                st['sf'] = st['sf'].at[ops_sel].set(frows)
                st['si'] = st['si'].at[ops_sel].set(irows)
            for v in sorted(vgate.keys()):
                dec = jnp.where(vgate[v], vlen[v], 0)
                st['vdur'] = st['vdur'].at[v].set(st['vdur'][v] - dec)
            out = jnp.stack([mixl, mixr], axis=-1)
            import os as _os
            if _os.environ.get('SAUGNS_TPU_DEBUG_BUFS'):
                # differential-debug aid: emit every SSA buffer value
                # (keyed by its versioned (stage, slot) id) per block
                return st, (out, {str(k): v for k, v in vals.items()})
            return st, out

        blks = (blk_len, blk_rlo, blk_rhi, blk_stage_op, blk_inst_op)
        st, outs = jax.lax.scan(step, st, blks)
        return st, outs

    return epoch_fn


class JaxGenerator:
    """Generator-compatible renderer driving the JAX engine.

    Renders the full program on first use, then serves int16 chunks
    through the same run() API as the CPU Generator. Rendering is
    device-resident; int16 conversion happens on device and only the
    final samples cross the host boundary (the dev-rig TPU tunnel
    moves data at ~30 MB/s, while on-device render throughput is
    3 orders of magnitude higher)."""

    _cache = {}

    def __init__(self, prg: P.Program, srate: int, block: int = BLOCK):
        _ensure_compile_cache()
        self.prg = prg
        self.srate = srate
        self.plan = RenderPlan(prg, srate, block)
        self._recs_dev = None
        self._ep_dev = None
        self._rendered = None
        self._pos = 0
        self._flat = None
        if os.environ.get('SAUGNS_TPU_FLAT', '1') == '1':
            from .hostsim import HostSim
            self._sim = HostSim(self.plan)
            self._flat = [None] * len(self.plan.epochs)
            # surface sequential-scan fallbacks (feedback-heavy or
            # rebinding epochs get the slowest path; the -v text
            # itself stays byte-par with the reference binary, so
            # diagnostics ride an opt-in env knob instead)
            if os.environ.get('SAUGNS_TPU_DIAG', '0') == '1':
                import sys as _sys
                for ei, bake in enumerate(self._sim.bakes):
                    ep = self.plan.epochs[ei]
                    if ep.start == ep.end or bake.eligible:
                        continue
                    print('saugns-tpu: %s: epoch %d (%d blocks) '
                          'falls back to the sequential scan: %s'
                          % (getattr(prg, 'name', '?') or '?', ei,
                             len(ep.blk_len),
                             bake.reason or 'segment-ineligible'),
                          file=_sys.stderr)

    def _flat_epoch(self, ei):
        """Flat (time-parallel) segment renderers for epoch ``ei``, or
        None if the epoch must run on the sequential scan path."""
        if self._flat is None or not self._sim.bakes[ei].eligible:
            return None
        if self._flat[ei] is None:
            from .flat import FlatSegment
            bake = self._sim.bakes[ei]
            self._flat[ei] = [
                FlatSegment(self.plan, self.plan.epochs[ei], bake, seg,
                            self.srate)
                for seg in bake.segments]
        return self._flat[ei]

    def _upload(self):
        if self._recs_dev is None:
            plan = self.plan
            self._recs_dev = {k: jnp.asarray(v)
                              for k, v in plan.rec_arrays.items()}
            self._ep_dev = [
                (jnp.asarray(ep.blk_len), jnp.asarray(ep.blk_rec_lo),
                 jnp.asarray(ep.blk_rec_hi),
                 jnp.asarray(ep.blk_stage_op),
                 jnp.asarray(ep.blk_inst_op))
                for ep in self.plan.epochs]

    def _epoch_fns(self, raw=False):
        """Per-epoch sequential-scan functions; ``raw=True`` returns
        the unjitted bodies (for inlining into a mono dispatch)."""
        plan = self.plan
        fns = []
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
            pair = self._cache.get(key)
            if pair is None:
                raw_fn = build_epoch_fn(
                    sig, n_stages, n_insts, plan.n_bufs, B,
                    plan.amp_scale, inst_parent, stage_voices,
                    self.srate)
                pair = (raw_fn, jax.jit(raw_fn))
                self._cache[key] = pair
            fns.append(pair[0] if raw else pair[1])
        return fns

    def _mono(self):
        """One-dispatch whole-render function, or None when not
        applicable. On the TPU every dispatch boundary costs a ~20 ms
        host round trip (simple_sequence-pm: 25 ms of device work vs
        ~190 ms of inter-dispatch gaps), so the entire render --
        sequential epochs, segment groups, int16 conversion -- is
        traced into ONE jit when the full f32 output fits
        flat.GROUP_OUT_CAP. Off-TPU the per-template executables
        compile faster and share across scripts (the corpus sweep
        relies on it), so multi-dispatch stays the default there;
        SAUGNS_TPU_MONO=force / =0 overrides."""
        mode = os.environ.get('SAUGNS_TPU_MONO', '1')
        if mode == '0' or (mode != 'force' and not jdsp._on_tpu()):
            return None
        if getattr(self, '_mono_cache', None) is not None:
            return self._mono_cache or None
        from .flat import (GROUP_OUT_CAP, group_scan,
                           group_stacked_args, plan_groups,
                           split_group_outs)
        items = []
        args = []
        total = 0
        raw_fns = self._epoch_fns(raw=True)
        n_ep = len(self.plan.epochs)
        ei = 0
        while ei < n_ep:
            fl = self._flat_epoch(ei)
            if fl is None:
                ep = self.plan.epochs[ei]
                items.append(('seq', raw_fns[ei], None))
                args.append(self._ep_dev[ei])
                total += len(ep.blk_len) * ep.block * 8
                ei += 1
                continue
            segs = list(fl)
            ej = ei + 1
            while ej < n_ep:
                fl2 = self._flat_epoch(ej)
                if fl2 is None:
                    break
                segs += fl2
                ej += 1
            for group in plan_groups(segs):
                s0 = group[0]
                items.append(('group', group,
                              s0._fns_entry['fused_py']))
                if len(group) == 1:
                    s0._upload()
                    args.append((tuple(s0._xs_groups), s0._end_dev,
                                 s0._dyn_dev))
                else:
                    args.append(group_stacked_args(group))
                total += len(group) * s0.ng * s0.gch * s0.nc \
                    * s0.B * 8
            ei = ej
        if total > GROUP_OUT_CAP:
            self._mono_cache = False
            return None

        def mono(st, recs, salt, *dev_args):
            # salt: a per-call scalar folded in as a no-op so every
            # render is a distinct (executable, args) call -- the
            # dev-rig runtime replays repeated identical calls from a
            # response cache, which corrupts timing measurements
            # (walls of microseconds for a 60 s render)
            st = dict(st)
            st['vdur'] = st['vdur'] + jdsp.salt_zero(salt).astype(
                st['vdur'].dtype)
            pieces = []
            for (kind, a, b), arg in zip(items, dev_args):
                if kind == 'seq':
                    st, outs = a(st, *arg, recs)
                    pieces.append(_to_i16_device(outs))
                    continue
                group, fused_py = a, b
                if len(group) == 1:
                    s0 = group[0]
                    st, outs = fused_py(st, recs, *arg)
                    ps = [o.reshape(s0.gch * s0.nc, s0.B, 2)
                          for o in outs]
                    full = ps[0] if len(ps) == 1 \
                        else jnp.concatenate(ps, axis=0)
                    pieces.append(_to_i16_device(full[:s0.nb]))
                else:
                    st, outs = group_scan(fused_py, st, recs, arg)
                    for full in split_group_outs(group, outs):
                        pieces.append(_to_i16_device(full))
            return tuple(pieces)

        # AOT export store: a previously exported artifact of this
        # exact (program, srate, code, platform) skips the Python
        # re-trace entirely (~2.6 s/script over the example corpus)
        # while the persistent compile cache covers the XLA side
        from . import aotstore
        if aotstore.enabled():
            self._mono_key = aotstore.program_key(self.prg, self.srate)
            exp = aotstore.load(self._mono_key, jax.default_backend())
            if exp is not None:
                self._mono_exported = True
                self._mono_cache = (exp.call, tuple(args))
                return self._mono_cache
        self._mono_cache = (jax.jit(mono), tuple(args))
        return self._mono_cache

    def save_export(self):
        """Trace + lower the one-dispatch render function and store it
        in the user export cache (see render/aotstore.py); returns the
        artifact path, or None when the mono dispatch path does not
        apply (or it was itself loaded from the store)."""
        from . import aotstore
        if not aotstore.enabled():
            return None
        self._upload()
        if getattr(self, '_st0', None) is None:
            self._st0 = make_state(self.plan)
        m = self._mono()
        if m is None or getattr(self, '_mono_exported', False):
            return None
        fn, dev_args = m
        exp = jax.export.export(fn)(
            self._st0, self._recs_dev, np.int32(0), *dev_args)
        return aotstore.save(self._mono_key, jax.default_backend(),
                             exp)

    def render_device(self):
        """Run the full render; returns a list of per-segment device
        arrays of int16 blocks (n_blocks, B, 2) -- nothing crosses the
        host boundary. Used for throughput measurement and device-side
        consumers. On TPU the whole render runs as ONE dispatch
        (_mono); otherwise consecutive flat segments sharing one
        compiled template run as one lax.scan dispatch each
        (flat.run_segments_grouped)."""
        self._upload()
        # the initial state is constant and never mutated (the render
        # is purely functional), so build it once per generator
        if getattr(self, '_st0', None) is None:
            self._st0 = make_state(self.plan)
        mono = self._mono()
        if mono is not None:
            fn, dev_args = mono
            self._salt = getattr(self, '_salt', 0) + 1
            return list(fn(self._st0, self._recs_dev,
                           np.int32(self._salt), *dev_args))
        st = self._st0
        pieces = []
        fns = self._epoch_fns()
        n_ep = len(self.plan.epochs)
        ei = 0
        while ei < n_ep:
            fl = self._flat_epoch(ei)
            if fl is None:
                st, outs = fns[ei](st, *self._ep_dev[ei],
                                   self._recs_dev)
                pieces.append(_to_i16_device(outs))
                ei += 1
                continue
            segs = list(fl)
            ej = ei + 1
            while ej < n_ep:
                fl2 = self._flat_epoch(ej)
                if fl2 is None:
                    break
                segs += fl2
                ej += 1
            from .flat import run_segments_grouped
            for st, _seg, outs in run_segments_grouped(
                    segs, st, self._recs_dev):
                pieces.append(_to_i16_device(outs))
            ei = ej
        return pieces

    def assemble(self, pieces):
        """Host (signal_end, 2) int16 timeline from render_device()
        output: trims per-block padding and restores leading-gap
        silence. Pieces arrive one per sequential epoch or one per
        flat segment, in timeline order (both dispatch paths emit
        that order)."""
        out = np.zeros((self.plan.signal_end, 2), np.int16)
        pos = 0
        it = iter(pieces)
        for ei, ep in enumerate(self.plan.epochs):
            if ep.start > pos:
                pos = int(ep.start)  # leading gap stays silent
            fl = self._flat_epoch(ei)
            if fl is None:
                arr = np.asarray(next(it))
                for k, blen in enumerate(ep.blk_len):
                    blen = int(blen)
                    if blen > 0:
                        out[pos:pos + blen] = arr[k, :blen]
                        pos += blen
            else:
                for seg in fl:
                    arr = np.asarray(next(it))
                    for k in range(seg.lo, seg.lo + seg.nb):
                        blen = int(ep.blk_len[k])
                        if blen > 0:
                            out[pos:pos + blen] = arr[k - seg.lo,
                                                      :blen]
                            pos += blen
        assert pos == self.plan.signal_end, (pos,
                                             self.plan.signal_end)
        return out

    def _stream_i16(self, stereo):
        """Yield host int16 arrays -- shape (n, 2) stereo / (n,) mono
        -- covering the timeline in order, with bounded device and
        host memory (one chunk group at a time; long scripts stream,
        matching the reference's constant-memory block loop,
        generator.c:28,905-973).

        The mono downmix happens on device from the *float* stereo
        mix -- (l+r)*0.5, clamp, rint -- matching mix_write_mono
        (generator.c:795-805); deriving mono from already-clipped
        int16 samples would diverge grossly on clipped signals
        (L=2,R=0: 32767 vs 16384)."""
        self._upload()
        st = make_state(self.plan)
        conv = _to_i16_device if stereo else _to_i16_mono_device
        pos = 0
        fns = self._epoch_fns()
        for ei, ep in enumerate(self.plan.epochs):
            # blocks are contiguous from the epoch's absolute start; a
            # leading script wait leaves [0, epochs[0].start) silent
            # with no covering block (e.g. tone_seq-v1.sau's '/0.5')
            if ep.start > pos:
                gap = int(ep.start) - pos
                yield np.zeros((gap, 2) if stereo else gap, np.int16)
                pos = int(ep.start)
            fl = self._flat_epoch(ei)
            if fl is not None:
                for seg in fl:
                    bi = int(seg.lo)
                    for kind, val, nv in seg.stream(st,
                                                    self._recs_dev):
                        if kind == 'st':
                            st = val
                            continue
                        arr = np.asarray(conv(val.reshape(
                            -1, seg.B, 2)[:nv]))
                        for k in range(nv):
                            blen = int(ep.blk_len[bi + k])
                            if blen > 0:
                                yield arr[k, :blen]
                                pos += blen
                        bi += nv
            else:
                st, outs = fns[ei](st, *self._ep_dev[ei],
                                   self._recs_dev)
                arr = np.asarray(conv(outs))
                for k, blen in enumerate(ep.blk_len):
                    if blen > 0:
                        yield arr[k, :int(blen)]
                        pos += int(blen)
        assert pos == self.plan.signal_end, (pos,
                                             self.plan.signal_end)

    def render_checksum(self):
        """Dispatch the full render and return an on-device scalar
        checksum of the output (nothing fetched). The muted player
        path uses this: with no sink to feed, samples never cross the
        host boundary -- the deployment analog of the reference's
        ``-m`` render-to-nowhere loop (saugns.c:575-623)."""
        return device_checksum(self.render_device())

    def run(self, out_i16, buf_len, stereo):
        """sauGenerator_run-compatible chunked delivery (streaming:
        pulls one chunk group from the device at a time)."""
        if self._rendered is None:
            self._stream = self._stream_i16(stereo)
            self._pending = None
            self._left = self.plan.signal_end
            self._rendered = (True, stereo)
        elif self._rendered[1] != stereo:
            raise ValueError('stereo flag changed between run() calls')
        out_i16[:] = 0
        n = 0
        while n < buf_len and self._left > 0:
            if self._pending is None or len(self._pending) == 0:
                try:
                    self._pending = next(self._stream)
                except StopIteration:
                    break
            take = min(buf_len - n, len(self._pending))
            part = self._pending[:take]
            if stereo:
                out_i16[n * 2:(n + take) * 2:2] = part[:, 0]
                out_i16[n * 2 + 1:(n + take) * 2:2] = part[:, 1]
            else:
                out_i16[n:n + take] = part
            self._pending = self._pending[take:]
            self._left -= take
            n += take
        if self._left <= 0:
            return False, n
        return True, buf_len


_cksum_fns = {}


def device_checksum(pieces):
    """On-device scalar checksum of a list of arrays (NOT fetched).

    Fetching the returned scalar forces REAL completion of everything
    that produced ``pieces``: on the dev-rig runtime
    ``jax.block_until_ready`` can return without waiting, but a
    dependent scalar fetch cannot lie. One tiny executable per
    distinct shape-set, cached in-process and in the persistent
    compile cache."""
    key = tuple((tuple(p.shape), str(p.dtype)) for p in pieces)
    ck = _cksum_fns.get(key)
    if ck is None:
        ck = jax.jit(lambda ps: sum(
            jnp.sum(p.astype(jnp.int32)) if p.dtype == jnp.int16
            else jnp.sum(p) for p in ps))
        _cksum_fns[key] = ck
    return ck(list(pieces))


def force_scalars(scalars):
    """Force completion of a list of device scalars with ONE host
    fetch (the dev-rig fetch round trip is ~25 ms per sync; a muted
    multi-script render pays it once, not once per script)."""
    if not scalars:
        return 0.0
    return float(jnp.stack([s.astype(jnp.float32)
                            for s in scalars]).sum())


def _to_i16_device(outs):
    """Clamp + round to int16 on device (mix_write semantics,
    generator.c:795-825)."""
    x = jnp.clip(outs, np.float32(-1.0), np.float32(1.0))
    return jnp.rint(x * np.float32(32767.0)).astype(jnp.int16)


def _to_i16_mono_device(outs):
    """Mono downmix of the float stereo mix on device
    (mix_write_mono, generator.c:795-805)."""
    m = (outs[..., 0] + outs[..., 1]) * np.float32(0.5)
    m = jnp.clip(m, np.float32(-1.0), np.float32(1.0))
    return jnp.rint(m * np.float32(32767.0)).astype(jnp.int16)
