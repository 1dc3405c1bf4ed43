"""Mesh-parallel rendering of heterogeneous SAU programs.

``BankRender`` (voicebank.py) shards *structurally uniform* voice
banks. This module generalizes that to arbitrary flat-eligible
programs -- multi-epoch timelines whose voices differ structurally
(e.g. ``examples/rainy_thunder.sau``'s noise voice + rasg voice):

- Each epoch's stage schedule is sliced into per-voice runs (the
  planner emits voices contiguously in ascending id order,
  plan.py:_schedule), and the per-voice views are **grouped by
  schedule signature**: one FlatSegment compile per distinct
  signature, vmapped over that group's voices.
- Groups shard over the mesh's ``voices`` axis via input shardings
  (GSPMD); each voice's computation is lane-independent, so
  partitioning is bit-transparent.
- The stereo mix is the reference's only cross-voice reduction
  (sau/generator.c:749-788). It is summed **in ascending global voice
  id order** over the gathered per-voice contributions -- the same
  left-to-right f32 chain as the engine's VMIX stage sequence -- so
  the mesh render is bit-identical to the single-device engine (and
  to the reference binary wherever the engine is).
- Scalar state between segments/epochs is carried exactly: per-voice
  oscillator carries scatter back into the packed state rows, and the
  host-simulated end tables (lines, time counters, voice durations)
  are written once per segment, as on the single-device flat path.

Programs the host sim can't fully bake (self-PM feedback, shared
state cells, ratio-flip taint) are rejected -- callers fall back to
the single-device engine, which handles everything.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..render.engine import (C_LEND, C_LFLAGS, C_LPOS, C_LTYPE, C_LV0,
                             C_LVT, C_NN, C_NPREV, C_PHASE, C_RCPHI,
                             C_RCPLO, C_TIME, C_TINF, C_WPPH, C_WPS,
                             C_WRESET, apply_records, make_state)
from ..render.flat import FlatSegment, _i
from ..render.hostsim import HostSim
from ..render.plan import (K_NOISE, K_RCYCLE, K_WPHASE, K_WRUN,
                           RenderPlan)
from .voicebank import _EpochView, _VoiceSlice, _bake_view

f32 = jnp.float32
i32 = jnp.int32


def _voice_slices(ep) -> List[_VoiceSlice]:
    """Contiguous per-voice stage/instance runs of an epoch schedule
    (the planner emits voices in ascending id order)."""
    slices: List[_VoiceSlice] = []
    cur_v = None
    for si, s in enumerate(ep.stages):
        if cur_v != s.voice:
            i_lo = s.inst
            slices.append(_VoiceSlice(si, si, i_lo, i_lo))
            cur_v = s.voice
        sl = slices[-1]
        sl.v_hi = si + 1
        if s.inst >= 0:
            sl.i_lo = min(sl.i_lo, s.inst)
            sl.i_hi = max(sl.i_hi, s.inst + 1)
    return slices


@jax.jit
def _apply_recs_dyn(st, recs, lo, hi):
    return jax.lax.cond(
        hi > lo, lambda s: apply_records(s, lo, hi, recs),
        lambda s: s, st)


class _Group:
    """One signature group within a segment: the shared FlatSegment
    template plus every member voice's baked tables."""

    def __init__(self, template: FlatSegment, voice_ids: List[int],
                 members: List[FlatSegment]):
        self.template = template
        self.voice_ids = voice_ids
        self.members = members
        host_groups = [m.host_xs_groups() for m in members]
        self.xs_groups = [
            {k: np.stack([hg[g][k] for hg in host_groups])
             for k in host_groups[0][g]}
            for g in range(template.ng)]
        host_dyn = [m.host_dyn() for m in members]
        self.dyn = {k: np.stack([hd[k] for hd in host_dyn])
                    for k in host_dyn[0]}
        self._dev = None

    def pad_to(self, n: int):
        """Pad the voice axis to a multiple of ``n`` with inert
        copies of member 0 (activity flags cleared, lengths zeroed);
        padded outputs are sliced off before the mix."""
        V = len(self.voice_ids)
        rem = (-V) % n
        if rem == 0:
            return
        def padv(a, inert=None):
            tail = np.repeat(a[:1], rem, axis=0)
            if inert is not None:
                tail = inert(tail)
            return np.concatenate([a, tail], axis=0)
        for g, xs in enumerate(self.xs_groups):
            out = {}
            for k, v in xs.items():
                if k == 'lens':
                    out[k] = padv(v, lambda t: np.zeros_like(t))
                elif k == 'act':
                    out[k] = padv(v, lambda t: np.zeros_like(t))
                else:
                    out[k] = padv(v)
            self.xs_groups[g] = out
        dyn = {}
        for k, v in self.dyn.items():
            if k == 'sact':
                dyn[k] = padv(v, lambda t: np.zeros_like(t))
            else:
                dyn[k] = padv(v)
        self.dyn = dyn

    def device_tables(self, mesh: Optional[Mesh]):
        if self._dev is None:
            if mesh is not None:
                sh = NamedSharding(mesh, PSpec('voices'))
                put = lambda a: jax.device_put(a, sh)
            else:
                put = jnp.asarray
            self._dev = ([{k: put(v) for k, v in g.items()}
                          for g in self.xs_groups],
                         {k: put(v) for k, v in self.dyn.items()})
        return self._dev


_MESH_FN_CACHE: Dict[int, tuple] = {}


def _make_group_fns(template: FlatSegment):
    """(vinit, vscan, writeback) for a signature group. Cached on the
    identity of the schedule signature's shared jitted init fn (which
    lives forever in FlatSegment._cache), so every group and segment
    with the same signature reuses one trace/compile; jit retraces
    internally for different group widths."""
    init_fn, scan_fn, _ = template._fn
    cache = _MESH_FN_CACHE.get(id(init_fn))
    if cache is not None:
        return cache

    def init_one(st, recs, dyn):
        dyn = dict(dyn)
        dyn['rec_lo'] = jnp.int32(0)
        dyn['rec_hi'] = jnp.int32(0)  # records pre-applied globally
        _, carry = init_fn(st, recs, dyn)
        return carry

    vinit = jax.jit(jax.vmap(init_one, in_axes=(None, None, 0)))
    vscan = jax.jit(jax.vmap(scan_fn))

    stages = template.ep.stages
    ph_sis = [si for si, s in enumerate(stages) if s.kind == K_WPHASE]
    cy_sis = [si for si, s in enumerate(stages) if s.kind == K_RCYCLE]
    wr_sis = [si for si, s in enumerate(stages) if s.kind == K_WRUN]
    no_sis = [si for si, s in enumerate(stages) if s.kind == K_NOISE]
    noise_pos = {si: k for k, si in enumerate(no_sis)}

    def writeback(st, carry, dyn):
        """Scatter the group's per-voice oscillator carries back into
        the packed per-op state (the vmapped analog of fini_fn's
        carry section, flat.py). Inactive rows -- mesh padding voices,
        which DUPLICATE member 0's op ids -- are routed to an
        out-of-bounds row (dropped by scatter semantics): a duplicate
        in-bounds index would race the real voice's update."""
        sf, si_arr = st['sf'], st['si']

        def seti(arr, si, col, val):
            ops = dyn['ops'][:, si]
            act = dyn['sact'][:, si]
            n = arr.shape[0]
            ops_eff = jnp.where(act, ops, jnp.int32(n))
            return arr.at[ops_eff, col].set(
                jnp.where(act, val, arr[ops, col]),
                mode='drop')

        for si in ph_sis:
            si_arr = seti(si_arr, si, C_PHASE,
                          _i(carry['ph%d' % si]))
        for si in cy_sis:
            cp = carry['cp%d' % si]
            si_arr = seti(si_arr, si, C_RCPLO,
                          _i(cp.astype(jnp.uint32)))
            si_arr = seti(si_arr, si, C_RCPHI,
                          _i((cp >> np.uint64(32)).astype(jnp.uint32)))
        for si in wr_sis:
            si_arr = seti(si_arr, si, C_WPPH, _i(carry['pp%d' % si]))
            sf = seti(sf, si, C_WPS, carry['ps%d' % si])
            si_arr = seti(si_arr, si, C_WRESET,
                          jnp.zeros_like(dyn['ops'][:, si]))
        for si in no_sis:
            si_arr = seti(si_arr, si, C_NN,
                          _i(carry['nn%d' % si]
                             + dyn['ntot'][:, noise_pos[si]]))
            si_arr = seti(si_arr, si, C_NPREV,
                          _i(carry['np%d' % si]))
        st = dict(st)
        st['sf'] = sf
        st['si'] = si_arr
        return st

    fns = (vinit, vscan, jax.jit(writeback))
    _MESH_FN_CACHE[id(init_fn)] = fns
    return fns


@jax.jit
def _seg_end(st, end):
    """Write the segment-end host-authoritative scalar columns
    (fini_fn's end-table section, flat.py)."""
    sf = st['sf']
    si_arr = st['si']
    sf = sf.at[:, C_LV0:C_LV0 + 6].set(end['lv0'])
    sf = sf.at[:, C_LVT:C_LVT + 6].set(end['lvt'])
    si_arr = si_arr.at[:, C_LPOS:C_LPOS + 6].set(end['lpos'])
    si_arr = si_arr.at[:, C_LEND:C_LEND + 6].set(end['lend'])
    si_arr = si_arr.at[:, C_LTYPE:C_LTYPE + 6].set(end['ltype'])
    si_arr = si_arr.at[:, C_LFLAGS:C_LFLAGS + 6].set(end['lflags'])
    si_arr = si_arr.at[:, C_TIME].set(end['time'])
    si_arr = si_arr.at[:, C_TINF].set(end['tinf'])
    st = dict(st)
    st['sf'] = sf
    st['si'] = si_arr
    st['vdur'] = end['vdur']
    return st


class MeshRender:
    """Renders any flat-eligible Program over a device mesh,
    bit-identically to the single-device engine.

    ``mesh``: Mesh with a 'voices' axis, or None for single-device
    execution of the same grouped path."""

    def __init__(self, prg, srate: int, mesh: Optional[Mesh] = None):
        self.prg = prg
        self.srate = srate
        self.mesh = mesh
        self.plan = RenderPlan(prg, srate)
        self.sim = HostSim(self.plan)
        for ei, bake in enumerate(self.sim.bakes):
            if not bake.eligible:
                raise ValueError(
                    'epoch %d not flat-eligible: %s' % (ei, bake.reason))
        # an op bound into several voices' graphs would make voice
        # rows non-disjoint; the grouped scatter-back requires
        # ownership
        for ep in self.plan.epochs:
            owner = {}
            for s in ep.stages:
                if s.op < 0:
                    continue
                if owner.setdefault(s.op, s.voice) != s.voice:
                    raise ValueError(
                        'operator %d shared across voices' % s.op)
        self._build()

    def _build(self):
        n_dev = self.mesh.shape['voices'] if self.mesh is not None \
            else 1
        self.epoch_segs = []
        for ep, bake in zip(self.plan.epochs, self.sim.bakes):
            slices = _voice_slices(ep)
            views = [_EpochView(ep, sl.v_lo, sl.v_hi, sl.i_lo, sl.i_hi)
                     for sl in slices]
            segs = []
            for seg in bake.segments:
                by_sig: Dict[tuple, list] = {}
                for vi, (sl, view) in enumerate(zip(slices, views)):
                    by_sig.setdefault(view.sig, []).append(vi)
                groups = []
                for sig, vis in sorted(by_sig.items(),
                                       key=lambda kv: kv[1][0]):
                    members = []
                    for vi in vis:
                        vb = _bake_view(bake, slices[vi], views[vi],
                                        src_seg=seg)
                        members.append(FlatSegment(
                            self.plan, views[vi], vb, vb.segments[0],
                            self.srate))
                    voice_ids = [ep.stages[slices[vi].v_lo].voice
                                 for vi in vis]
                    grp = _Group(members[0], voice_ids, members)
                    grp.pad_to(n_dev)
                    groups.append(grp)
                segs.append((seg, groups))
            self.epoch_segs.append((ep, segs))

    def render(self) -> np.ndarray:
        """Full render -> host (signal_end, 2) f32 stereo mix."""
        plan = self.plan
        st = make_state(plan)
        recs = {k: jnp.asarray(v) for k, v in plan.rec_arrays.items()}
        out_parts = []  # host arrays, in timeline order
        pos = 0
        for ep, segs in self.epoch_segs:
            if ep.start > pos:
                out_parts.append(np.zeros((int(ep.start) - pos, 2),
                                          np.float32))
                pos = int(ep.start)
            blk_len = np.asarray(ep.blk_len)
            for seg, groups in segs:
                lo, hi = seg.lo, seg.hi
                st = _apply_recs_dyn(
                    st, recs, jnp.int32(ep.blk_rec_lo[lo]),
                    jnp.int32(ep.blk_rec_hi[lo]))
                end_dev = getattr(seg, '_end_dev', None)
                if end_dev is None:
                    end_dev = {
                        k: jax.device_put(getattr(seg, 'end_' + k))
                        for k in ('lv0', 'lvt', 'lpos', 'lend',
                                  'ltype', 'lflags', 'time', 'tinf',
                                  'vdur')}
                    seg._end_dev = end_dev
                if not groups:  # no active voices: silence + records
                    st = _seg_end(st, end_dev)
                    for k in range(hi - lo):
                        blen = int(blk_len[lo + k])
                        if blen > 0:
                            out_parts.append(
                                np.zeros((blen, 2), np.float32))
                            pos += blen
                    continue
                t0 = groups[0].template
                # per-voice contributions, then the ordered chain sum
                per_voice = []  # (global voice order, [outs per xsg])
                carries = []
                for grp in groups:
                    vinit, vscan, writeback = _make_group_fns(
                        grp.template)
                    xs_dev, dyn_dev = grp.device_tables(self.mesh)
                    carry = vinit(st, recs, dyn_dev)
                    outs_g = []
                    for xsg in xs_dev:
                        carry, outs = vscan(carry, xsg)
                        outs_g.append(outs)
                    carries.append((writeback, carry, dyn_dev))
                    for k, v in enumerate(grp.voice_ids):
                        per_voice.append(
                            (v, [o[k] for o in outs_g]))
                for writeback, carry, dyn_dev in carries:
                    st = writeback(st, carry, dyn_dev)
                st = _seg_end(st, end_dev)
                per_voice.sort(key=lambda kv: kv[0])
                mix_parts = []
                for g in range(t0.ng):
                    mix = per_voice[0][1][g]
                    for _, outs in per_voice[1:]:
                        mix = mix + outs[g]
                    mix_parts.append(np.asarray(mix).reshape(
                        -1, t0.B, 2))
                full = np.concatenate(mix_parts, axis=0)[:t0.nb]
                for k in range(hi - lo):
                    blen = int(blk_len[lo + k])
                    if blen > 0:
                        out_parts.append(full[k, :blen])
                        pos += blen
        assert pos == plan.signal_end, (pos, plan.signal_end)
        if not out_parts:
            return np.zeros((0, 2), np.float32)
        return np.concatenate(out_parts, axis=0)

    def render_i16(self) -> np.ndarray:
        x = np.clip(self.render(), -1.0, 1.0)
        return np.rint(x * np.float32(32767.0)).astype(np.int16)


# the player buffers a mesh render whole on the host; longer programs
# fall back to the streaming engine (same cap as multi-script
# sharding, parallel/scripts.py)
MESH_MAX_BUFFER_SAMPLES = 1 << 25


def default_mesh() -> Optional[Mesh]:
    """A ('voices',) mesh over every visible device, or None when
    only one device is visible."""
    import jax as _jax
    devs = _jax.devices()
    if len(devs) < 2:
        return None
    return Mesh(np.asarray(devs), ('voices',))


class MeshGenerator:
    """sauGenerator_run-compatible generator backed by MeshRender --
    the product path the player auto-selects when more than one
    device is visible and the program is flat-eligible (the engine
    handles everything else). Raises ValueError on rejection, like
    MeshRender."""

    def __init__(self, prg, srate: int, mesh: Optional[Mesh] = None):
        if mesh is None:
            mesh = default_mesh()
        if mesh is None:
            raise ValueError('fewer than two devices visible')
        self.mr = MeshRender(prg, srate, mesh=mesh)
        if self.mr.plan.signal_end > MESH_MAX_BUFFER_SAMPLES:
            raise ValueError('program too long to buffer whole '
                             '(%d samples)' % self.mr.plan.signal_end)
        self._pre = None
        import os
        import sys
        if os.environ.get('SAUGNS_TPU_MESH_DEBUG'):
            print('# mesh-render: %d voices over %d devices'
                  % (prg.vo_count, mesh.devices.size),
                  file=sys.stderr, flush=True)

    def run(self, out_i16, buf_len, stereo):
        if self._pre is None:
            mix = self.mr.render()
            if stereo:
                arr = np.clip(mix, -1.0, 1.0)
                arr = np.rint(arr * np.float32(32767.0)) \
                    .astype(np.int16)
            else:
                # mono downmix from the float mix (mix_write_mono,
                # sau/generator.c:795-805)
                m = (mix[:, 0] + mix[:, 1]) * np.float32(0.5)
                arr = np.rint(np.clip(m, -1.0, 1.0)
                              * np.float32(32767.0)).astype(np.int16)
            from .scripts import PrerenderedGenerator
            self._pre = PrerenderedGenerator(arr, stereo)
        return self._pre.run(out_i16, buf_len, stereo)
