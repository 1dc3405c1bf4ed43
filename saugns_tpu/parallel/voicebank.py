"""Mesh-parallel rendering of real SAU programs: voice-sharded banks.

The reference's only cross-voice interaction is the stereo mix
(sau/generator.c:749-788), so voices are the natural data-parallel
axis. This module renders *actual compiled Programs* -- parsed by the
real frontend, planned by RenderPlan, state-baked by HostSim, executed
by the flat renderer -- across a ``jax.sharding.Mesh``:

- The plan's per-voice stage schedules are checked for structural
  uniformity (same template modulo operator/instance renumbering --
  the shape of generated voice banks, ``make_bank_script``).
- One ``FlatSegment`` compile of the single-voice template is vmapped
  over the voice axis (the Pallas tap gather, MXU prefix scans, and
  last-valid fills all batch exactly under vmap).
- Under ``shard_map`` the voice axis is partitioned across devices and
  the stereo mix is reduced with ``jax.lax.psum`` over ICI -- the
  TPU-native form of the reference's mix accumulation loop.

Per-device accumulation is *ordered* over local voices (ascending
voice id, the default), and multi-slab single-device renders thread
the partial through each slab's chain -- so any single-device render
is bit-identical to the plain engine at any voice count. Across
multiple devices the psum reduction order differs, so
cross-device-count comparisons are exact only to f32 reduction
rounding (well below int16 quantization in practice).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..lang import program as P
from ..render import jdsp
from ..render.engine import (C_NN, C_NPREV, C_PHASE, C_RCPHI, C_RCPLO,
                             C_WPPH, C_WPS, C_WRESET, apply_records,
                             make_state)
from ..render.flat import FlatSegment, _u
from ..render.hostsim import HostSim
from ..render.plan import (K_NOISE, K_RCYCLE, K_VMIX, K_WPHASE,
                           K_WRUN, RenderPlan)

f32 = jnp.float32
i32 = jnp.int32


def make_bank_script(n_voices: int, seed: int = 0,
                     duration: float = 1.0) -> str:
    """Generate a real SAU script: an n-voice PM bank (carrier with
    one phase modulator each, spread over pitch/index/pan). Parses
    through the ordinary frontend into n independent voices."""
    rng = np.random.RandomState(seed)
    lines = ['S a.m%.3f' % (1.0 / max(n_voices, 1))]
    for v in range(n_voices):
        freq = 110.0 * 2.0 ** (rng.randint(0, 36) / 12.0)
        ratio = rng.choice([0.5, 1.0, 1.5, 2.0, 3.0])
        index = rng.uniform(0.2, 1.5)
        pan = rng.uniform(-1.0, 1.0)
        lines.append(
            'Wsin f%.2f t%.3f a1 c%.3f p[Wsin r%.2f a%.3f]'
            % (freq, duration, pan, ratio, index))
    return '\n'.join(lines) + '\n'


def make_selfmod_bank_script(n_voices: int, seed: int = 0,
                             duration: float = 1.0) -> str:
    """n-voice bank where every carrier uses phase SELF-modulation
    ("feedback FM", wosc.h:273-310) with a per-voice strength --
    the structure of examples/sounds/bass-sounds.sau, uniform across
    voices so the bank path's template check admits it."""
    rng = np.random.RandomState(seed)
    lines = ['S a.m%.3f' % (1.0 / max(n_voices, 1))]
    for v in range(n_voices):
        freq = 55.0 * 2.0 ** (rng.randint(0, 24) / 12.0)
        strength = rng.uniform(0.1, 0.6)
        pan = rng.uniform(-1.0, 1.0)
        lines.append('Wsin f%.2f t%.3f a1 c%.3f p.a%.3f'
                     % (freq, duration, pan, strength))
    return '\n'.join(lines) + '\n'


class _EpochView:
    """Single-voice view of one epoch: the stage/instance slice of one
    voice with instance ids renumbered, presented with the attribute
    surface FlatSegment consumes."""

    def __init__(self, ep, v_lo, v_hi, i_lo, i_hi):
        from ..render.plan import Stage, Instance
        self.block = ep.block
        self.blk_len = ep.blk_len
        nb = len(ep.blk_len)
        self.blk_rec_lo = np.zeros(nb, np.int32)
        self.blk_rec_hi = np.zeros(nb, np.int32)
        self.blk_stage_op = np.asarray(ep.blk_stage_op)[:, v_lo:v_hi]
        self.blk_inst_op = np.asarray(ep.blk_inst_op)[:, i_lo:i_hi]
        self.stages = []
        for s in ep.stages[v_lo:v_hi]:
            s2 = Stage(**{k: getattr(s, k) for k in
                          ('kind', 'inst', 'op', 'dst', 'a', 'b', 'c',
                           'line', 'wave_env', 'layer', 'skip_line',
                           'voice', 'freq_buf_id', 'wave', 'ntype',
                           'ltype', 'ras')})
            s2.inst = s.inst - i_lo if s.inst >= 0 else -1
            s2.voice = 0
            self.stages.append(s2)
        self.instances = []
        for it in ep.instances[i_lo:i_hi]:
            self.instances.append(Instance(
                op=it.op, parent=it.parent - i_lo
                if it.parent >= 0 else -1, voice=0))
        stage_sig, inst_src, scatter = ep.sig
        sig_v = tuple(
            (s[0], s[1] - i_lo if s[1] >= 0 else s[1]) + s[2:11]
            + (s[11] - i_lo if s[11] >= 0 else s[11],) + s[12:]
            for s in stage_sig[v_lo:v_hi])
        src_v = tuple(x - i_lo if x >= 0 else -1
                      for x in inst_src[i_lo:i_hi])
        self.sig = (sig_v, src_v, ())


@dataclass
class _VoiceSlice:
    v_lo: int
    v_hi: int
    i_lo: int
    i_hi: int


class BankPlan:
    """Uniformity analysis + per-voice flat segments for a Program
    whose voices share one schedule template."""

    def __init__(self, prg, srate):
        self.prg = prg
        self.srate = srate
        self.plan = RenderPlan(prg, srate)
        self.sim = HostSim(self.plan)
        self.ok, self.why = self._analyze()

    def _analyze(self):
        plan = self.plan
        # main epoch = the last one (bank scripts: all records at t=0,
        # one rendering epoch); all earlier epochs must be empty
        self.main_ei = len(plan.epochs) - 1
        for ep in plan.epochs[:-1]:
            if ep.start != ep.end:
                return False, 'multiple rendering epochs'
        ep = plan.epochs[-1]
        bake = self.sim.bakes[-1]
        if not bake.eligible or len(bake.segments) != 1:
            return False, 'main epoch not a single flat segment: ' \
                + bake.reason
        # split stages into per-voice runs
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
        self.slices = slices
        views = [_EpochView(ep, sl.v_lo, sl.v_hi, sl.i_lo, sl.i_hi)
                 for sl in slices]
        sig0 = views[0].sig
        for v in views[1:]:
            if v.sig != sig0:
                return False, 'voices are not structurally uniform'
        self.views = views
        self.n_voices = len(views)
        return True, ''

    def build(self):
        """Per-voice FlatSegments (one shared compile) + stacked
        device tables."""
        assert self.ok, self.why
        ep = self.plan.epochs[self.main_ei]
        bake = self.sim.bakes[self.main_ei]
        segs = []
        # per-voice chunk size: the Pallas kernels flatten vmapped
        # batches into the sample axis (jdsp._flatten_batch), so the
        # old Mosaic working-set cap no longer binds -- and small
        # chunks win (sweep on a 1024-voice 8 s bank on v5e with the
        # fused sample+fill kernel: 1 block = 0.93 s, 2 = 0.97 s,
        # 4 = 0.99 s, 6 = 1.05 s; larger chunks grow the HBM working
        # set faster than they shave launches)
        import os as _os
        nblk = int(_os.environ.get('SAUGNS_TPU_BANK_CHUNK_BLOCKS',
                                   '1'))
        chunk = self.plan.epochs[self.main_ei].block * nblk
        for k, (sl, view) in enumerate(zip(self.slices, self.views)):
            vb = _bake_view(bake, sl, view)
            fs = FlatSegment(self.plan, view, vb, vb.segments[0],
                             self.srate, chunk_samples=chunk)
            segs.append(fs)
        self.segs = segs
        f0 = segs[0]
        self.gch, self.ng, self.nc, self.B = (f0.gch, f0.ng, f0.nc,
                                              f0.B)
        self.nb = f0.nb
        # stacked per-voice tables, assembled host-side then uploaded
        # in one device_put per array (a device_put per voice costs a
        # tunnel round trip each -- minutes at 1024 voices)
        host_groups = [s.host_xs_groups() for s in segs]
        self.xs_groups = []
        for g in range(f0.ng):
            self.xs_groups.append({
                k: jnp.asarray(np.stack(
                    [hg[g][k] for hg in host_groups]))
                for k in host_groups[0][g]})
        host_dyn = [s.host_dyn() for s in segs]
        self.dyn = {k: jnp.asarray(np.stack(
            [hd[k] for hd in host_dyn])) for k in host_dyn[0]}
        # record range covering everything up to the main epoch's end
        # of block-0 records (all bank records land at t=0)
        self.rec_hi = int(ep.blk_rec_hi[0])
        return self


def _bake_view(bake, sl, view, src_seg=None):
    """Slice an EpochBake down to one voice's stages/instances.
    ``src_seg``: the segment to mirror (default: the single segment
    of a bank epoch); its block range and end-state tables carry
    over -- end tables are global (n_ops ...) and identical across
    voice views."""
    from ..render.hostsim import EpochBake, SegBake
    vb = EpochBake(eligible=True)
    vb.lens = np.asarray(bake.lens)[:, sl.i_lo:sl.i_hi]
    vb.gates = np.asarray(bake.gates)[:, sl.i_lo:sl.i_hi]
    vb.stages = {}
    for si in range(sl.v_lo, sl.v_hi):
        if si in bake.stages:
            vb.stages[si - sl.v_lo] = bake.stages[si]
    src = bake.segments[0] if src_seg is None else src_seg
    seg = SegBake(lo=src.lo if src_seg is not None else 0,
                  hi=src.hi if src_seg is not None
                  else len(view.blk_len), eligible=True)
    for k in ('end_lv0', 'end_lvt', 'end_lpos', 'end_lend',
              'end_ltype', 'end_lflags', 'end_time', 'end_tinf',
              'end_vdur'):
        setattr(seg, k, getattr(src, k))
    vb.segments = [seg]
    return vb


class BankRender:
    """Renders a uniform-voice Program over a device mesh.

    ``mesh``: a Mesh with a 'voices' axis (or None for single-device).
    The per-voice flat scan is vmapped; voices shard over the mesh and
    the stereo mix is psum-reduced over ICI."""

    def __init__(self, prg, srate, mesh: Optional[Mesh] = None,
                 ordered_mix: Optional[bool] = None,
                 mesh_mix: str = 'psum'):
        self.bp = BankPlan(prg, srate)
        if not self.bp.ok:
            raise ValueError('program is not a uniform voice bank: '
                             + self.bp.why)
        self.bp.build()
        self.mesh = mesh
        # cross-device mix: 'psum' (one all-reduce; f32 adds
        # reassociate across devices) or 'ring' (n_dev ppermute hops;
        # bit-exact left-to-right voice chain)
        self.mesh_mix = mesh_mix
        # default: exact. Single-device renders (any voice count, any
        # slab split) then reproduce the engine's left-to-right VMIX
        # chain bit-for-bit; the chain is unrolled and fuses to
        # ~one-pass bandwidth, so there is no speed reason to give
        # exactness up. Pass ordered_mix=False for a tree-sum mix
        # (what a multi-device psum does across devices anyway).
        self.ordered_mix = True if ordered_mix is None else ordered_mix

    def _mix_local(self, outs, acc=None):
        """outs: (V_local, gch, nc, B, 2) -> (gch*nc*B, 2), summing
        voices. Ordered (ascending id, matching the engine's VMIX
        chain) when requested -- f32 adds are order-sensitive.
        ``acc`` continues the chain from an earlier slab's partial at
        the same sample positions, keeping the whole multi-slab
        accumulation exactly the engine's left-to-right order."""
        V = outs.shape[0]
        flat = outs.reshape(V, -1, 2)
        if self.ordered_mix:
            init = flat[0] if acc is None else acc + flat[0]
            if V <= 256:
                # unrolled: XLA fuses the whole dependency chain into
                # one (or a few) elementwise passes -- exact order at
                # one-pass bandwidth, no per-iteration launches
                mix = init
                for k in range(1, V):
                    mix = mix + flat[k]
            else:
                # wide mesh shards (>256 local voices): keep the exact
                # left-to-right chain but bound the sequential device
                # loop -- each fori_loop step adds 256 voices as one
                # unrolled (fused) chain continuing from the carry, so
                # the accumulation order is still exactly ascending
                # voice id at V/256 launches instead of V-1
                head = min(V % 256 or 256, V)
                mix = init
                for k in range(1, head):
                    mix = mix + flat[k]
                if V > head:
                    tail = flat[head:].reshape((V - head) // 256, 256,
                                               *flat.shape[1:])

                    def body(k, a):
                        blk = tail[k]
                        for j in range(256):
                            a = a + blk[j]
                        return a
                    mix = jax.lax.fori_loop(0, tail.shape[0], body,
                                            mix)
        else:
            mix = jnp.sum(flat, axis=0)
            if acc is not None:
                mix = acc + mix
        return mix

    def _vfns(self):
        if getattr(self, '_vinit', None) is None:
            init_fn, scan_fn, _ = self.bp.segs[0]._fn

            def init_one(st, recs, dyn):
                dyn = dict(dyn)
                dyn['rec_lo'] = jnp.int32(0)
                dyn['rec_hi'] = jnp.int32(0)  # records pre-applied
                _, carry = init_fn(st, recs, dyn)
                return carry

            self._vinit = jax.jit(
                jax.vmap(init_one, in_axes=(None, None, 0)))
            self._vscan = jax.jit(jax.vmap(scan_fn))
        return self._vinit, self._vscan

    def render(self):
        """Full render -> (n_samples, 2) f32 stereo mix (device)."""
        bp = self.bp
        plan = bp.plan
        # the post-records state is a pure function of the program --
        # rebuilding it per render re-ran the sequential apply_records
        # while-loop on device (~0.6 s of a 1.6 s 1024-voice render)
        if getattr(self, '_st_recs', None) is None:
            st = make_state(plan)
            recs = {k: jnp.asarray(v)
                    for k, v in plan.rec_arrays.items()}
            st = jax.jit(apply_records, static_argnums=(1, 2))(
                st, 0, bp.rec_hi, recs)
            st = jax.block_until_ready(st)
            self._st_recs = (st, recs)
        st, recs = self._st_recs
        init_fn, scan_fn, fini_fn = bp.segs[0]._fn

        def init_one(dyn):
            dyn = dict(dyn)
            dyn['rec_lo'] = jnp.int32(0)
            dyn['rec_hi'] = jnp.int32(0)  # records already applied
            _, carry = init_fn(st, recs, dyn)
            return carry

        if self.mesh is None:
            # voice slabs bound live buffer memory (a 1024-wide vmap
            # of the whole template OOMs the compiler). The slab loop
            # runs as ONE lax.scan inside one jit -- the previous
            # eager per-slab dispatch loop cost ~20 device round
            # trips per slab (128 slabs at 1024 voices never finished
            # inside the bench budget through the dev-rig tunnel).
            # Slabs accumulate in ascending voice order; with
            # ordered_mix each slab continues the chain from the
            # previous slab's partial, so the whole render -- any
            # voice count, any slab split -- is exactly the engine's
            # left-to-right VMIX chain.
            V = bp.n_voices
            samples_pv = bp.nb * bp.B
            # wide slabs amortize per-kernel launch overhead (the
            # bank's small-chunk body runs ~300 kernels per chunk;
            # at slab 8 a 1024-voice render was launch-bound at
            # ~6.7 s); the per-chunk working set stays bounded by
            # chunk_samples, so the budget here is output-buffer HBM
            # (env override exists so tests can force multi-slab
            # splits on tiny banks)
            import os as _os
            raw = _os.environ.get('SAUGNS_TPU_BANK_SLAB_BUDGET',
                                  str(1 << 25))
            try:
                budget = int(raw)
            except ValueError:
                raise ValueError(
                    'SAUGNS_TPU_BANK_SLAB_BUDGET must be an integer '
                    'sample budget, got %r' % raw) from None
            budget = max(budget, 1)
            # cap slab width: compile cost grows superlinearly with
            # the vmapped body width (a 64-wide slab never finished
            # compiling on the dev rig, docs/ROUND4-NOTES.md), and
            # <=256 keeps the ordered mix on its unrolled branch
            slab = max(1, min(V, 256, budget // max(samples_pv, 1)))
            # shrink to a divisor of V: a remainder slab would mint a
            # second (differently-shaped) executable for no gain
            while V % slab:
                slab -= 1
            n_slabs = V // slab
            self.n_slabs, self.slab = n_slabs, slab

            def reslab(a):
                return a.reshape((n_slabs, slab) + a.shape[1:])

            # upload the reslabbed per-voice inputs once -- they are
            # immutable, and re-feeding host arrays re-transferred
            # them over the tunnel on every render
            if getattr(self, '_slab_dev', None) is None:
                dyn_r = jax.tree.map(
                    lambda a: jnp.asarray(reslab(a)), bp.dyn)
                xs_r = tuple(jax.tree.map(
                    lambda a: jnp.asarray(reslab(a)), g)
                    for g in bp.xs_groups)
                self._slab_dev = (dyn_r, xs_r)
            dyn_r, xs_r = self._slab_dev

            glen = bp.gch * bp.nc * bp.B

            def render_all(st, recs, salt, dyn_r, xs_r):
                def slab_body(acc, args):
                    dyn_s, xs_s = args
                    carry = jax.vmap(
                        lambda d: init_one_of(st, recs, d))(dyn_s)
                    # each slab continues the left-to-right voice
                    # chain from the previous slab's partial (exact
                    # VMIX order even multi-slab; a post-hoc
                    # `acc + part` would reassociate the f32 adds)
                    parts = []
                    for g in range(len(xs_s)):
                        carry, outs = jax.vmap(scan_fn)(
                            carry, xs_s[g])
                        parts.append(self._mix_local(
                            outs, acc[g * glen:(g + 1) * glen]))
                    part = parts[0] if len(parts) == 1 \
                        else jnp.concatenate(parts, axis=0)
                    return part, None

                # salt: per-call no-op input defeating the dev-rig
                # runtime's identical-call replay cache (see
                # jdsp.salt_zero; a foldable `salt * 0` lets XLA prune
                # the parameter and repeat calls replay)
                acc0 = jnp.zeros((bp.gch * bp.nc * bp.B * bp.ng, 2),
                                 f32) + jdsp.salt_zero(salt)
                acc, _ = jax.lax.scan(slab_body, acc0, (dyn_r, xs_r))
                return acc

            def init_one_of(st, recs, dyn):
                dyn = dict(dyn)
                dyn['rec_lo'] = jnp.int32(0)
                dyn['rec_hi'] = jnp.int32(0)  # records pre-applied
                _, carry = init_fn(st, recs, dyn)
                return carry

            if getattr(self, '_render_all', None) is None:
                self._render_all = jax.jit(render_all)
            self._salt = getattr(self, '_salt', 0) + 1
            mix = self._render_all(st, recs, np.int32(self._salt),
                                   dyn_r, xs_r)
            return mix[:self._n_valid()]

        vspec = PSpec('voices')
        n_dev_mix = self.mesh.shape['voices']
        ring = self.mesh_mix == 'ring'
        glen = bp.gch * bp.nc * bp.B

        def shard_body(dyn, *xs_groups):
            carry = jax.vmap(init_one)(dyn)
            outs_g = []
            for xsg in xs_groups:
                carry, outs = jax.vmap(scan_fn)(carry, xsg)
                outs_g.append(outs)
            if not ring:
                mix = jnp.concatenate(
                    [self._mix_local(o) for o in outs_g], axis=0)
                return jax.lax.psum(mix, 'voices')
            # ring-ordered mix: device d receives the running partial
            # from device d-1 and continues the left-to-right voice
            # chain with its own (contiguous) voice range, so the
            # cross-device accumulation order is EXACTLY the engine's
            # VMIX chain (psum would reassociate the f32 adds). Cost:
            # n_dev ppermute hops instead of one all-reduce -- the
            # exactness/latency tradeoff is the caller's choice.
            idx = jax.lax.axis_index('voices')
            perm = [(i, (i + 1) % n_dev_mix)
                    for i in range(n_dev_mix)]
            acc = jnp.zeros((glen * len(outs_g), 2), f32)
            for d in range(n_dev_mix):
                parts = [self._mix_local(
                    outs_g[g], acc[g * glen:(g + 1) * glen])
                    for g in range(len(outs_g))]
                new = parts[0] if len(parts) == 1 \
                    else jnp.concatenate(parts, axis=0)
                acc = jnp.where(idx == d, new, acc)
                acc = jax.lax.ppermute(acc, 'voices', perm)
            # after n_dev hops the finished chain sits on device 0;
            # replicate it (adding exact zeros elsewhere)
            return jax.lax.psum(
                jnp.where(idx == 0, acc, jnp.zeros_like(acc)),
                'voices')

        # uneven voice counts: pad the voice axis to a multiple of the
        # mesh's 'voices' extent with inert voices (every stage length
        # zeroed -> all sample masks false -> zero mix contribution,
        # which is exact: the reference's mix accumulation adds each
        # absent voice as nothing, and x + 0.0f == x for the finite
        # mix values here)
        n_dev = self.mesh.shape['voices']
        pad = (-bp.n_voices) % n_dev
        dyn_h, xs_h = bp.dyn, bp.xs_groups
        if pad:
            def padv(a):
                a = np.asarray(a)
                return np.concatenate(
                    [a, np.repeat(a[-1:], pad, axis=0)], axis=0)
            dyn_h = jax.tree.map(padv, dyn_h)
            xs_h = [jax.tree.map(padv, g) for g in xs_h]
            for g in xs_h:
                g['lens'][bp.n_voices:] = 0
        in_specs = (jax.tree.map(lambda _: vspec, dyn_h),) + tuple(
            jax.tree.map(lambda _: vspec, g) for g in xs_h)
        fn = jax.jit(jax.shard_map(
            shard_body, mesh=self.mesh, in_specs=in_specs,
            out_specs=PSpec(), check_vma=False))
        dyn_sh = jax.device_put(
            dyn_h, NamedSharding(self.mesh, vspec))
        xs_sh = [jax.device_put(
            g, jax.tree.map(
                lambda _: NamedSharding(self.mesh, vspec), g))
            for g in xs_h]
        mix = fn(dyn_sh, *xs_sh)
        return mix[:self._n_valid()]

    def _n_valid(self):
        ep = self.bp.plan.epochs[self.bp.main_ei]
        return int(np.sum(np.asarray(ep.blk_len)))

    def render_i16(self):
        x = jnp.clip(self.render(), np.float32(-1.0), np.float32(1.0))
        return jnp.rint(x * np.float32(32767.0)).astype(jnp.int16)
