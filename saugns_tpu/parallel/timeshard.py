"""Time-axis ('sp') sharding of a real compiled Program's render.

The flat renderer (render/flat.py) already evaluates every block of an
eligible epoch *in parallel* from host-baked states -- block-to-block
chaining is integer prefix sums, not a sequential scan. That makes the
block axis a shardable mesh dimension: bake each segment as ONE device
chunk (all blocks as rows of the (nc, B) working set), place the baked
block tables with a ``NamedSharding`` that splits the block axis over
the mesh's sequence-parallel axis, and let GSPMD partition the
computation -- the within-chunk integer prefix sums and held-roll
shifts become XLA collectives over ICI (the scaling-book recipe: pick
a mesh, annotate shardings, let XLA insert the collectives).

Output is bit-identical to the single-device engine: all cross-block
chaining is integer (u32/u64 phase and counter arithmetic), which is
associative, so partitioning cannot change a bit. Admission mirrors
the flat path (HostSim eligibility -- no self-PM epochs etc.); programs
it rejects raise ValueError and callers fall back to the engine.

Reference mapping: this parallelizes the time loop of
sauGenerator_run (sau/generator.c:905-973) across devices, the analog
of sequence parallelism for the reference's streaming block loop
(SURVEY.md §5 long-context note).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.engine import make_state, _to_i16_device
from ..render.flat import FlatSegment
from ..render.hostsim import HostSim
from ..render.plan import RenderPlan


class TimeShardRender:
    """Renders one Program with the block (time) axis sharded over
    ``mesh``'s ``axis`` dimension."""

    def __init__(self, prg, srate, mesh: Mesh, axis: str = 'sp'):
        if axis not in mesh.axis_names:
            raise ValueError('mesh has no %r axis' % axis)
        self.mesh = mesh
        self.axis = axis
        self.plan = RenderPlan(prg, srate)
        self.sim = HostSim(self.plan)
        self.srate = srate
        for ei, bake in enumerate(self.sim.bakes):
            if not bake.eligible:
                raise ValueError('epoch %d not flat-eligible (%s)'
                                 % (ei, bake.reason or
                                    'segment-level rejection'))
        # one chunk per segment: every block is a row of the chunk
        # working set, so the block axis exists as a shardable array
        # dimension (the default chunking would hide it in a scan)
        ns = mesh.shape[axis]
        self.segs = []
        for ei, ep in enumerate(self.plan.epochs):
            bake = self.sim.bakes[ei]
            for seg in bake.segments:
                fs = FlatSegment(self.plan, ep, bake, seg, srate,
                                 chunk_samples=1 << 62,
                                 row_multiple=ns)
                if fs.nch != 1 or fs.ng != 1:
                    raise ValueError('segment does not fit one chunk')
                if fs.nc % ns:
                    raise ValueError('block rows %d not divisible by '
                                     'mesh axis %d' % (fs.nc, ns))
                fs._build()
                self.segs.append((ei, fs))

    def _xs_sharded(self, fs):
        """Device placement of the baked block tables with the block
        (nc) axis split over the mesh axis. Axis map from
        flat._bake_tables / host_xs_groups:
          lens      (gch, nc, n_insts)
          lv0..lflags, noff (gch, n_stage, nc)
          last_ir/first_ir/act (gch, n_state), first (gch,)
        """
        ax = self.axis
        spec_of = {'lens': P(None, ax, None)}
        for k in ('lv0', 'lvt', 'lpos', 'lend', 'lflags', 'noff'):
            spec_of[k] = P(None, None, ax)
        groups = []
        for g in fs.host_xs_groups():
            placed = {}
            for k, v in g.items():
                spec = spec_of.get(k, P())
                placed[k] = jax.device_put(
                    v, NamedSharding(self.mesh, spec))
            groups.append(placed)
        return groups

    def render_device(self):
        """Full sharded render; returns int16 pieces, one (nb, B, 2)
        array per segment in timeline order (same contract as
        JaxGenerator.render_device)."""
        plan = self.plan
        st = make_state(plan)
        recs = {k: jnp.asarray(v) for k, v in plan.rec_arrays.items()}
        pieces = []
        for ei, fs in self.segs:
            fns = fs._fns_entry
            fused = fns['fused'][fs.ng]
            xs = self._xs_sharded(fs)
            seg = fs.seg
            end_tabs = {'lv0': seg.end_lv0, 'lvt': seg.end_lvt,
                        'lpos': seg.end_lpos, 'lend': seg.end_lend,
                        'ltype': seg.end_ltype,
                        'lflags': seg.end_lflags,
                        'time': seg.end_time, 'tinf': seg.end_tinf,
                        'vdur': seg.end_vdur}
            end_dev = {k: jax.device_put(v)
                       for k, v in end_tabs.items()}
            dyn_dev = {k: jax.device_put(v)
                       for k, v in fs.host_dyn().items()}
            st, outs = fused(st, recs, tuple(xs), end_dev, dyn_dev)
            full = outs[0].reshape(fs.gch * fs.nc, fs.B, 2)
            pieces.append(_to_i16_device(full[:fs.nb]))
        return pieces

    def render_host(self):
        """Host (signal_end, 2) int16 timeline (assembled)."""
        out = np.zeros((self.plan.signal_end, 2), np.int16)
        pos = 0
        it = iter(self.render_device())
        k = 0
        for ei, ep in enumerate(self.plan.epochs):
            if ep.start > pos:
                pos = int(ep.start)
            while k < len(self.segs) and self.segs[k][0] == ei:
                fs = self.segs[k][1]
                arr = np.asarray(next(it))
                for j in range(fs.lo, fs.lo + fs.nb):
                    blen = int(ep.blk_len[j])
                    if blen > 0:
                        out[pos:pos + blen] = arr[j - fs.lo, :blen]
                        pos += blen
                k += 1
        assert pos == self.plan.signal_end, (pos,
                                             self.plan.signal_end)
        return out
