#!/usr/bin/env python
"""Validate hostsim's baked end-of-epoch scalar state against the
sequential device engine's state, epoch by epoch."""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


SCRIPTS = [
    '/root/reference/examples/simple_sequence-pm.sau',
    '/root/reference/examples/misc1-4fm_pm.sau',
    '/root/reference/examples/rainy_thunder.sau',
    '/root/reference/examples/tests/line_noisy.sau',
    '/root/reference/examples/halfrect_ringmod.sau',
    '/root/reference/examples/tests/hearingrange.sau',
    '/root/reference/examples/sounds/voicelike-Rcos_rm.sau',
    '/root/reference/examples/tests/through-zero-morph.sau',
    '/root/reference/examples/tests/wavetypes.sau',
    '/root/reference/examples/tests/sin_ramp_f-exp_log.sau',
    '/root/reference/examples/tests/addrec15rand.sau',
    '/root/reference/examples/simple_sounds.sau',
    '/root/reference/devtests/voice-reuse.sau',
    '/root/reference/devtests/compnest.sau',
]


def main():
    import jax.numpy as jnp
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render import engine as E
    from saugns_tpu.render.hostsim import HostSim, N_SLOTS
    from saugns_tpu.render.plan import RenderPlan

    srate = 6000
    n_bad = 0
    for path in SCRIPTS:
        prg = build_program(ScriptArg(str=path, is_path=True,
                                      no_time=True, predef=[]))
        plan = RenderPlan(prg, srate)
        sim = HostSim(plan)
        g = E.JaxGenerator(prg, srate)
        g._upload()
        st = E.make_state(plan)
        name = os.path.basename(path)
        for ei, (fn, dev, ep, bake) in enumerate(zip(
                g._epoch_fns(), g._ep_dev, plan.epochs, sim.bakes)):
            st, _ = fn(st, *dev, g._recs_dev)
            tag = 'eligible' if bake.eligible else \
                ('skip: ' + bake.reason)
            if not bake.eligible:
                print('%-28s ep%d %s' % (name, ei, tag))
                continue
            sf = np.asarray(st['sf'])
            si = np.asarray(st['si'])
            vd = np.asarray(st['vdur'])
            errs = []
            if not np.array_equal(sf[:, 0:6], bake.end_lv0):
                errs.append('lv0')
            if not np.array_equal(sf[:, 6:12], bake.end_lvt):
                errs.append('lvt')
            if not np.array_equal(si[:, 0:6], bake.end_lpos):
                errs.append('lpos')
            if not np.array_equal(si[:, 6:12], bake.end_lend):
                errs.append('lend')
            if not np.array_equal(si[:, 12:18], bake.end_ltype):
                errs.append('ltype')
            if not np.array_equal(si[:, 18:24], bake.end_lflags):
                errs.append('lflags')
            if not np.array_equal(si[:, 24], bake.end_time):
                errs.append('time')
            if not np.array_equal(si[:, 25], bake.end_tinf):
                errs.append('tinf')
            if not np.array_equal(vd, bake.end_vdur):
                errs.append('vdur')
            if errs:
                n_bad += 1
                print('%-28s ep%d MISMATCH: %s' % (name, ei,
                                                   ','.join(errs)))
                if 'lv0' in errs:
                    d = np.argwhere(sf[:, 0:6] != bake.end_lv0)
                    for op, sl in d[:4]:
                        print('   op%d sl%d dev %r sim %r'
                              % (op, sl, sf[op, sl],
                                 bake.end_lv0[op, sl]))
                if 'time' in errs:
                    d = np.argwhere(si[:, 24] != bake.end_time)
                    for (op,) in d[:4]:
                        print('   op%d time dev %r sim %r'
                              % (op, si[op, 24], bake.end_time[op]))
                if 'lpos' in errs:
                    d = np.argwhere(si[:, 0:6] != bake.end_lpos)
                    for op, sl in d[:4]:
                        print('   op%d sl%d pos dev %r sim %r'
                              % (op, sl, si[op, sl], bake.end_lpos[op, sl]))
                if 'vdur' in errs:
                    print('   vdur dev %r sim %r' % (vd, bake.end_vdur))
            else:
                print('%-28s ep%d OK (%d blocks)' % (name, ei,
                                                     len(ep.blk_len)))
    print('bad epochs:', n_bad)
    sys.exit(1 if n_bad else 0)


if __name__ == '__main__':
    main()
