"""Time-axis ('sp') sharding of real compiled programs
(parallel/timeshard.py) and the ring-ordered cross-device voice mix
(parallel/voicebank.py mesh_mix='ring').

Bit-identity contracts:
- TimeShardRender over an 8-device 'sp' mesh == the host CPU backend
  (byte-identical to the reference binary) exactly -- all cross-block
  chaining is integer prefix arithmetic, which partitioning cannot
  perturb.
- The ring-ordered mesh mix == the single-device JAX engine exactly --
  the ppermute chain preserves the engine's left-to-right f32 VMIX
  accumulation order (a psum would reassociate it).
"""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from saugns_tpu.lang.program import ScriptArg, build_program
from saugns_tpu.parallel.timeshard import TimeShardRender
from saugns_tpu.parallel.voicebank import BankRender, make_bank_script
from saugns_tpu.render.cpu import Generator as CpuGen
from saugns_tpu.render.engine import JaxGenerator

SRATE = 6000

SEQ = ("Wsin f440 a.5 p[Wsin f97 a.4] t.3 /.3 "
       "Wtri f330 a.4 t.3 /.3 "
       "Wsin f550 a.4 p[Wtri f131 a.3] t.4 /.4 "
       "Wsqr f220 a.3 t.5")


def _cpu_ref(prg):
    g = CpuGen(prg, SRATE)
    buf = np.zeros(4096 * 2, np.int16)
    chunks = []
    while True:
        more, n = g.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks).reshape(-1, 2)


def _mesh(axis):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    return Mesh(np.asarray(devs[:8]), (axis,))


def test_timeshard_inline_seq_bit_identical():
    prg = build_program(ScriptArg(str=SEQ, is_path=False,
                                  no_time=True, predef=[]))
    ts = TimeShardRender(prg, SRATE, _mesh('sp'))
    mix = ts.render_host()
    ref = _cpu_ref(prg)
    assert mix.shape == ref.shape
    np.testing.assert_array_equal(mix, ref)


def test_timeshard_corpus_script_bit_identical(reference_dir):
    src = reference_dir + '/examples/tests/tone_seq-v1.sau'
    prg = build_program(ScriptArg(str=src, is_path=True,
                                  no_time=True, predef=[]))
    ts = TimeShardRender(prg, SRATE, _mesh('sp'))
    assert len(ts.segs) > 1  # really a multi-segment timeline
    mix = ts.render_host()
    ref = _cpu_ref(prg)
    np.testing.assert_array_equal(mix, ref)


def test_timeshard_selfmod_accepted_bit_identical():
    # self-PM epochs are flat-eligible since round 5 (masked selfmod
    # pass); the time-sharded render stays bit-identical, and the
    # SAUGNS_TPU_FLAT_SELFMOD=0 escape hatch restores rejection
    import os
    prg = build_program(ScriptArg(str='Wsin f100 t.5 p.a.5',
                                  is_path=False, no_time=True,
                                  predef=[]))
    ts = TimeShardRender(prg, SRATE, _mesh('sp'))
    mix = ts.render_host()
    ref = _cpu_ref(prg)
    np.testing.assert_array_equal(mix, ref)
    os.environ['SAUGNS_TPU_FLAT_SELFMOD'] = '0'
    try:
        prg2 = build_program(ScriptArg(str='Wsin f100 t.5 p.a.5',
                                       is_path=False, no_time=True,
                                       predef=[]))
        with pytest.raises(ValueError):
            TimeShardRender(prg2, SRATE, _mesh('sp'))
    finally:
        del os.environ['SAUGNS_TPU_FLAT_SELFMOD']


@pytest.mark.parametrize('n_voices', [13, 16])
def test_ring_mix_bit_identical_to_engine(n_voices):
    # 13 = uneven shard (padded with inert voices); 16 = even
    src = make_bank_script(n_voices, seed=1, duration=1.0)
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    assert prg.vo_count == n_voices
    mesh = _mesh('voices')
    bank = BankRender(prg, SRATE, mesh=mesh, ordered_mix=True,
                      mesh_mix='ring')
    mix = np.asarray(bank.render_i16()).reshape(-1, 2)
    g = JaxGenerator(prg, SRATE)
    eng = g.assemble(g.render_device())
    np.testing.assert_array_equal(mix, eng)
