"""Mesh-parallel voice-bank rendering of real SAU programs.

The bank path (parallel/voicebank.py) runs an actual compiled Program
-- real frontend, real plan, real flat renderer -- with the per-voice
schedule template vmapped and sharded over a `Mesh` 'voices' axis,
psum-reducing the stereo mix over the mesh (the reference's only
cross-voice reduction, sau/generator.c:749-788).

Requirements asserted here:
- a 1-device mesh render is bit-identical to the plain engine
  (ordered per-device accumulation matches the VMIX chain), and
- an 8-device render is bit-identical to the 1-device render for the
  test bank (identical per-voice samples; only the f32 mix-reduction
  order could differ, which stays below int16 quantization here).
"""
import numpy as np
import pytest


def _bank(n_voices, duration=0.25, srate=6000):
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.parallel.voicebank import make_bank_script
    src = make_bank_script(n_voices, seed=1, duration=duration)
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    assert prg is not None and prg.vo_count == n_voices
    return prg, srate


def _engine_render(prg, srate):
    from saugns_tpu.render.engine import JaxGenerator
    g = JaxGenerator(prg, srate)
    buf = np.zeros(4096 * 2, np.int16)
    chunks = []
    while True:
        more, n = g.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks).reshape(-1, 2)


def test_bank_single_device_matches_engine():
    from saugns_tpu.parallel.voicebank import BankRender
    prg, srate = _bank(4)
    bank = BankRender(prg, srate, mesh=None, ordered_mix=True)
    mix = np.asarray(bank.render_i16())
    ref = _engine_render(prg, srate)
    assert mix.shape == ref.shape
    assert np.array_equal(mix, ref)


def test_bank_mesh_matches_single():
    import jax
    from jax.sharding import Mesh
    from saugns_tpu.parallel.voicebank import BankRender
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 (virtual) devices')
    prg, srate = _bank(8)
    single = BankRender(prg, srate, mesh=None, ordered_mix=True)
    mix1 = np.asarray(single.render_i16())
    mesh = Mesh(np.asarray(jax.devices()[:8]), ('voices',))
    sharded = BankRender(prg, srate, mesh=mesh, ordered_mix=True)
    mix8 = np.asarray(sharded.render_i16())
    assert mix8.shape == mix1.shape
    assert np.array_equal(mix8, mix1)


def test_bank_rejects_nonuniform():
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.parallel.voicebank import BankRender
    src = 'Wsin f220 t.2\nWsin f330 t.2 p[Wsin r2]\n'
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    with pytest.raises(ValueError):
        BankRender(prg, 6000)


def test_bank_128_voices_multislab_exact(monkeypatch):
    """At scale the render splits into voice slabs; each slab's
    ordered chain continues from the previous slab's partial, so the
    whole accumulation is exactly the engine's left-to-right VMIX
    chain -- bit-identical at any voice count. Force a multi-slab
    split (the tiny test bank would otherwise fit one slab) via the
    slab-budget override."""
    from saugns_tpu.parallel.voicebank import BankRender
    prg, srate = _bank(128, duration=0.2)
    # samples_pv = 1200 -> budget 38400 gives slab 32, 4 slabs
    monkeypatch.setenv('SAUGNS_TPU_BANK_SLAB_BUDGET', '38400')
    bank = BankRender(prg, srate, mesh=None)  # ordered by default
    mix = np.asarray(bank.render_i16())
    # the render must actually have split (the point of the test);
    # guards against block padding / chunk-size drift collapsing it
    # back to the single-slab case
    assert bank.n_slabs > 1, bank.n_slabs
    ref = _engine_render(prg, srate)
    assert mix.shape == ref.shape
    assert np.array_equal(mix, ref)


def test_bank_128_voices_unordered_snr_gate():
    """The opt-in tree-sum mix (ordered_mix=False, also what a
    multi-device psum does across devices) reassociates the f32 adds;
    its contract is the corpus fidelity gate: >= 90 dB SNR vs the
    engine render, same shape, same silence."""
    from saugns_tpu.parallel.voicebank import BankRender
    prg, srate = _bank(128, duration=0.2)
    bank = BankRender(prg, srate, mesh=None, ordered_mix=False)
    mix = np.asarray(bank.render_i16())
    ref = _engine_render(prg, srate)
    assert mix.shape == ref.shape
    err = (mix.astype(np.float64) - ref.astype(np.float64)).ravel()
    p = (ref.astype(np.float64) ** 2).sum()
    e = (err ** 2).sum()
    assert p > 0
    if e == 0:
        return
    snr = 10 * np.log10(p / e)
    assert snr >= 90.0, '%.1f dB' % snr


def test_selfmod_bank_bit_identical_to_engine():
    """Self-PM voices take the bank path (the flat masked selfmod
    pass, flat._wrun_self_stage) bit-identically -- the reference's
    feedback-FM structure (bass-sounds.sau) at bank scale."""
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.parallel.voicebank import (
        BankRender, make_selfmod_bank_script)
    src = make_selfmod_bank_script(8, seed=2, duration=0.5)
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    assert prg.vo_count == 8
    bank = BankRender(prg, 6000, mesh=None, ordered_mix=True)
    mix = np.asarray(bank.render_i16()).reshape(-1, 2)
    ref = _engine_render(prg, 6000).reshape(-1, 2)
    np.testing.assert_array_equal(mix, ref)


def test_selfmod_bank_128_voices_mesh_ring():
    """128 self-PM voices sharded over the 8-device mesh with the
    ring-ordered mix: bit-identical to the single-device engine."""
    import jax
    from jax.sharding import Mesh
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.parallel.voicebank import (
        BankRender, make_selfmod_bank_script)
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    src = make_selfmod_bank_script(128, seed=2, duration=0.5)
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    assert prg.vo_count == 128
    mesh = Mesh(np.asarray(devs[:8]), ('voices',))
    bank = BankRender(prg, 6000, mesh=mesh, ordered_mix=True,
                      mesh_mix='ring')
    mix = np.asarray(bank.render_i16()).reshape(-1, 2)
    ref = _engine_render(prg, 6000).reshape(-1, 2)
    np.testing.assert_array_equal(mix, ref)
