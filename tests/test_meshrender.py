"""Mesh-parallel rendering of heterogeneous programs (meshrender.py)
and multi-script sharding (parallel/scripts.py).

Bit-identity contract: the grouped, voice-sharded flat render must
equal the host CPU backend (itself byte-identical to the reference
binary) exactly -- the mix is summed in ascending voice order, the
same f32 chain as the engine's VMIX stages."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from saugns_tpu.lang.program import ScriptArg, build_program
from saugns_tpu.parallel.meshrender import MeshRender
from saugns_tpu.render.cpu import Generator as CpuGen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# three structurally different voices: FM wave, noise, rasg
HETERO = ("Wsin f440 t0.3 a.4 p[Wsin r2 a.5]\n"
          "Nwh a0.2 t0.25\n"
          "Rlin f200 t0.2 a.3\n")

SRATE = 6000


def _cpu_ref(prg, srate):
    g = CpuGen(prg, srate)
    buf = np.zeros(4096 * 2, np.int16)
    chunks = []
    while True:
        more, n = g.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks).reshape(-1, 2)


def _build(src, is_path=False):
    return build_program(ScriptArg(str=src, is_path=is_path,
                                   no_time=True, predef=[]))


def test_hetero_single_device_bit_identical():
    prg = _build(HETERO)
    assert prg.vo_count == 3
    mr = MeshRender(prg, SRATE, mesh=None)
    # three distinct schedule signatures -> three groups
    n_groups = len(mr.epoch_segs[-1][1][0][1])
    assert n_groups == 3
    mix = mr.render_i16()
    ref = _cpu_ref(prg, SRATE)
    assert mix.shape == ref.shape
    assert np.array_equal(mix, ref)


def test_hetero_mesh8_bit_identical():
    from jax.sharding import Mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(np.asarray(jax.devices()[:8]), ('voices',))
    prg = _build(HETERO)
    mr = MeshRender(prg, SRATE, mesh=mesh)
    mix = mr.render_i16()
    ref = _cpu_ref(prg, SRATE)
    assert np.array_equal(mix, ref)


def test_corpus_multivoice_mesh_bit_identical():
    """A real corpus script (multi-epoch, heterogeneous voices) over
    the 8-device mesh equals the reference-exact CPU backend."""
    from jax.sharding import Mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    path = '/root/reference/examples/tests/defaulttime.sau'
    if not os.path.exists(path):
        pytest.skip('reference corpus not available')
    mesh = Mesh(np.asarray(jax.devices()[:8]), ('voices',))
    prg = _build(path, is_path=True)
    assert prg.vo_count == 2
    mr = MeshRender(prg, SRATE, mesh=mesh)
    mix = mr.render_i16()
    ref = _cpu_ref(prg, SRATE)
    assert np.array_equal(mix, ref)


def test_selfmod_program_accepted_bit_identical():
    """Self-PM voices are flat-eligible since round 5 (the masked
    selfmod pass, flat._wrun_self_stage): the mesh renderer accepts
    them and stays bit-identical to the host oracle. With
    SAUGNS_TPU_FLAT_SELFMOD=0 the old sequential routing (rejection
    here) still applies."""
    hsrc = ("Wsin f440 t0.3 a.4 p.a.4\n"
            "Nwh a0.2 t0.25\n"
            "Rlin f200 t0.2 a.3 p.a.3\n")
    prg = _build(hsrc)
    mr = MeshRender(prg, SRATE)
    mix = np.asarray(mr.render_i16())
    ref = _cpu_ref(prg, SRATE)
    assert mix.shape == ref.shape
    np.testing.assert_array_equal(mix, ref)
    import os
    os.environ['SAUGNS_TPU_FLAT_SELFMOD'] = '0'
    try:
        with pytest.raises(ValueError):
            MeshRender(_build(hsrc), SRATE)
    finally:
        del os.environ['SAUGNS_TPU_FLAT_SELFMOD']


def test_player_selects_mesh_generator():
    """The product path: with >1 device visible, the player's backend
    selection takes the mesh renderer for flat-eligible multi-voice
    programs and falls back to the engine on rejection (self-PM)."""
    if len(jax.devices()) < 2:
        pytest.skip('needs multiple devices')
    from saugns_tpu.io.player import _make_generator
    from saugns_tpu.parallel.meshrender import MeshGenerator
    from saugns_tpu.render.engine import JaxGenerator
    gen = _make_generator(_build(HETERO), SRATE)
    assert isinstance(gen, MeshGenerator)
    # self-PM: mesh renderer rejects -> engine fallback
    gen2 = _make_generator(_build("Wsin f100 t0.2 p.a.5"), SRATE)
    assert isinstance(gen2, JaxGenerator)


def test_cli_mesh_path_output_identical(tmp_path):
    """A CLI render on the 8-device CPU mesh takes the mesh path
    (debug marker asserts engagement) and writes a WAV byte-identical
    to the mesh-disabled engine render."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    script = '/root/reference/examples/tests/defaulttime.sau'
    if not os.path.exists(script):
        pytest.skip('reference corpus not available')
    outs = []
    for mesh_on in ('1', '0'):
        out = str(tmp_path / ('mesh%s.wav' % mesh_on))
        env = dict(os.environ, PYTHONPATH=REPO,
                   SAUGNS_TPU_MESH=mesh_on,
                   SAUGNS_TPU_MESH_DEBUG='1',
                   SAUGNS_TPU_SHARD_SCRIPTS='0',
                   XLA_FLAGS='--xla_force_host_platform_device_count=8',
                   JAX_PLATFORMS='cpu')
        r = subprocess.run(
            [sys.executable, '-m', 'saugns_tpu.cli', '-d', '-r6000',
             '-m', '-o', out, script],
            capture_output=True, env=env, timeout=600, cwd=REPO)
        assert r.returncode == 0, r.stderr.decode()
        marker = b'# mesh-render:' in r.stderr
        assert marker == (mesh_on == '1'), r.stderr.decode()
        outs.append(open(out, 'rb').read())
    assert outs[0] == outs[1]
    assert len(outs[0]) > 44


def test_multi_script_sharding_output_identical(tmp_path):
    """CLI rendering of a script list with sharding on vs off produces
    byte-identical WAV output (order-preserving sink writes)."""
    if len(jax.devices()) < 2:
        pytest.skip('needs multiple devices')
    scripts = ['/root/reference/examples/tests/defaulttime.sau',
               '/root/reference/devtests/voice-reuse.sau']
    for s in scripts:
        if not os.path.exists(s):
            pytest.skip('reference corpus not available')
    outs = []
    for shard in ('0', '1'):
        out = str(tmp_path / ('out%s.wav' % shard))
        env = dict(os.environ, PYTHONPATH=REPO,
                   SAUGNS_TPU_SHARD_SCRIPTS=shard,
                   XLA_FLAGS='--xla_force_host_platform_device_count=8',
                   JAX_PLATFORMS='cpu')
        r = subprocess.run(
            [sys.executable, '-m', 'saugns_tpu.cli', '-d', '-r6000',
             '-m', '-o', out] + scripts,
            capture_output=True, env=env, timeout=600, cwd=REPO)
        assert r.returncode == 0, r.stderr.decode()
        outs.append(open(out, 'rb').read())
    assert outs[0] == outs[1]
    assert len(outs[0]) > 44
