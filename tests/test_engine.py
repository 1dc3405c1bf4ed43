"""TPU engine (on virtual CPU devices) vs the CPU reference renderer,
plus multi-device sharding compile/run checks."""
import os

import numpy as np
import pytest

import jax

jax.config.update('jax_platforms', 'cpu')

from saugns_tpu.lang.program import ScriptArg, build_program  # noqa
from saugns_tpu.render.engine import JaxGenerator  # noqa
from tests.test_render_cpu import render_cpu  # noqa

SCRIPTS = [
    'Wsin',
    'Wsin f600 t.3 p[Wsin r1.5] ; f500 t.3',
    'Wsqr t.4 f80.r160[Wsin f2] a.7',
    'Rlin t.4 f300 a.5',
    'Ntw t.3 a.4',
    'Wsin t.3 f200 c[Wsin f3 a.5]',
    'Wsin t.4 f100 | Wtri t.3 f220',
]


def render_jax(prg, srate):
    g = JaxGenerator(prg, srate)
    chunks = []
    buf = np.zeros(4096 * 2, np.int16)
    while True:
        more, n = g.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks) if chunks else np.zeros(0, np.int16)


@pytest.mark.parametrize('script', SCRIPTS)
def test_engine_matches_cpu(script):
    srate = 6000
    prg = build_program(ScriptArg(str=script, is_path=False,
                                  no_time=True, predef=[]))
    ref = render_cpu(prg, srate)
    out = render_jax(prg, srate)
    assert len(out) == len(ref), (len(out), len(ref))
    if not len(ref):
        return
    err = out.astype(np.float64) - ref.astype(np.float64)
    p = (ref.astype(np.float64) ** 2).sum()
    ok = not err.any() or (
        np.abs(err).max() <= 2
        or 10 * np.log10(p / (err ** 2).sum()) >= 90.0)
    assert ok, (np.abs(err).max(),)


def test_engine_wsin_vs_golden():
    g = np.load(os.path.join(os.path.dirname(__file__), 'golden', 'wav',
                             'wsin_96k.npz'))
    prg = build_program(ScriptArg(str='Wsin', is_path=False,
                                  no_time=True, predef=[]))
    out = render_jax(prg, 96000)
    ref = g['data']
    assert len(out) == len(ref)
    err = out.astype(np.float64) - ref.astype(np.float64)
    snr = 10 * np.log10((ref.astype(np.float64) ** 2).sum()
                        / max((err ** 2).sum(), 1e-30))
    assert snr >= 90.0, snr


def test_multichip_dryrun():
    if len(jax.devices()) < 2:
        pytest.skip('needs multiple (virtual) devices')
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_entry_compiles():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    st, outs = jax.jit(fn)(*args)
    jax.block_until_ready(outs)
    assert outs.shape[-1] == 2


def test_forward_fill_tiers():
    """forward_fill_valid: all-valid fast path, isolated-invalid
    one-shift path, and the full-scan path (consecutive invalids)
    agree with a scalar reference."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from saugns_tpu.render import jdsp

    rng = np.random.RandomState(7)
    B = 2048
    s = rng.randn(B).astype(np.float32)
    prev = np.float32(3.25)
    length = B - 100

    def ref_fill(valid):
        out = np.empty(B, np.float32)
        last = prev
        for i in range(B):
            if valid[i]:
                last = s[i]
            out[i] = last
        return out

    cases = {
        'all-valid': np.ones(B, bool),
        'isolated': np.ones(B, bool),
        'runs': np.ones(B, bool),
    }
    cases['isolated'][[0, 5, 999, length - 1]] = False
    cases['runs'][10:20] = False
    cases['runs'][700:703] = False
    fn = jax.jit(lambda sr, v: jdsp.forward_fill_valid(
        sr, v, prev, length))
    for name, valid in cases.items():
        got = np.asarray(fn(jnp.asarray(s), jnp.asarray(valid)))
        ref = ref_fill(valid)
        assert np.array_equal(got[:length], ref[:length]), name
