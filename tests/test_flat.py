"""Flat (time-parallel) renderer parity gate.

The flat path (render/flat.py + render/hostsim.py) must be
bit-identical to the sequential scan engine -- same update-record
semantics, same per-sample math, different execution shape. This
asserts int16 equality over scripts covering every eligibility edge:
FM chains (global prefix sums), delayed modulators (mid-segment
oscillator activation + reset pairing), sequence-of-notes (segment
splitting at op rebinding), noise colors with state (re/vi/bv), and
leading script waits (uncovered silence).

Set SAUGNS_TPU_FLAT_FULL=1 to sweep the whole corpus (minutes).
"""
import glob
import os

import numpy as np
import pytest

from .conftest import REFERENCE, has_reference

QUICK = [
    'examples/simple_sequence-pm.sau',     # rebinding segments
    'examples/misc1-4fm_pm.sau',           # audio-rate FM
    'examples/rainy_thunder.sau',          # rasg + rangemod
    'examples/simple_mixed_up-pm.sau',     # delayed modulators (';2')
    'examples/tests/tone_seq-v1.sau',      # leading wait + segments
    'examples/tests/line_noisy.sau',       # noise-shaped lines
    'examples/tests/wavetypes.sau',        # all wave tables
    'examples/sounds/pm_feedback_pm.sau',  # self-PM (sequential path)
    'devtests/voice-reuse.sau',
]


def scripts():
    if not has_reference():
        return []
    if os.environ.get('SAUGNS_TPU_FLAT_FULL') == '1':
        out = glob.glob(os.path.join(REFERENCE, 'examples/**/*.sau'),
                        recursive=True)
        out += glob.glob(os.path.join(REFERENCE, 'devtests/*.sau'))
        return sorted(out)
    return [os.path.join(REFERENCE, rel) for rel in QUICK
            if os.path.exists(os.path.join(REFERENCE, rel))]


def _render(prg, srate, flat):
    os.environ['SAUGNS_TPU_FLAT'] = '1' if flat else '0'
    from saugns_tpu.render.engine import JaxGenerator
    g = JaxGenerator(prg, srate)
    chunks = []
    buf = np.zeros(4096 * 2, dtype=np.int16)
    while True:
        more, n = g.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks) if chunks else np.zeros(0, np.int16)


@pytest.mark.parametrize(
    'path', scripts(),
    ids=[os.path.relpath(p, REFERENCE) for p in scripts()])
def test_flat_matches_sequential(path):
    from saugns_tpu.lang.program import build_program, ScriptArg
    prg = build_program(ScriptArg(str=path, is_path=True,
                                  no_time=True))
    if prg is None:
        pytest.skip('script does not build')
    a = _render(prg, 6000, flat=False)
    b = _render(prg, 6000, flat=True)
    assert a.shape == b.shape
    assert np.array_equal(a, b), (
        '%d/%d samples differ (max %d)' % (
            int(np.sum(a != b)), len(a),
            int(np.abs(a.astype(np.int32)
                       - b.astype(np.int32)).max())))


def test_mono_dispatch_matches_multi():
    """The one-dispatch whole-render jit (engine._mono, the TPU
    default) is bit-identical to the per-group dispatch path."""
    from saugns_tpu.lang.program import build_program, ScriptArg
    path = os.path.join(REFERENCE, 'devtests/voice-reuse.sau')
    if not os.path.exists(path):
        pytest.skip('reference corpus not available')
    prg = build_program(ScriptArg(str=path, is_path=True,
                                  no_time=True))
    from saugns_tpu.render.engine import JaxGenerator
    os.environ['SAUGNS_TPU_MONO'] = 'force'
    try:
        a = [np.asarray(x)
             for x in JaxGenerator(prg, 6000).render_device()]
    finally:
        os.environ['SAUGNS_TPU_MONO'] = '0'
    b = [np.asarray(x)
         for x in JaxGenerator(prg, 6000).render_device()]
    os.environ.pop('SAUGNS_TPU_MONO', None)
    assert len(a) == len(b)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
