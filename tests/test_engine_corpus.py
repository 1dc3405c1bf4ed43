"""Corpus-wide TPU-engine fidelity gate (the `make fullcheck` analog,
reference Makefile:31-32).

Renders reference corpus scripts through BOTH backends -- the host
renderer (byte-exact vs the reference binary on 86/89 directly
renderable scripts with the native wave tables, >=96 dB on the other
3) and the JAX engine -- at 6 kHz and asserts the engine
stays within quantization distance (SNR >= 90 dB; most scripts are
bit-identical).  This is the harness whose absence let round-1's
24-88 dB engine outliers ship unnoticed.

The FULL examples/ + devtests/ sweep (92 scripts) is the default
gate: with the persistent compile cache warm it completes in ~5
minutes on this host (first-ever run: ~19 minutes of XLA compiles).
Set SAUGNS_TPU_CORPUS_FULL=0 for the quick subset (every DSP feature
family + all previous fidelity regressions).
"""
import glob
import os

import numpy as np
import pytest

from .conftest import REFERENCE, has_reference

# previous regressions + one per feature family
QUICK = [
    'examples/tests/line_noisy.sau',       # noise-line seeds (was 24 dB)
    'examples/misc1-4fm_pm.sau',           # nested FM drift (was 54 dB)
    'examples/rainy_thunder.sau',          # rasg/noise/AM (was 75 dB)
    'examples/halfrect_ringmod.sau',       # exp/log sweeps + RM (77 dB)
    'examples/tests/hearingrange.sau',
    'examples/sounds/voicelike-Rcos_rm.sau',
    'examples/tests/through-zero-morph.sau',
    'examples/tests/wavetypes.sau',        # all 12 wave tables
    'examples/tests/sin_ramp_f-exp_log.sau',   # exp/log line fills
    'examples/tests/addrec15rand.sau',     # rasg addrec + rand
    'examples/sounds/pm_feedback_pm.sau',  # self-PM feedback
    'examples/simple_sequence-pm.sau',
    'devtests/voice-reuse.sau',
    'devtests/compnest.sau',
]


def corpus_scripts():
    if os.environ.get('SAUGNS_TPU_CORPUS_FULL', '1') != '0':
        pats = ['examples/**/*.sau', 'devtests/*.sau']
        out = []
        for p in pats:
            out += glob.glob(os.path.join(REFERENCE, p), recursive=True)
        return sorted(out)
    return [os.path.join(REFERENCE, rel) for rel in QUICK]


def _params():
    if not has_reference():
        return []
    return [p for p in corpus_scripts() if os.path.exists(p)]


@pytest.mark.parametrize(
    'path', _params(),
    ids=[os.path.relpath(p, REFERENCE) for p in _params()])
def test_engine_matches_host_renderer(path):
    from saugns_tpu.lang.program import build_program, ScriptArg
    from saugns_tpu.render.cpu import Generator
    from saugns_tpu.render.engine import JaxGenerator

    srate = 6000
    prg = build_program(ScriptArg(str=path, is_path=True, no_time=True))
    assert prg is not None

    cg = Generator(prg, srate)
    chunks = []
    buf = np.zeros(4096 * 2, dtype=np.int16)
    while True:
        more, n = cg.run(buf, 4096, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    ref = np.concatenate(chunks) if chunks else np.zeros(0, np.int16)

    jg = JaxGenerator(prg, srate)
    jchunks = []
    while True:
        more, n = jg.run(buf, 4096, True)
        jchunks.append(buf[:n * 2].copy())
        if not more:
            break
    out = np.concatenate(jchunks) if jchunks else \
        np.zeros(0, np.int16)

    assert out.shape == ref.shape, (out.shape, ref.shape)
    if out.shape[0] == 0:
        return
    err = out.astype(np.float64) - ref.astype(np.float64)
    p = (ref.astype(np.float64) ** 2).sum()
    e = (err ** 2).sum()
    if e == 0:
        return  # bit-identical
    assert p > 0, 'silent reference but nonzero engine output'
    snr = 10 * np.log10(p / e)
    assert snr >= 90.0, f'{os.path.basename(path)}: {snr:.1f} dB'
