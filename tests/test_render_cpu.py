"""CPU reference renderer vs committed reference-generated WAV data."""
import glob
import os

import numpy as np
import pytest

from saugns_tpu.lang.program import ScriptArg, build_program
from saugns_tpu.render.cpu import Generator

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden', 'wav')

CASES = {
    'wsin_96k': ('Wsin', False),
    'pm_tone_6k': ('/root/reference/devtests/pm_tone.sau', True),
    'compnest_6k': ('/root/reference/devtests/compnest.sau', True),
    'melody00_6k': ('/root/reference/devtests/melody00.sau', True),
    'voice_reuse_6k': ('/root/reference/devtests/voice-reuse.sau', True),
    'panning_6k': ('/root/reference/examples/tests/panning.sau', True),
}


def render_cpu(prg, srate):
    g = Generator(prg, srate)
    chunk = max(srate // 4, 1)
    buf = np.zeros(chunk * 2, np.int16)
    acc = []
    more = True
    while more:
        more, out_len = g.run(buf, chunk, True)
        if out_len:
            acc.append(buf[:out_len * 2].copy())
    return np.concatenate(acc) if acc else np.zeros(0, np.int16)


@pytest.mark.parametrize('name', sorted(CASES))
def test_cpu_matches_reference_wav(name):
    src, is_path = CASES[name]
    if is_path and not os.path.exists(src):
        pytest.skip('reference corpus not available')
    g = np.load(os.path.join(GOLDEN, name + '.npz'))
    ref = g['data']
    srate = int(g['rate'])
    prg = build_program(ScriptArg(str=src, is_path=is_path, no_time=True,
                                  predef=[]))
    out = render_cpu(prg, srate)
    assert len(out) == len(ref), (len(out), len(ref))
    err = out.astype(np.float64) - ref.astype(np.float64)
    p = (ref.astype(np.float64) ** 2).sum()
    if err.any():
        snr = 10 * np.log10(p / (err ** 2).sum())
        assert snr >= 90.0 and np.abs(err).max() <= 2, \
            (snr, np.abs(err).max())


def test_signal_end_trailing_wait():
    """A trailing wait alone does not extend output (matches the
    reference: 'Wsin t.1 |/.2' renders 0.1 s)."""
    prg = build_program(ScriptArg(str='Wsin t.1 |/.2', is_path=False,
                                  no_time=True, predef=[]))
    out = render_cpu(prg, 6000)
    assert len(out) == 2 * 600


def test_empty_program():
    prg = build_program(ScriptArg(str='Wsin t0', is_path=False,
                                  no_time=True, predef=[]))
    out = render_cpu(prg, 6000)
    assert len(out) == 0
