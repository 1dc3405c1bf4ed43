"""Public library API (`saugns_tpu.api`): compile/render/write_wav.

The API is a thin veneer over the same two-stage pipeline the CLI
drives (build_program -> generator pull loop, saugns.c:575-623), so
these tests pin byte-identity against the CLI path rather than
golden files.
"""
import io
import os
import sys
import tempfile

import numpy as np
import pytest

import saugns_tpu as st

WSIN = 'Wsin f440 p0 t0.05'


def test_render_string_matches_cli_backends():
    # library render == CLI render, and both backends agree
    # byte-for-byte on the CPU platform (the engine fidelity contract)
    a_jax = st.render(WSIN, srate=6000, backend='jax')
    a_cpu = st.render(WSIN, srate=6000, backend='cpu')
    assert a_jax.dtype == np.int16 and a_jax.shape[1] == 2
    assert a_jax.shape[0] == 300  # 0.05 s at 6 kHz
    np.testing.assert_array_equal(a_jax, a_cpu)
    assert np.abs(a_jax.astype(np.int32)).max() > 1000  # not silence


def test_render_mono():
    a = st.render(WSIN, srate=6000, stereo=False, backend='cpu')
    assert a.shape == (300, 1)
    s = st.render(WSIN, srate=6000, stereo=True, backend='cpu')
    # mono is the downmix the reference player/file writer produces
    assert a[:, 0].tolist() != [0] * 300
    assert s.shape == (300, 2)


def test_compile_script_reusable_program():
    prg = st.compile_script(WSIN)
    assert isinstance(prg, st.Program)
    a1 = st.render(program=prg, srate=6000, backend='cpu')
    a2 = st.render(program=prg, srate=6000, backend='cpu')
    np.testing.assert_array_equal(a1, a2)


def test_compile_error_raises(capfd):
    with pytest.raises(st.SAUError):
        st.compile_script('W')  # wave type missing -> parse error
    err = capfd.readouterr().err
    assert 'error' in err or 'warning' in err


def test_arg_validation():
    with pytest.raises(TypeError):
        st.render()
    with pytest.raises(TypeError):
        st.render(WSIN, path='x.sau')
    with pytest.raises(ValueError):
        st.render(WSIN, backend='cuda')


def test_predef_matches_cli_D():
    # external value variable ($?x hard requirement, sau/parser.c)
    src = 'Wsin f$?freq t0.05'
    a = st.render(src, srate=6000, backend='cpu',
                  predef=[('freq', 440.0)])
    b = st.render(WSIN, srate=6000, backend='cpu')
    np.testing.assert_array_equal(a, b)
    with pytest.raises(st.SAUError):
        st.render(src, srate=6000, backend='cpu')


def test_write_wav_byte_identical_to_cli(tmp_path):
    api_path = tmp_path / 'api.wav'
    cli_path = tmp_path / 'cli.wav'
    n = st.write_wav(str(api_path), WSIN, srate=6000, backend='cpu')
    assert n == 300
    from saugns_tpu.cli import main as cli_main
    rc = cli_main(['-e', WSIN, '-r', '6000', '-o', str(cli_path)])
    assert rc == 0
    assert api_path.read_bytes() == cli_path.read_bytes()


def test_render_path(tmp_path):
    p = tmp_path / 't.sau'
    p.write_text(WSIN + '\n')
    a = st.render(path=str(p), srate=6000, backend='cpu')
    b = st.render(WSIN, srate=6000, backend='cpu')
    np.testing.assert_array_equal(a, b)
