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
    # A failed script = NULL-name program in the reference
    # (sau/parser.c:2104-2113).  Two real failure modes: an unmet
    # '$?var' hard requirement (sau/parser.c:1870-1877) and a missing
    # file.  (Note 'W' alone is NOT an error: the reference builds a
    # default-parameter program for it -- verified against the binary.)
    with pytest.raises(st.SAUError):
        st.compile_script('$?freq\nWsin f$freq t0.05')
    err = capfd.readouterr().err
    assert 'failed requirement' in err
    with pytest.raises(st.SAUError):
        st.compile_script(path='/nonexistent/nope.sau')
    capfd.readouterr()
    # and a parse-warning script still compiles, like the binary
    prg = st.compile_script('W')
    assert prg.name is not None


def test_failed_script_cli_rc0_but_api_raises(capfd, tmp_path):
    # Pin BOTH contracts at once.  The reference binary's
    # sau_build_Program returns a non-NULL empty program on parse
    # failure (name stays NULL, sau/parser.c:2104-2113), so both in
    # play mode and in -c check mode the binary exits 0 on a failed
    # script (saugns.c:680-691; verified against the binary with an
    # unmet $? requirement AND with a missing file).  The CLI must
    # match that.  The library API, by contrast, raises.
    from saugns_tpu.cli import main as cli_main
    bad = '$?freq\nWsin f$freq t0.05'  # unmet hard requirement
    rc = cli_main(['-m', '-e', bad])
    assert rc == 0
    capfd.readouterr()
    rc = cli_main(['-c', '-e', bad])
    assert rc == 0
    capfd.readouterr()
    rc = cli_main(['-c', '/nonexistent/nope.sau'])
    assert rc == 0
    capfd.readouterr()
    with pytest.raises(st.SAUError):
        st.compile_script(bad)
    capfd.readouterr()


def test_arg_validation():
    with pytest.raises(TypeError):
        st.render()
    with pytest.raises(TypeError):
        st.render(WSIN, path='x.sau')
    with pytest.raises(ValueError):
        st.render(WSIN, backend='cuda')


def test_predef_matches_cli_D():
    # external value variable with $?x hard requirement as a statement
    # (sau/parser.c:1870-1877; '$?' inline in a value position is NOT
    # valid SAU -- the reference warns and ignores it there)
    src = '$?freq\nWsin f$freq t0.05'
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


def test_diag_surfaces_sequential_fallback(capsys):
    """SAUGNS_TPU_DIAG=1 reports epochs that fall back to the
    sequential scan (the one remaining corpus shape: ratio-flip
    conversion w/ mul, pm_smoothchange.sau)."""
    import os
    import pytest
    src = '/root/reference/examples/tests/pm_smoothchange.sau'
    if not os.path.exists(src):
        pytest.skip('reference corpus not available')
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.engine import JaxGenerator
    prg = build_program(ScriptArg(str=src, is_path=True,
                                  no_time=True, predef=[]))
    os.environ['SAUGNS_TPU_DIAG'] = '1'
    try:
        JaxGenerator(prg, 6000)
    finally:
        del os.environ['SAUGNS_TPU_DIAG']
    err = capsys.readouterr().err
    assert 'falls back to the sequential scan' in err
    assert 'ratio-flip' in err


def test_cli_muted_deferred_renders(capsys):
    """`-m` with no sinks takes the deferred device-render path (one
    sync in finish(), the script_list bench's deployment shape) and
    exits 0 for a good script; a multi-script list also completes."""
    from saugns_tpu.cli import main as cli_main
    rc = cli_main(['-m', '-d', '-e', 'Wsin t.05', 'Wtri t.05 f100'])
    assert rc == 0
