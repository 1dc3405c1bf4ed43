"""Diagnostic byte-parity: stderr text, warning positions, and exit
codes must match the reference binary exactly.

Golden expectations below were captured from the reference saugns
v0.4.7 (devtests/warning corpus, sau/scanner.c:904-1000 positioned
warnings, sau/help.c:73-90 name-list wrapping, sau/parser.c:1843-1888
unset-variable notices).  The test drives our CLI only -- the goldens
are literal reference output, so a pass means byte-parity.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WARNDIR = '/root/reference/devtests/warning'


def run_cli(args, extra_env=None):
    # keep subprocess invocations off the shared TPU: these tests
    # exercise diagnostics, not the engine
    env = dict(os.environ, PYTHONPATH=REPO,
               SAUGNS_TPU_BACKEND='cpu', JAX_PLATFORMS='cpu')
    if extra_env:
        env.update(extra_env)
    r = subprocess.run([sys.executable, '-m', 'saugns_tpu.cli'] + args,
                       capture_output=True, env=env, timeout=120,
                       cwd=REPO)
    return r.returncode, r.stdout.decode(), r.stderr.decode()


# (script basename, expected stderr with {p} = full path)
WARN_GOLDENS = [
    ('invalid_line_type.sau',
     "{p}:1:16: warning: sweep parameter 'r' is deprecated, "
     "use new name 'l'\n"
     "{p}:1:17: warning: invalid line shape name 'invalid'; "
     "available are:\n"
     "\tcos, lin, sah, exp, log, xpe, lge, sqe, cub, smo, ncl, nhl,\n"
     "\tuwh\n"),
    ('invalid_math_type.sau',
     "{p}:1:7: warning: invalid math symbol name 'invalid'; "
     "available are:\n"
     "\tabs, arbf, arhf, cos, exp, log, met, mf, pi, rand, rint,\n"
     "\tsgn, sin, sqrt, time\n"
     "{p}:1:14: warning: misplaced or unrecognized '('\n"
     "{p}:1:15: warning: misplaced or unrecognized '4'\n"
     "{p}:1:16: warning: misplaced or unrecognized '4'\n"
     "{p}:1:17: warning: misplaced or unrecognized '0'\n"
     "{p}:1:18: warning: misplaced or unrecognized ')'\n"),
    ('invalid_wave_type.sau',
     "{p}:1:1: warning: type 'O' is deprecated, use new name 'W'\n"
     "{p}:1:2: warning: invalid wave type name 'invalid'; "
     "available are:\n"
     "\tsin, tri, srs, sqr, ean, cat, eto, par, mto, saw, hsi, spa\n"),
    ('label_too_long.sau',
     "{p}:1:1: warning: limiting identifier to 255 characters\n"
     "{p}: warning: ignoring variable assignment without object\n"),
    ('label_without_operator.sau',
     "{p}:1:11: warning: ignoring variable assignment without object\n"),
]


@pytest.mark.parametrize('name,expect', WARN_GOLDENS,
                         ids=[g[0] for g in WARN_GOLDENS])
def test_warning_corpus_stderr(name, expect):
    path = os.path.join(WARNDIR, name)
    rc, out, err = run_cli(['-cd', path])
    assert err == expect.format(p=path)
    assert rc == 0


def test_unset_required_variable_notice_and_exit():
    rc, out, err = run_cli(['-cd', '-e', '$?missing Wsin'])
    assert err == (
        "<string>:1:3: usage: variable '$missing' in script wasn't set;\n"
        "\ttry passing it to the script as an option, \"missing=...\"\n"
        "<string>: failed requirement, script will be skipped\n")
    # reference builds an empty '(null)' program and exits 0
    assert rc == 0


def test_unset_variable_notice_position_no_trailing_ws():
    # no whitespace after the name: the reference's live scan frame
    # stays at the name's END column (no skipws unget rolls it back,
    # sau/scanner.c:895-903 + parser.c:1870-1877); measured col 22
    rc, out, err = run_cli(['-cd', '-e', 'Wsin f[$?undefined_var]'])
    assert err == (
        "<string>:1:22: usage: variable '$undefined_var' in script "
        "wasn't set;\n"
        "\ttry passing it to the script as an option, "
        "\"undefined_var=...\"\n"
        "<string>: failed requirement, script will be skipped\n")
    assert rc == 0


def test_variable_reference_does_nothing_position():
    # whitespace after the name: skipws consumes the run then ungets,
    # restoring the undo-ring frame = the name's column; measured 1:2
    rc, out, err = run_cli(['-cd', '-e', '$x 5'])
    assert err.startswith(
        "<string>:1:2: warning: variable '$x' reference does nothing\n")
    assert rc == 0


def test_unset_variable_fallback_notice():
    rc, out, err = run_cli(['-cd', '-e', '$?x=5 Wsin f$x'])
    assert err == (
        "<string>:1:5: usage: variable '$x' in script wasn't set;\n"
        "\tusing the fallback value of 5.000000; to set,\n"
        "\tpass it to the script as an option, \"x=...\"\n")
    assert rc == 0


# -h <topic> byte parity (sau/help.c:73-90 printing the bare name
# arrays from sau/math.h:197-217 etc.; captured from the v0.4.7
# binary).  The list follows the 4-line usage block; only the binary
# name in the usage block legitimately differs.
HELP_GOLDENS = [
    ('help',
     "List of 'help' names (pass '-h' without topic for general "
     "usage):\n\thelp, math, variable, line, wave, noise\n"),
    ('math',
     "List of 'math' names (pass '-h' without topic for general "
     "usage):\n\tabs, arbf, arhf, cos, exp, log, met, mf, pi, rand, "
     "rint,\n\tsgn, sin, sqrt, time\n"),
    ('variable',
     "List of 'variable' names (pass '-h' without topic for general "
     "usage):\n\tseed\n"),
    ('line',
     "List of 'line' names (pass '-h' without topic for general "
     "usage):\n\tcos, lin, sah, exp, log, xpe, lge, sqe, cub, smo, "
     "ncl, nhl,\n\tuwh\n"),
    ('wave',
     "List of 'wave' names (pass '-h' without topic for general "
     "usage):\n\tsin, tri, srs, sqr, ean, cat, eto, par, mto, saw, "
     "hsi, spa\n"),
    ('noise',
     "List of 'noise' names (pass '-h' without topic for general "
     "usage):\n\twh, gw, bw, tw, re, vi, bv\n"),
]


@pytest.mark.parametrize('topic,expect', HELP_GOLDENS,
                         ids=[g[0] for g in HELP_GOLDENS])
def test_help_topic_byte_parity(topic, expect):
    rc, out, err = run_cli(['-h', topic])
    # help goes to stdout when it is the requested action
    body = out.split('\n\n', 1)[1]
    assert body == expect
    usage = out.split('\n\n', 1)[0].replace('saugns-tpu', 'saugns')
    assert usage == (
        'Usage: saugns [-a | -m] [-r <srate>] [--mono] [-o <file>] '
        '[--stdout]\n'
        '              [-d] [-p] [variable=value] [-e] <script>...\n'
        '       saugns -c [-d] [-p] [variable=value] [-e] <script>...')
    assert rc == 0


def test_help_unknown_topic_prints_topic_list():
    # an unrecognized topic falls back to the 'help' topic list
    # (saugns.c:59-71) and still exits 0
    rc, out, err = run_cli(['-h', 'bogus'])
    assert "List of 'help' names" in out + err
    assert rc == 0


def test_missing_file_builds_null_program():
    rc, out, err = run_cli(['-cdp', '/nonexistent_saugns_script.sau'])
    assert err == ('error: couldn\'t open script file '
                   '"/nonexistent_saugns_script.sau" for reading\n')
    assert out == ('Program: "(null)"\n'
                   '\tDuration: \t0 ms\n'
                   '\tEvents:   \t0\n'
                   '\tVoices:   \t0\n'
                   '\tOperators:\t0\n')
    assert rc == 0
