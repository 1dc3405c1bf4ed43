"""Frontend golden tests: the -p program printout must be byte-identical
to the reference's output (committed under tests/golden/ir) for every
script in the reference corpus (examples/ + devtests/)."""
import glob
import io
import os

import pytest

from saugns_tpu.lang.program import ScriptArg, build_program

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'golden', 'ir')


def golden_cases():
    cases = []
    for path in sorted(glob.glob(os.path.join(GOLDEN_DIR, '*.txt'))):
        rel = os.path.basename(path)[:-4].replace('@@', '/')
        cases.append((rel, path))
    return cases


@pytest.mark.parametrize('rel,golden', golden_cases(),
                         ids=[c[0] for c in golden_cases()])
def test_ir_parity(rel, golden, reference_dir, monkeypatch):
    monkeypatch.chdir(reference_dir)
    with open(golden, 'r') as f:
        expect = f.read()
    prg = build_program(ScriptArg(str=rel, is_path=True, no_time=True,
                                  predef=[]))
    assert prg is not None
    out = io.StringIO()
    prg.print_info(out)
    assert out.getvalue() == expect


def test_string_eval():
    prg = build_program(ScriptArg(str='Wsin', is_path=False, no_time=True,
                                  predef=[]))
    assert prg is not None
    assert prg.name == '<string>'
    assert prg.duration_ms == 1000
    assert prg.vo_count == 1
    assert prg.op_count == 1


def test_predef_variables():
    prg = build_program(ScriptArg(str='Wsin f$freq', is_path=False,
                                  no_time=True, predef=[('freq', 220.0)]))
    assert prg is not None
    od = prg.events[0].op_data[0]
    assert od.freq.v0 == 220.0


def test_crash_scripts_handled(reference_dir):
    """Scripts under devtests/crashes segfault the reference; we must
    not crash."""
    for f in glob.glob(os.path.join(reference_dir,
                                    'devtests/crashes/*.sau')):
        build_program(ScriptArg(str=f, is_path=True, no_time=True,
                                predef=[]))


def test_numexpr():
    """Numerical expression semantics (README.SAU:492-551)."""
    cases = [
        ('2(3)', 6.0), ('(2)3', 6.0), ('(2)(3)', 6.0),
        ('2^3^2', 512.0), ('1+2*3', 7.0), ('(1+2)*3', 9.0),
        ('10%3', 1.0), ('met(1)', 1.618033988749895),
        ('abs(0 - 2)', 2.0), ('sqrt(4)', 2.0),
    ]
    for expr, want in cases:
        prg = build_program(ScriptArg(str='Wsin f(%s)' % expr,
                                      is_path=False, no_time=True,
                                      predef=[]))
        od = prg.events[0].op_data[0]
        assert abs(od.freq.v0 - want) < 1e-4, expr
