"""Program IR serialization round-trips (SURVEY §5 checkpoint note):
a deserialized program's -p dump and rendered audio byte-match the
original's."""
import io
import os

import numpy as np
import pytest

from .conftest import REFERENCE, has_reference

SCRIPTS = [
    'Wsin p[Wtri f3] t2',
    'Rncl t2 f20 p[Wspa f30 a2] /1 lnhl',
    "Wsin t1 f440 a[g0 t1]; a1[g0]",
    'Ntw t1 a.4 | Wsqr t1 f110',
]


def _dump(prg):
    buf = io.StringIO()
    prg.print_info(out=buf)
    return buf.getvalue()


def _render(prg):
    from saugns_tpu.render.cpu import Generator
    g = Generator(prg, 6000)
    out = []
    buf = np.zeros(2048 * 2, dtype=np.int16)
    while True:
        more, n = g.run(buf, 2048, True)
        out.append(buf[:n * 2].copy())
        if not more:
            return np.concatenate(out) if out else np.zeros(0, np.int16)


@pytest.mark.parametrize('script', SCRIPTS)
def test_roundtrip(tmp_path, script):
    from saugns_tpu.lang.program import build_program, ScriptArg
    from saugns_tpu.lang.serialize import save_program, load_program
    prg = build_program(ScriptArg(str=script, is_path=False, no_time=True))
    assert prg is not None
    p = tmp_path / 'prg.sauir'
    save_program(prg, str(p))
    prg2 = load_program(str(p))
    assert _dump(prg2) == _dump(prg)
    a = _render(prg)
    b = _render(prg2)
    assert np.array_equal(a, b)


def test_roundtrip_corpus_script(tmp_path):
    if not has_reference():
        pytest.skip('no reference corpus')
    from saugns_tpu.lang.program import build_program, ScriptArg
    from saugns_tpu.lang.serialize import save_program, load_program
    path = os.path.join(REFERENCE, 'examples/misc1-4fm_pm.sau')
    prg = build_program(ScriptArg(str=path, is_path=True, no_time=True))
    p = tmp_path / 'prg.sauir'
    save_program(prg, str(p))
    prg2 = load_program(str(p))
    assert _dump(prg2) == _dump(prg)
