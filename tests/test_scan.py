"""Scanner/lexer stress tests (the test-scan.c equivalent).

Mirrors the reference dev binary's two modes: token-level lexing of
whole scripts (test-scan.c:197) and a scanner unget/re-get stress loop
(scan_with_undo, test-scan.c:159)."""
import glob
import os

import pytest

from saugns_tpu.lang.lexer import (Lexer, TOK_INVALID, TOK_NONE,
                                   TOK_SPECIAL)
from saugns_tpu.lang.scanner import Scanner
from saugns_tpu.lang.symtab import Symtab

EXAMPLES = sorted(glob.glob('/root/reference/examples/*.sau'))


@pytest.mark.skipif(not EXAMPLES, reason='no reference examples')
@pytest.mark.parametrize('path', EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_lex_whole_script(path):
    lx = Lexer(Symtab())
    assert lx.open(path, is_path=True)
    n = 0
    specials = set()
    while True:
        tok = lx.get()
        assert tok.type != TOK_INVALID, \
            'invalid token %r in %s' % (tok.c, path)
        if tok.type == TOK_NONE:
            break
        if tok.type == TOK_SPECIAL:
            specials.add(tok.c)
        n += 1
        assert n < 200000, 'runaway lexing'
    lx.close()
    assert n > 0
    # SAU scripts are built from a known special-char vocabulary
    assert specials <= set("=/*+-^%;:,.{}[]()<>@$?!'\"|&~#\\"), specials


def test_scanner_unget_reget_stress():
    """Read k chars, unget them all, re-read; streams must agree
    (scan_with_undo)."""
    st = Symtab()
    sc = Scanner(st)
    assert sc.open('/root/reference/examples/misc1-4fm_pm.sau',
                   is_path=True)
    first = []
    while True:
        c = sc.getc()
        if c == '\0' and sc.file_at_eof():
            break
        first.append(c)
        if len(first) > 100000:
            break
    sc.close()

    sc = Scanner(st)
    assert sc.open('/root/reference/examples/misc1-4fm_pm.sau',
                   is_path=True)
    second = []
    k = 0
    hit_eof = False
    while not hit_eof:
        # read a run of up to 7 chars, unget it, then re-take it
        # (the EOF pseudo-get also occupies an unget slot, as in the
        # reference's frame ring, so stop the exercise at EOF)
        run = []
        for _ in range(1 + (k % 7)):
            c = sc.getc()
            if c == '\0' and sc.file_at_eof():
                hit_eof = True
                break
            run.append(c)
        if hit_eof:
            second.extend(run)
            break
        for _ in run:
            sc.ungetc()
        for expect in run:
            got = sc.getc()
            assert got == expect
            second.append(got)
        if not run:
            break
        k += 1
    sc.close()
    assert second == first
