"""Mod-4 interleaved tap-table algebra (jdsp._window_taps4_body).

The TPU kernel gathers the 4 Hermite taps (pilut entries m..m+3,
m = cell-1 mod 2048) from 4 class-interleaved tables with one lane
gather per (class, window). The CPU suite cannot run the Pallas
kernel, but the index/permute algebra is platform-free -- this pins
it, for every cell, against direct table indexing:

  class of tap t:   j = (r + t) mod 4,  r = m mod 4
  quotient:         q_j = (base + (j < r)) mod 512,  base = m >> 2
  tap t:            T_j[q_j] with j = (r + t) mod 4

(The on-chip bit-exactness of the kernel itself is gated by
bench.py's _self_check and tools/validate_fused_fill.py.)
"""
import numpy as np

from saugns_tpu.render import jdsp
from saugns_tpu.dsp import wavetables as W


def test_tabs4_layout():
    """tabs4[w, j*4+h, l] == pilut[w, 4*(128*h + l) + j]."""
    _, piluts = W.get_tables()
    pil = np.asarray(piluts, np.float32)
    t4 = jdsp._build_window_tabs4()
    assert t4.shape == (12, 16, 128)
    l = np.arange(128)
    for w in range(12):
        for j in range(4):
            for h in range(4):
                expect = pil[w, 4 * (128 * h + l) + j]
                assert (t4[w, j * 4 + h] == expect).all(), (w, j, h)


def test_mod4_index_algebra_all_cells():
    """For every cell, the mod-4 decomposition selects exactly the
    4 consecutive (wrapped) pilut entries cell-1 .. cell+2."""
    _, piluts = W.get_tables()
    pil = np.asarray(piluts, np.float32)[0]
    t4 = jdsp._build_window_tabs4()[0]
    # class tables as flat 512-entry rows: T_j[k] = pilut[4k + j]
    T = np.stack([t4[j * 4:(j + 1) * 4].reshape(512)
                  for j in range(4)])
    cell = np.arange(2048)
    m = (cell + 2047) & 2047
    r = m & 3
    base = m >> 2
    taps_ref = np.stack([pil[(cell + t - 1) & 2047]
                         for t in range(4)])
    for t in range(4):
        j = (r + t) & 3
        q = (base + (j < r)) & 511
        got = T[j, q]
        assert (got == taps_ref[t]).all(), t
