"""Native (-O3 -ffast-math) wave-table construction vs the NumPy
strict-rounding port (native/fastdsp.c wave_tables_build vs
dsp/wavetables._build_tables).

The two constructions implement the same algorithm (sau/wave.c
sau_global_init_Wave + fill_It); the native one reproduces the
reference BINARY's bits (gcc's vectorizer perturbs 6 tables by
~1 ulp), the NumPy one is the strict per-op rounding. Invariants:

- sin/sqr/tri/par/hsi/spa and their piluts are bit-identical between
  the two (no sqrt/exp/normalization in their fills -- nothing for
  fast-math to perturb);
- the perturbed tables (srs/ean/cat/eto/mto/saw families) agree to
  within a few ulp (<= 1e-6 absolute at amplitude ~1);
- both are finite and bounded.
"""
import numpy as np
import pytest

from saugns_tpu.dsp import wavetables as W
from saugns_tpu.native import get_lib

EXACT = [W.N_sin, W.N_sqr, W.N_tri, W.N_par, W.N_hsi, W.N_spa]


def _native_pair():
    lib = get_lib()
    if lib is None:
        pytest.skip('no C compiler for the native table builder')
    import ctypes
    luts = np.zeros((12, 2048), np.float32)
    piluts = np.zeros((12, 2048), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.wave_tables_build(luts.ctypes.data_as(f32p),
                          piluts.ctypes.data_as(f32p))
    return luts, piluts


def test_native_vs_numpy_tables():
    nl, npi = _native_pair()
    pl, ppi = W._build_tables()
    for w in EXACT:
        assert (nl[w] == pl[w]).all(), W.WAVE_NAMES[w]
        assert (npi[w] == ppi[w]).all(), W.WAVE_NAMES[w]
    assert np.abs(nl - pl).max() <= 1e-6
    assert np.abs(npi - ppi).max() <= 1e-6
    assert np.isfinite(nl).all() and np.isfinite(npi).all()
    assert np.abs(nl).max() <= 1.0 + 1e-6


def test_get_tables_prefers_native():
    lib = get_lib()
    if lib is None:
        pytest.skip('no C compiler for the native table builder')
    nl, npi = _native_pair()
    luts, piluts = W.get_tables()
    assert (np.asarray(luts) == nl).all()
    assert (np.asarray(piluts) == npi).all()
