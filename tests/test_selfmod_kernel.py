"""The Pallas self-PM kernel (jdsp._wosc_selfmod_pallas) vs the XLA
lax.scan recurrence it replaces on TPU.

The kernel runs the reference's one true per-sample recurrence
(sau/generator/wosc.h:273-310) as an in-kernel scalar loop; on the
real chip it is bitwise identical to the scan (verified live,
tools/validate_selfmod_df64.py). The CPU suite exercises the same
kernel logic through Pallas interpret mode and asserts bitwise
equality against the fused-scan reference, including the edge cases:
short active length, reset, phase-hold (pd == 0), and the cross-tile
state carry.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saugns_tpu.render import engine  # noqa: F401  (enables x64,
# the production config the scan's int64 phase math assumes)
from saugns_tpu.render import jdsp
from saugns_tpu.dsp import wavetables as W


def _scan_ref(wave, ph, am, pp0, prev_s, fb_s, reset, length):
    """The fused df64 lax.scan path (kernel disabled)."""
    old = os.environ.get('SAUGNS_TPU_FUSED_OSC')
    os.environ['SAUGNS_TPU_FUSED_OSC'] = 'force'
    try:
        assert not jdsp.selfmod_kernel_available()  # CPU platform
        _, piluts = W.get_tables()
        return jax.jit(lambda p, a: jdsp.wosc_selfmod_scan(
            jnp.asarray(np.asarray(piluts[wave])), wave, p, a,
            jnp.asarray(pp0), jnp.asarray(np.float32(prev_s)),
            jnp.asarray(np.float32(fb_s)), jnp.asarray(reset),
            length))(jnp.asarray(ph), jnp.asarray(am))
    finally:
        if old is None:
            os.environ.pop('SAUGNS_TPU_FUSED_OSC', None)
        else:
            os.environ['SAUGNS_TPU_FUSED_OSC'] = old


def _kernel(wave, ph, am, pp0, prev_s, fb_s, reset, length):
    p0 = jnp.asarray(ph)[0] - np.uint32(W.SLEN)
    pp = jnp.where(jnp.asarray(reset), p0, jnp.asarray(pp0))
    h0, l0 = jdsp._Is_df64(wave, pp)
    return jdsp._wosc_selfmod_pallas(
        wave, jnp.asarray(ph), jnp.asarray(am), pp,
        np.float32(prev_s), np.float32(fb_s), h0, l0, length,
        interpret=True)


def _compare(wave, ph, am, pp0, prev_s, fb_s, reset, length):
    o_r, pp_r, ps_r, fb_r = _scan_ref(wave, ph, am, pp0, prev_s,
                                      fb_s, reset, length)
    o_k, pp_k, ps_k, fb_k = _kernel(wave, ph, am, pp0, prev_s,
                                    fb_s, reset, length)
    assert (np.asarray(o_r) == np.asarray(o_k)).all()
    assert np.asarray(pp_r) == np.asarray(pp_k)
    assert np.asarray(ps_r) == np.asarray(ps_k)
    assert np.asarray(fb_r) == np.asarray(fb_k)


@pytest.mark.parametrize('wave', [0, 3, 9])
def test_selfmod_kernel_bitwise_vs_scan(wave):
    rng = np.random.RandomState(11 + wave)
    B = 3072  # 3 tiles: exercises the cross-tile SMEM state carry
    inc = rng.randint(1 << 14, 1 << 24, B).astype(np.uint32)
    ph = np.cumsum(inc.astype(np.uint64)).astype(np.uint32)
    am = rng.rand(B).astype(np.float32) * 0.9
    pp0 = np.uint32(rng.randint(0, 1 << 32))
    _compare(wave, ph, am, pp0, 0.1, 0.05, False, B)


def test_selfmod_kernel_partial_length_and_reset():
    rng = np.random.RandomState(5)
    B = 2048
    inc = rng.randint(1 << 14, 1 << 24, B).astype(np.uint32)
    ph = np.cumsum(inc.astype(np.uint64)).astype(np.uint32)
    am = rng.rand(B).astype(np.float32)
    pp0 = np.uint32(123456789)
    _compare(0, ph, am, pp0, -0.3, 0.7, True, 1500)


def test_selfmod_kernel_phase_hold():
    # constant phase with zero amp: pd == 0 holds the previous sample
    B = 1024
    ph = np.full(B, 0x40000000, np.uint32)
    am = np.zeros(B, np.float32)
    _compare(0, ph, am, np.uint32(0x40000000), 0.25, 0.0, False, B)


def test_selfmod_kernel_unpadded_tail():
    # B not a multiple of the tile: the wrapper pads, the length gate
    # keeps the padded region inert, and the output is sliced back
    rng = np.random.RandomState(9)
    B = 1500
    inc = rng.randint(1 << 14, 1 << 24, B).astype(np.uint32)
    ph = np.cumsum(inc.astype(np.uint64)).astype(np.uint32)
    am = rng.rand(B).astype(np.float32)
    _compare(2, ph, am, np.uint32(7), 0.0, 0.0, False, B)


# -- RasG self-PM kernel (jdsp._rasg_selfmod_pallas) --------------------------

def _rasg_compare(func, line, oflags, B, length, seed=0,
                  level=0x7fffffff >> 9, alpha=0x9e3779b9):
    rng = np.random.RandomState(seed)
    ph = rng.rand(B).astype(np.float32)
    cy = rng.randint(0, 1 << 31, B).astype(np.uint32)
    am = (rng.rand(B).astype(np.float32) - 0.5)
    args = (jnp.asarray(ph), jnp.asarray(cy), jnp.asarray(am),
            np.float32(0.1), np.float32(0.2), jnp.int32(length))
    o_r, ps_r, fb_r = jdsp.rasg_selfmod_scan(
        func, line, level, alpha, oflags, *args)
    o_k, ps_k, fb_k = jdsp._rasg_selfmod_pallas(
        func, line, level, alpha, oflags, *args, interpret=True)
    assert (np.asarray(o_r) == np.asarray(o_k)).all()
    assert float(ps_r) == float(ps_k)
    assert float(fb_r) == float(fb_k)


@pytest.mark.parametrize('func', [0, 1, 2, 3, 4, 5])
def test_rasg_selfmod_kernel_funcs(func):
    # 3 tiles: exercises the cross-tile SMEM state carry
    _rasg_compare(func, 1, 0, 3072, 3072, seed=func)


@pytest.mark.parametrize('oflags', [1, 2, 4, 8, 15])
def test_rasg_selfmod_kernel_flags(oflags):
    _rasg_compare(0, 0, oflags, 2048, 2048, seed=20 + oflags)


def test_rasg_selfmod_kernel_partial_length():
    _rasg_compare(5, 3, 0, 2048, 1500, seed=42)


def test_rasg_selfmod_kernel_unpadded_tail():
    _rasg_compare(2, 11, 4, 1500, 1500, seed=7)
