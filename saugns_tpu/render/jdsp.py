"""JAX DSP kernels for the TPU engine.

jnp ports of the per-sample DSP primitives with strict float32 /
integer-width discipline. The wave oscillator uses a cancellation-free
reformulation of the reference's PILUT differentiation
(sau/generator/wosc.h:238-266): instead of computing
``(Is(p2) - Is(p1)) * (scale/pd)`` with float64 Hermite evaluations and
catastrophic cancellation at small ``pd``, the difference of the
piecewise-cubic interpolant is evaluated analytically:

    Is(p2)-Is(p1) = [P2(x2)-P2(0)] + (lut[i2]-lut[i1+1]) + [P1(1)-P1(x1)]

where each bracket is an exactly-factored polynomial difference
(P(1)-P(x) = (1-x)(c3(1+x+x^2)+c2(1+x)+c1), P(x)-P(0) = x((c3 x+c2)x+c1)),
using the Hermite identities P(0)=lut[i], P(1)=lut[i+1]. This keeps full
float32 accuracy for any phase step, including the +/-1 steps where the
reference needs float64.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..dsp import prim
from ..dsp import wavetables as W
from ..dsp.lines import PERLIN_AMP
from ..lang import program as P

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32
u64 = jnp.uint64

FIBH32 = np.uint32(0x9e3779b9)
HUMMID_INV = np.float32(1.0 / prim.HUMMID)
SCALE31 = np.float32(2.0 ** -31)
SCALE32 = np.float32(2.0 ** -32)
P31 = np.float32(2.0 ** 31)
P32F = np.float32(2.0 ** 32)


# True while tracing the body of a Pallas scalar-loop kernel: the
# scalar core has a real 32-bit integer multiplier (the float-limb
# trick below exists for the VPU, where variable x variable int mul
# is ~60x slower than float mul), and Mosaic cannot lower the trick's
# u32->f32 casts in scalar context anyway. Both forms are exact
# mod 2^32, so the results are bit-identical.
_SCALAR_KERNEL_CTX = False


def umul32(a, b):
    """Exact u32 * u32 (mod 2^32) via three 11-bit limbs multiplied in
    float32 -- variable x variable 32-bit integer multiply is ~60x
    slower than float multiply on the TPU VPU."""
    if _SCALAR_KERNEL_CTX:
        return a * b
    m11 = np.uint32(0x7ff)
    a0 = (a & m11).astype(f32)
    a1 = ((a >> np.uint32(11)) & m11).astype(f32)
    a2 = (a >> np.uint32(22)).astype(f32)
    b0 = (b & m11).astype(f32)
    b1 = ((b >> np.uint32(11)) & m11).astype(f32)
    b2 = (b >> np.uint32(22)).astype(f32)
    p00 = (a0 * b0).astype(u32)
    p01 = (a0 * b1).astype(u32) + (a1 * b0).astype(u32)
    p02 = (a0 * b2).astype(u32) + (a1 * b1).astype(u32) \
        + (a2 * b0).astype(u32)
    return p00 + (p01 << np.uint32(11)) + (p02 << np.uint32(22))


def ranfast32(n):
    """sau_ranfast32 (sau/math.h:297-303); uint32 in/out."""
    s = n.astype(u32) * FIBH32
    s = s ^ (s >> np.uint32(14))
    s = umul32(s | np.uint32(1), s)
    s = s ^ (s >> np.uint32(13))
    return s


def mcg32(x):
    return x.astype(u32) * np.uint32(0xe47135)


def sar32(x, s):
    """Arithmetic right shift of u32-encoded i32 by dynamic amount."""
    return (x.view(i32) >> s.astype(i32)).view(u32) \
        if hasattr(x, 'view') else x


def asi32(x_u32):
    # scalar-kernel context: Mosaic rejects the no-op scalar
    # tpu.bitcast; a same-width astype wraps mod 2^32 (two's
    # complement reinterpret), which is exactly the bitcast's values
    if _SCALAR_KERNEL_CTX:
        return x_u32.astype(i32)
    return jax.lax.bitcast_convert_type(x_u32, i32)


def asu32(x_i32):
    if _SCALAR_KERNEL_CTX:
        return x_i32.astype(u32)
    return jax.lax.bitcast_convert_type(x_i32, u32)


def ftoi(x_f32):
    """llrintf: float32 -> int64 round-half-even (wrap-around use)."""
    return jnp.rint(x_f32).astype(jnp.int64)


def sinpi_d5(x):
    """Degree-5 sin(pi x) approximation (sau/math.h:366-379)."""
    s0 = np.float32(+3.14042741234069229463)
    s1 = np.float32(-5.13655757476162831091)
    s2 = np.float32(+2.29939170159543653372)
    x2 = x * x
    return x * (s0 + x2 * (s1 + x2 * s2))


def franssgauss32(n):
    """Soft-saturated Gaussian hash noise (noise.h:61-98)."""
    s0 = ranfast32(n)
    s1 = mcg32(s0)
    a = asi32(s0).astype(f32) * SCALE32
    b = asi32(s1).astype(f32) * SCALE32
    c0 = np.float32(-0.80270565422983103084)
    c1 = np.float32(+5.52274428214641442648)
    c2 = np.float32(-138.87126103150588693697)
    x2 = a * a
    # barrier: identity for values/rounding, but required inside the
    # Pallas scalar kernels -- squaring this hash-derived value gets
    # miscompiled to 0.0 there without it (observed on jax 0.9
    # interpret mode; the barrier blocks the faulty rewrite)
    x2 = jax.lax.optimization_barrier(x2)
    x4 = x2 * x2
    c = np.float32(0.5) + a * (c0 + x4 * (c1 + x4 * c2))
    cx2 = c * c
    gx = (c + cx2) * np.float32(0.5)
    c = c * (np.float32(1.0) - gx * (np.float32(1.0) - cx2))
    return c * sinpi_d5(b)


def foldhd32(s):
    """Wavefold (sau/math.h:112-118); u32 in/out."""
    cond = (s + np.uint32(1 << 29)) > np.uint32(1 << 31)
    folded = np.uint32(((1 << 31) + (1 << 30)) & 0xffffffff) - s
    s = jnp.where(cond, folded, s)
    return (s - np.uint32(1 << 29)) * np.uint32(2)


def _mxu_cumsum_limbs(x, nbits, n_limbs, dtype):
    """Exact integer prefix sum on the MXU via limb decomposition.

    Split each element into 8-bit limbs (exact in bf16, so the MXU's
    default-precision f32 matmul is exact: products <= 255, f32
    accumulation <= 128*255 < 2^24). Intra-row inclusive scans are
    ``limbs @ triu(ones(128,128))``; row offsets re-split the row
    totals and use ``tril(ones(R,R), -1) @ limbs``. Recombining with
    wrapping shifts is exact mod 2^32/2^64. Replaces
    lax.associative_scan, which lowers to ~5*log2(B) slice/pad/add
    kernels per call -- their fixed launch costs dominated the render
    loop (measured ~75 kernels and ~300 us per scan on v5e)."""
    B = x.shape[0]
    R = B // 128
    xm = x.reshape(R, 128)
    mask = dtype(255)

    def split(v):
        return [((v >> dtype(8 * i)) & mask).astype(f32)
                for i in range(n_limbs)]

    def combine(parts):
        acc = parts[0].astype(x.dtype)
        for i in range(1, n_limbs):
            acc = acc + (parts[i].astype(x.dtype) << dtype(8 * i))
        return acc

    # optimization_barrier: XLA's algebraic simplifier rewrites
    # dot-with-triangular-ones back into a (slow) reduce-window scan
    U = jax.lax.optimization_barrier(
        jnp.triu(jnp.ones((128, 128), f32)))
    intra = combine([jnp.dot(l, U) for l in split(xm)])
    rt = intra[:, 127]
    if R > 1024:
        # large inputs (the flat renderer scans whole multi-megasample
        # chunks): an explicit (R, R) triangular matrix would be
        # R^2 floats of HBM -- recurse on the row totals instead
        # (inclusive - self = exclusive; exact mod 2^nbits)
        incl = _mxu_cumsum_limbs(rt, nbits, n_limbs, dtype) \
            if R % 1024 == 0 else jax.lax.associative_scan(jnp.add, rt)
        offs = incl - rt
    else:
        Lm = jax.lax.optimization_barrier(
            jnp.tril(jnp.ones((R, R), f32), -1))
        offs = combine([jnp.dot(Lm, l) for l in split(rt)])
    return (intra + offs[:, None]).reshape(B)


def prefix_sum(x):
    """Inclusive prefix sum. On TPU, integer scans run as exact
    limb-decomposed MXU matmuls (see _mxu_cumsum_limbs); elsewhere (or
    for odd sizes) a log-depth associative scan. jnp.cumsum lowers to
    a reduce-window that blows scoped VMEM for wide integer windows."""
    import os
    if os.environ.get('SAUGNS_TPU_MXU_SCAN', '1') == '1' and \
            _on_tpu() and x.ndim == 1 and x.shape[0] % 1024 == 0:
        if x.dtype == u32:
            return _mxu_cumsum_limbs(x, 32, 4, np.uint32)
        if x.dtype == jnp.uint64:
            return _mxu_cumsum_limbs(x, 64, 8, np.uint64)
    return jax.lax.associative_scan(jnp.add, x)


def prefix_sum_rows(x):
    """Row-wise inclusive integer prefix sum for (n, B); exact. One
    batched MXU limb scan on TPU (intra-row matmuls over all n*R tile
    rows at once, per-row offsets via one (n,R)@(R,R) matmul) --
    batching same-level phasor scans this way collapses n scans' worth
    of kernel launches into ~4."""
    import os
    n, B = x.shape
    if os.environ.get('SAUGNS_TPU_MXU_SCAN', '1') == '1' and \
            _on_tpu() and B % 1024 == 0 and \
            x.dtype in (u32, jnp.uint64):
        n_limbs = 4 if x.dtype == u32 else 8
        dtype = np.uint32 if x.dtype == u32 else np.uint64
        R = B // 128
        xm = x.reshape(n * R, 128)
        mask = dtype(255)

        def split(v):
            return [((v >> dtype(8 * i)) & mask).astype(f32)
                    for i in range(n_limbs)]

        def combine(parts):
            acc = parts[0].astype(x.dtype)
            for i in range(1, n_limbs):
                acc = acc + (parts[i].astype(x.dtype) << dtype(8 * i))
            return acc

        U = jax.lax.optimization_barrier(
            jnp.triu(jnp.ones((128, 128), f32)))
        intra = combine([jnp.dot(l, U) for l in split(xm)])
        rt = intra[:, 127].reshape(n, R)
        Us = jax.lax.optimization_barrier(
            jnp.triu(jnp.ones((R, R), f32), 1))  # [r',r]=1 if r' < r
        offs = combine([jnp.dot(l, Us) for l in split(rt)])
        return (intra.reshape(n, R, 128)
                + offs[:, :, None]).reshape(n, B)
    return jax.lax.associative_scan(jnp.add, x, axis=1)


def select_by(index, branches):
    """Branchless k-way select: computes every branch and picks one.
    Much cheaper to compile (and usually to run) on TPU than
    lax.switch inside a scan body; the branches fuse into one VPU
    kernel. A static (python int) index picks one branch at trace
    time."""
    if isinstance(index, int):
        return branches[index]
    out = branches[0]
    for k in range(1, len(branches)):
        out = jnp.where(index == k, branches[k], out)
    return out


def select_lazy(index, fns, *args):
    """Like select_by but with branch thunks: a static index traces
    only the selected branch."""
    if isinstance(index, int):
        return fns[index](*args)
    return select_by(index, [f(*args) for f in fns])


# -- line shapes -------------------------------------------------------------

def sinramp(x):
    s0 = np.float32(1.5702137061703461473139223358864)
    s1 = np.float32(-2.568278787380814155456160152724)
    s2 = np.float32(1.1496958507977182668618673644367)
    x2 = x * x
    return x * (s0 + x2 * (s1 + x2 * s2))


def expramp6(x):
    """expramp6 with the reference *build's* rounding order: gcc -O3
    -ffast-math reassociates sau/line.h:195-200 into
    t3 + t2*((t3 - 1)*(t2*B + t*A)) (decoded from the compiled
    sauLine_fill_xpe loop; line values feed phasor integrators, so the
    rounding must match the binary, not the source)."""
    A = np.float32(629.0 / 1792.0)
    B = np.float32(1163.0 / 1792.0)
    x2 = x * x
    xA = x * A
    x3 = x2 * x
    p = x2 * B + xA
    return x3 + x2 * ((x3 + np.float32(-1.0)) * p)


def _seed_bits(x):
    return jax.lax.bitcast_convert_type(x.astype(f32), u32)


def line_val(line_type, x, a, b):
    """Vectorized sauLine_val_* dispatch (sau/line.h:152-266).
    x, a, b broadcastable float32."""
    one = np.float32(1.0)
    half = np.float32(0.5)

    def v_cos(x, a, b):
        return a + (b - a) * (sinramp(x - half) + half)

    def v_lin(x, a, b):
        return a + (b - a) * x

    def v_sah(x, a, b):
        return jnp.broadcast_to(a, x.shape).astype(f32)

    def v_exp(x, a, b):
        return jnp.where(a > b,
                         b + (a - b) * expramp6(one - x),
                         a + (b - a) * expramp6(x))

    def v_log(x, a, b):
        return jnp.where(a < b,
                         b + (a - b) * expramp6(one - x),
                         a + (b - a) * expramp6(x))

    def v_xpe(x, a, b):
        return b + (a - b) * expramp6(one - x)

    def v_lge(x, a, b):
        return a + (b - a) * expramp6(x)

    def v_sqe(x, a, b):
        x1 = one - x
        return b + (a - b) * (x1 * x1)

    def v_cub(x, a, b):
        # reference-build grouping: b + (x1^3 + 1)*((a-b)*0.5)
        x1 = half - x
        x1 = x1 + x1
        k = (a - b) * half
        return b + ((x1 * x1) * x1 + one) * k

    def v_smo(x, a, b):
        # reference-build grouping: a + ((d*x)*(x*x))*((6x-15)x+10)
        d = b - a
        x3d = (d * x) * (x * x)
        return a + x3d * ((x * np.float32(6.0) + np.float32(-15.0)) * x
                          + np.float32(10.0))

    def v_uwh(x, a, b):
        s = asi32(ranfast32(_seed_bits(x))).astype(f32)
        return a + (b - a) * (half + np.float32(0.5 * 2.0 ** -31) * s)

    def v_ncl(x, a, b):
        q = (x + x + np.float32(-3.0)) * x + one
        s = asi32(ranfast32(_seed_bits(x))).astype(f32)
        return a + ((x + (s * q) * (x * np.float32(0.5 * 2.0 ** -31)))
                    * (b - a))

    def v_nhl(x, a, b):
        q = one - x
        s = asi32(ranfast32(_seed_bits(x))).astype(f32)
        return a + ((x + (q * s) * (x * SCALE31)) * (b - a))

    fns = [v_cos, v_lin, v_sah, v_exp, v_log, v_xpe, v_lge, v_sqe,
           v_cub, v_smo, v_ncl, v_nhl, v_uwh]
    return select_lazy(line_type, fns, x, a, b)


def line_fill(line_type, i_pos, end, v0, vt):
    """Vectorized sauLine_fill_* dispatch (sau/line.c). ``i_pos``:
    uint32 absolute positions (pos + i); ``end``: total samples (i32
    scalar); returns float32 values (no mulbuf)."""
    inv_time = np.float32(1.0) / end.astype(f32)
    # midpoint forms (lin/cos/sqe/cub/ncl/nhl): x = (i - end/2)/end
    adj = (i_pos.astype(u32) - (end.astype(u32) // np.uint32(2)))
    x_mid = asi32(adj).astype(f32) * inv_time
    # plain forms: x = i/end with u32->float conversion
    x_pln = i_pos.astype(u32).astype(f32) * inv_time
    vm = (v0 + vt) * np.float32(0.5)
    vd = vt - v0
    half = np.float32(0.5)

    # rounding orders replicate the reference build's vectorized loops
    # (see dsp/lines.py): hoisted vd*inv_time for lin, vd folded into
    # the x factor for cos/smo, (x3+1)*k for cub
    def f_cos(_):
        s0 = np.float32(1.5702137061703461473139223358864)
        s1 = np.float32(-2.568278787380814155456160152724)
        s2 = np.float32(1.1496958507977182668618673644367)
        x2 = x_mid * x_mid
        xv = x_mid * vd
        return vm + xv * (s0 + x2 * (s1 + x2 * s2))

    def f_lin(_):
        k = vd * inv_time
        return vm + asi32(adj).astype(f32) * k

    def f_sah(_):
        return jnp.full(i_pos.shape, v0, dtype=f32)

    def f_xpe(_):
        return vt + (v0 - vt) * expramp6(np.float32(1.0) - x_pln)

    def f_lge(_):
        return v0 + (vt - v0) * expramp6(x_pln)

    def f_exp(_):
        return jnp.where(v0 > vt, f_xpe(0), f_lge(0))

    def f_log(_):
        return jnp.where(v0 < vt, f_xpe(0), f_lge(0))

    def f_sqe(_):
        x = half - x_mid
        return vt + (v0 - vt) * (x * x)

    def f_cub(_):
        scale = np.float32(-2) * inv_time
        k = (v0 - vt) * half
        x = asi32(adj).astype(f32) * scale
        return vt + ((x * x) * x + np.float32(1.0)) * k

    def f_smo(_):
        x = x_pln
        xd = x * vd
        x3d = (x * x) * xd
        return v0 + x3d * ((x * np.float32(6.0) + np.float32(-15.0)) * x
                           + np.float32(10.0))

    def f_uwh(_):
        s = asi32(ranfast32(i_pos.astype(u32))).astype(f32)
        return vm + (vd * np.float32(0.5 / 0x7fffffff)) * s

    def f_ncl(_):
        x = x_mid
        xb0 = x + half
        q = (xb0 + xb0 + np.float32(-3.0)) * xb0 + np.float32(1.0)
        s = asi32(ranfast32(i_pos.astype(u32))).astype(f32)
        return vm + ((x + (s * q) * (xb0 * np.float32(0.5 / 0x7fffffff)))
                     * vd)

    def f_nhl(_):
        x = x_mid
        xb0 = x + half
        q = np.float32(1.0) - xb0
        s = asi32(ranfast32(i_pos.astype(u32))).astype(f32)
        return vm + ((x + (q * s) * (xb0 * np.float32(2 * 0.5 / 0x7fffffff)))
                     * vd)

    fns = [f_cos, f_lin, f_sah, f_exp, f_log, f_xpe, f_lge, f_sqe,
           f_cub, f_smo, f_ncl, f_nhl, f_uwh]
    return select_lazy(line_type, fns, 0)


def line_val_at(line_type, pos, end, v0, vt):
    """Single value at current position (sauLine_get of 1 sample,
    used by sauLine_copy). Uses line_fill on a length-1 vector."""
    i_pos = jnp.asarray([pos], dtype=u32)
    return line_fill(line_type, i_pos, end, v0, vt)[0]


# -- PILUT wave oscillator ---------------------------------------------------

_luts = None
_piluts = None


def get_tables():
    """Wave LUTs as HOST (NumPy) arrays. Inside a jit trace these
    embed as HLO literals. They must NOT be eager device arrays: a
    jitted function that closes over a pre-existing device array pays
    a ~25 ms completion-notification penalty PER CALL on the dev-rig
    runtime (measured: a trivial `lambda x: x + captured_device_scalar`
    syncs in 25-32 ms vs 0.03 ms with an inlined np constant) -- that
    tax, not the tunnel, was the entire "~25 ms per-render sync"."""
    global _luts, _piluts
    if _luts is None:
        lut_arr, pilut_arr = W.get_tables()
        _luts = np.asarray(lut_arr, np.float32)
        _piluts = np.asarray(pilut_arr, np.float32)
    return _luts, _piluts

PHASE_ADJ = np.asarray(W.PICOEFF_PHASE_ADJ)     # (12,) u32
AMP_SCALE_T = np.asarray(W.PICOEFF_AMP_SCALE)   # (12,) f32
AMP_DC_T = np.asarray(W.PICOEFF_AMP_DC)         # (12,) f32
SLENBITS = np.uint32(W.SLENBITS)
LENMASK = np.int32(W.LENMASK)
X_SCALE = np.float32(1.0 / W.SLEN)


def _hermite_coeffs(pilut, ind):
    """c1, c2, c3 (c0 unused) for cell ``ind`` (masked).

    Computed from adjacent-sample differences, in which the O(1) terms
    cancel algebraically: with d0 = s1-s0, d1 = s2-s1, d2 = s3-s2,
        c1 = (d0 + d1)/2
        c2 = -d0 + 1.5 d1 - 0.5 d2
        c3 = 0.5 d0 - d1 + 0.5 d2
    The differences are (near-)exact in float32 (Sterbenz), so the
    small curvature coefficients keep full relative precision -- the
    naive form loses them to cancellation near table extrema."""
    pilut = jnp.asarray(pilut)  # np table -> trace-time literal
    s0 = pilut[(ind - 1) & LENMASK]
    s1 = pilut[ind & LENMASK]
    s2 = pilut[(ind + 1) & LENMASK]
    s3 = pilut[(ind + 2) & LENMASK]
    half = np.float32(0.5)
    d0 = s1 - s0
    d1 = s2 - s1
    d2 = s3 - s2
    c1 = half * (d0 + d1)
    c2 = np.float32(1.5) * d1 - d0 - half * d2
    c3 = half * (d0 + d2) - d1
    return c1, c2, c3


def _two_sum(a, b):
    """Knuth TwoSum: a + b = s + e exactly (round-to-nearest, no FMA)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _two_prod(a, b):
    """Dekker TwoProd via 12-bit split: a * b = p + e exactly."""
    SPLIT = np.float32(4097.0)  # 2^12 + 1
    p = a * b
    ca = SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _herp64_taps(s0, s1, s2, s3, x_f32):
    """Hermite interpolation exactly as sauWave_get_herp
    (sau/wave.h:127-141) evaluates it: coefficient subtractions
    (s2-s0), (s3-s0), (s1-s2) round in float32 (C subtracts the float
    operands before the double constant multiplies), everything else
    rounds in float64 per op, left-associative.  Bit-for-bit equal to
    the C on IEEE-double platforms (verified against gcc -O3 output);
    on TPU, XLA's float64 emulation keeps it within a few 2^-48."""
    f64 = jnp.float64
    x = x_f32.astype(f64)
    c0 = s1.astype(f64)
    c1 = np.float64(0.5) * (s2 - s0).astype(f64)
    c2 = (s0.astype(f64) - np.float64(2.5) * s1.astype(f64)
          + (np.float32(2.0) * s2).astype(f64)
          - np.float64(0.5) * s3.astype(f64))
    c3 = (np.float64(0.5) * (s3 - s0).astype(f64)
          + np.float64(1.5) * (s1 - s2).astype(f64))
    return ((c3 * x + c2) * x + c1) * x + c0


def _wosc_s64(wave, pd, x1, x2, taps1, taps2):
    """The PILUT-differentiation sample exactly as wosc.h:247-261
    computes it: float64 Is values, float32-rounded diff_scale/pd
    factor widened to float64, one final float32 rounding.  Bit-exact
    vs the reference binary where float64 is IEEE (JAX CPU); FM chains
    integrate this value, so anything less than bit-parity accumulates
    audible phase drift against the reference (misc1-4fm_pm.sau)."""
    diff_scale = np.float32(W.dvscale(wave))
    diff_offset = np.float64(np.float32(W.dvoffset(wave)))
    valid = pd != 0
    pdf = jnp.where(valid, pd, 1).astype(f32)
    xf = (diff_scale / pdf).astype(jnp.float64)
    Is1 = _herp64_taps(taps1[0], taps1[1], taps1[2], taps1[3], x1)
    Is2 = _herp64_taps(taps2[0], taps2[1], taps2[2], taps2[3], x2)
    s = ((Is2 - Is1) * xf + diff_offset).astype(f32)
    return jnp.where(valid, s, np.float32(0.0)), valid


# -- double-float32 oscillator chain (TPU path) -------------------------------
#
# The reference's sample math is float64 (wosc.h:238-266). On TPU,
# XLA emulates float64 in software (float32 pairs) at ~10x cost, and
# the old chain evaluated the Hermite at BOTH phase points. The TPU
# path below reproduces the same chain in explicit double-float32
# (Knuth TwoSum / Dekker TwoProd) -- plain f32 elementwise ops that
# XLA fuses behind the Pallas tap gather -- and exploits the
# shifted-Is identity (Is(p_prev[i]) == Is(ph[i-1])) so each sample
# costs ONE gather + ONE Hermite. Accuracy ~2^-44 absolute on Is --
# the same regime as XLA's f64 emulation (a few 2^-48); both deviate
# from the C binary's IEEE float64 by under +/-1 int16 LSB on <1% of
# samples (the CPU platform keeps the exact _wosc_s64 chain and its
# byte-parity).

def _ts(a, b):
    """Knuth TwoSum (no FMA assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _tp(a, b):
    """Dekker TwoProd via 12-bit split (exact for f32 inputs)."""
    SPLIT = np.float32(4097.0)
    p = a * b
    ca = SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df_add(ah, al, bh, bl):
    sh, se = _ts(ah, bh)
    lo = se + (al + bl)
    h = sh + lo
    return h, lo - (h - sh)


def _df_mul_f(ah, al, b):
    """(ah+al) * b with b a single f32."""
    p, e = _tp(ah, b)
    e = e + al * b
    h = p + e
    return h, e - (h - p)


def _herp_df64(s0, s1, s2, s3, x):
    """Hermite interpolation in df64, mirroring _herp64_taps'
    rounding structure: the (s2-s0)/(s3-s0)/(s1-s2) differences and
    2*s2 round in float32 exactly as the C does; products by 0.5/1.5/
    2.5 are exact; polynomial evaluation carries a compensation term.
    Returns an (hi, lo) pair for Is."""
    half = np.float32(0.5)
    c1 = half * (s2 - s0)                      # exact *0.5 of f32 diff
    # c2 = s0 - 2.5 s1 + f32(2 s2) - 0.5 s3, left-associative
    t25h, t25l = _tp(np.float32(2.5), s1)
    ah, al = _df_add(s0, np.float32(0.0), -t25h, -t25l)
    ah, al = _df_add(ah, al, np.float32(2.0) * s2, np.float32(0.0))
    ah, al = _df_add(ah, al, -half * s3, np.float32(0.0))
    # c3 = 0.5 f32(s3-s0) + 1.5 f32(s1-s2)
    t15h, t15l = _tp(np.float32(1.5), s1 - s2)
    c3h, c3l = _df_add(half * (s3 - s0), np.float32(0.0), t15h, t15l)
    # ((c3 x + c2) x + c1) x + c0
    h, l = _df_mul_f(c3h, c3l, x)
    h, l = _df_add(h, l, ah, al)
    h, l = _df_mul_f(h, l, x)
    h, l = _df_add(h, l, c1, np.float32(0.0))
    h, l = _df_mul_f(h, l, x)
    h, l = _df_add(h, l, s1, np.float32(0.0))
    return h, l


def _Is_df64(wave: int, ph_u32, taps=None):
    """df64 (hi, lo) pair for Is(phase): on TPU one fused Pallas
    launch (window lane-gathers + in-kernel df64 Hermite); elsewhere
    a tap gather + the XLA df64 Hermite -- bitwise identical (same
    IEEE f32 ops in the same order). Scalar phases use the
    dynamic-slice tap path."""
    if taps is None and ph_u32.ndim == 1 and _fused_is_available():
        return _gather_is_fused(ph_u32, wave)
    x = (ph_u32 & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    if taps is None:
        if ph_u32.ndim == 0:
            taps = taps_at(ph_u32 >> SLENBITS, wave)
        else:
            taps = gather_taps(wosc_cells(ph_u32), wave)
    return _herp_df64(taps[0], taps[1], taps[2], taps[3], x)


def wosc_s_shifted(wave: int, ph_u32, p_prev_u32, pp_in,
                   first_ir=None, do_rst=None, rst_prev=None,
                   taps2=None):
    """(s_raw, valid) for the phase step p_prev -> ph via the
    shifted-Is identity: because p_prev[i] == ph[i-1] everywhere
    except the head (pp_in) and an optional reset row (first_ir),
    Is(p_prev[i]) IS the previous sample's Is -- so ONE tap gather
    and ONE Hermite per sample suffice; the head and reset positions
    are patched with scalar Is evaluations. Bitwise identical to
    evaluating both points (same function of the same inputs).

    The Hermite runs in df64 (double-float32) instead of XLA's
    ~10x-cost float64 emulation -- validated at 0 int16 mismatches
    over 3.1M random samples per wave vs the exact f64 chain
    (tools/validate_df64.py); the CPU platform keeps _wosc_s64 and
    its byte-parity. ``taps2``: optional pre-gathered taps for
    wosc_cells(ph) (the engine batches same-level gathers).

    Reference math: wosc.h:238-266 (s = DVSCALE*(Is2-Is1)/pd+DVOFFS).
    """
    pd = asi32(ph_u32 - p_prev_u32)
    valid = pd != 0
    h2, l2 = _Is_df64(wave, ph_u32, taps=taps2)
    hp, lp = _Is_df64(wave, pp_in)
    h1 = jnp.concatenate([jnp.reshape(hp, (1,)), h2[:-1]])
    l1 = jnp.concatenate([jnp.reshape(lp, (1,)), l2[:-1]])
    if first_ir is not None:
        hr, lr = _Is_df64(wave, rst_prev)
        h1 = h1.at[first_ir].set(jnp.where(do_rst, hr, h1[first_ir]))
        l1 = l1.at[first_ir].set(jnp.where(do_rst, lr, l1[first_ir]))
    diff_scale = np.float32(W.dvscale(wave))
    diff_offset = np.float32(W.dvoffset(wave))
    pdf = jnp.where(valid, pd, 1).astype(f32)
    xf = diff_scale / pdf
    dh, dl = _df_add(h2, l2, -h1, -l1)
    mh, ml = _df_mul_f(dh, dl, xf)
    sh, sl = _df_add(mh, ml, diff_offset, np.float32(0.0))
    s = sh + sl
    return jnp.where(valid, s, np.float32(0.0)), valid


def _wosc_s_df64(wave, pd, x1, x2, taps1, taps2):
    """Portable jnp mirror of the df64 sample chain with both points
    evaluated explicitly; same signature/semantics as _wosc_s64.
    Used by tools/validate_df64.py to bound df64-vs-f64 error."""
    diff_scale = np.float32(W.dvscale(wave))
    diff_offset = np.float32(W.dvoffset(wave))
    valid = pd != 0
    pdf = jnp.where(valid, pd, 1).astype(f32)
    xf = diff_scale / pdf
    h1, l1 = _herp_df64(taps1[0], taps1[1], taps1[2], taps1[3], x1)
    h2, l2 = _herp_df64(taps2[0], taps2[1], taps2[2], taps2[3], x2)
    dh, dl = _df_add(h2, l2, -h1, -l1)
    mh, ml = _df_mul_f(dh, dl, xf)
    sh, sl = _df_add(mh, ml, diff_offset, np.float32(0.0))
    s = sh + sl
    return jnp.where(valid, s, np.float32(0.0)), valid


def wosc_diff(pilut, wave, p1_u32, p2_u32):
    """Anti-aliased oscillator output for the phase step p1 -> p2:
    s = DVSCALE(wave) * (Is(p2)-Is(p1)) / (p2-p1) + DVOFFSET(wave),
    evaluated with the reference's exact float64 rounding chain
    (wosc.h:238-266) so FM chains that integrate the value do not
    drift.  Returns (s, valid) where valid == False iff p2 == p1."""
    i1 = (p1_u32 >> SLENBITS).astype(i32)
    i2 = (p2_u32 >> SLENBITS).astype(i32)
    x1 = (p1_u32 & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    x2 = (p2_u32 & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    pd = asi32(p2_u32 - p1_u32)
    pilut = jnp.asarray(pilut)  # np table -> trace-time literal
    taps1 = jnp.stack([pilut[(i1 - 1) & LENMASK], pilut[i1 & LENMASK],
                       pilut[(i1 + 1) & LENMASK],
                       pilut[(i1 + 2) & LENMASK]])
    taps2 = jnp.stack([pilut[(i2 - 1) & LENMASK], pilut[i2 & LENMASK],
                       pilut[(i2 + 1) & LENMASK],
                       pilut[(i2 + 2) & LENMASK]])
    return _wosc_s64(wave, pd, x1, x2, taps1, taps2)


def _wosc_diff_compensated(pilut, wave, p1_u32, p2_u32):
    """Former float32 compensated formulation (cancellation-free,
    ~1 ulp of the float64 chain); kept for reference/fallback -- it is
    faster on TPU but its per-sample rounding differs from the C chain
    often enough that FM integration drifts audibly."""
    pd = asi32(p2_u32 - p1_u32)
    i1 = (p1_u32 >> SLENBITS).astype(i32)
    i2 = (p2_u32 >> SLENBITS).astype(i32)
    x1 = (p1_u32 & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    x2 = (p2_u32 & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    c1a, c2a, c3a = _hermite_coeffs(pilut, i1)
    c1b, c2b, c3b = _hermite_coeffs(pilut, i2)
    one = np.float32(1.0)
    diff_scale = AMP_SCALE_T[wave] * np.float32(0.125) * P32F
    valid = pd != 0
    pdf = jnp.where(valid, pd, 1).astype(f32)
    # C computes x = (float)(diff_scale / phase_diff) then widens;
    # replicate that rounded factor exactly (wosc.h:255).
    xf = diff_scale / pdf
    same_cell = i1 == i2

    # dIs as a compensated sum of three cancellation-free pieces:
    # same cell:  (x2-x1) * bracket, with (x2-x1) = pd * 2^-21 exact
    # cross cell: [P2(x2)-P2(0)] + (lut[i2]-lut[i1+1]) + [P1(1)-P1(x1)]
    q3 = x2 * x2 + x1 * x2 + x1 * x1
    q2 = x2 + x1
    t3h, t3l = _two_prod(c3a, q3)
    t2h, t2l = _two_prod(c2a, q2)
    bh, be = _two_sum(t3h, t2h)
    bh, be2 = _two_sum(bh, c1a)
    b_lo = be + be2 + t3l + t2l
    m_same = (x2 - x1)  # == pd * 2^-21, exact in f32 (|pd| < 2^21)

    head_h, head_l = _horner_diff(c1b, c2b, c3b, x2)
    tailb = (c3a * (one + x1 + x1 * x1) + c2a * (one + x1) + c1a)
    th, tl = _two_prod(one - x1, tailb)
    mh, ml = _two_sum(pilut[i2 & LENMASK], -pilut[(i1 + 1) & LENMASK])
    dh, de = _two_sum(head_h, th)
    dh, de2 = _two_sum(dh, mh)
    d_lo = de + de2 + head_l + tl + ml

    dIs_h = jnp.where(same_cell, bh * m_same, dh)
    dIs_l = jnp.where(same_cell, b_lo * m_same, d_lo)
    # s = (dIs_h + dIs_l) * xf + offset, compensated, single rounding
    ph, pe = _two_prod(dIs_h, xf)
    lo = pe + dIs_l * xf
    sh, se = _two_sum(ph, AMP_DC_T[wave])
    s = sh + (se + lo)
    return s, valid


def _horner_diff(c1, c2, c3, x):
    """P(x) - P(0) = x((c3 x + c2) x + c1) with compensated product."""
    inner = (c3 * x + c2) * x + c1
    return _two_prod(x, inner)


def forward_fill_valid(s_raw, valid, prev_s, length):
    """out[i] = s_raw at the last valid j <= i (prev_s if none yet).

    Positions past ``length`` are masked downstream, so a block whose
    in-range positions are all valid (pd != 0 -- the overwhelmingly
    common case; pd == 0 needs a frozen phase, wosc.h:238) takes the
    fast branch and skips the scan + gather entirely."""
    B = s_raw.shape[0]
    idx = jnp.arange(B, dtype=i32)

    def slow(_):
        s_ext = jnp.concatenate([jnp.reshape(prev_s, (1,)), s_raw])
        last_valid = jax.lax.associative_scan(
            jnp.maximum, jnp.where(valid, idx + 1, 0))
        return s_ext[last_valid]

    import os
    if os.environ.get('SAUGNS_TPU_FFILL_FAST', '1') != '1':
        return slow(None)
    bad = (~valid) & (idx < length)
    pair = bad & jnp.concatenate([bad[:1] & False, bad[:-1]])

    def count(mask):
        if _on_tpu() and B % 1024 == 0:
            # jnp.any over a long vector lowers to a ~100us
            # slice/reduce chain on v5e; an exact count via two MXU
            # dots (0/1 values, sums < 2^24) is far cheaper
            bm = mask.astype(f32).reshape(B // 128, 128)
            return jnp.dot(jnp.dot(bm, jnp.ones((128,), f32)),
                           jnp.ones((B // 128,), f32))
        return jnp.any(mask).astype(f32)

    def fill1(_):
        # isolated invalid samples (the common case: PM sweeping the
        # phase increment through zero for one sample): the previous
        # sample is valid, so a one-step shift is the exact fill
        shift_raw = jnp.concatenate([jnp.reshape(prev_s, (1,)),
                                     s_raw[:-1]])
        return jnp.where(valid, s_raw, shift_raw)

    zero = np.float32(0.0)
    return jax.lax.cond(
        count(bad) == zero, lambda _: s_raw,
        lambda _: jax.lax.cond(count(pair) == zero, fill1, slow, None),
        None)


def wosc_run_vec(pilut, wave, phase_buf, prev_phase, prev_s, reset,
                 length):
    """Vectorized sauWOsc_run. Returns (out, new_prev_phase,
    new_prev_s, used). State advances only when length > 0."""
    B = phase_buf.shape[0]
    idx = jnp.arange(B, dtype=i32)
    # reset: behave as if prev_phase = phase[0] - SLEN (see wosc.h:215)
    p0 = phase_buf[0] - np.uint32(W.SLEN)
    pp = jnp.where(reset, p0, prev_phase)
    p_prev = jnp.concatenate([jnp.asarray([pp], dtype=u32),
                              phase_buf[:-1]])
    s_raw, valid = wosc_diff(pilut, wave, p_prev, phase_buf)
    # forward-fill invalid positions (phase_diff == 0) with previous s
    out = forward_fill_valid(s_raw, valid, prev_s, length)
    has = length > 0
    li = jnp.maximum(length - 1, 0)
    new_pp = jnp.where(has, phase_buf[li], prev_phase)
    new_ps = jnp.where(has, out[li], prev_s)
    return out, new_pp, new_ps


def wosc_selfmod_scan(pilut, wave, phase_buf, abuf, prev_phase, prev_s,
                      fb_s, reset, length):
    """sauWOsc_run_selfmod (wosc.h:273-310) as a per-sample scan.

    The feedback makes this a true 1-sample recurrence (no prefix
    trick applies); the lever is a lean step body. On TPU the step
    carries the previous sample's Is pair (the C itself carries
    prev_Is, wosc.h:45-47) so each sample costs ONE tap fetch and ONE
    Hermite, evaluated in df64 instead of XLA's ~10x-cost float64
    emulation -- the same accuracy regime as the main TPU oscillator
    path. The CPU platform keeps the exact float64 chain and its
    byte-parity with the reference binary."""
    B = phase_buf.shape[0]
    p0 = phase_buf[0] - np.uint32(W.SLEN)
    pp0 = jnp.where(reset, p0, prev_phase)
    fb_scale = P31

    if use_fused_osc():
        dvs = np.float32(W.dvscale(wave))
        dvo = np.float32(W.dvoffset(wave))
        h0, l0 = _Is_df64(wave, pp0)
        if phase_buf.ndim == 1 and selfmod_kernel_available():
            # one Pallas launch for the whole block: the recurrence
            # runs as an in-kernel scalar loop (~200x less per-sample
            # overhead than the lax.scan's while-loop steps)
            return _wosc_selfmod_pallas(wave, phase_buf, abuf, pp0,
                                        prev_s, fb_s, h0, l0, length)

        def step_df(carry, xs):
            pp, ps, fb, ih, il, i = carry
            ph, am = xs
            adj = ftoi(fb * am * fb_scale)
            phase = (ph.astype(jnp.int64) + adj).astype(u32)
            h2, l2 = _Is_df64(wave, phase)
            pd = asi32(phase - pp)
            valid = pd != 0
            pdf = jnp.where(valid, pd, 1).astype(f32)
            xf = dvs / pdf
            dh, dl = _df_add(h2, l2, -ih, -il)
            mh, ml = _df_mul_f(dh, dl, xf)
            sh, sl = _df_add(mh, ml, dvo, np.float32(0.0))
            s = jnp.where(valid, sh + sl, ps)
            active = i < length
            av = active & valid
            return (jnp.where(av, phase, pp), jnp.where(av, s, ps),
                    jnp.where(active, (fb + s) * np.float32(0.5), fb),
                    jnp.where(av, h2, ih), jnp.where(av, l2, il),
                    i + 1), jnp.where(active, s, np.float32(0))

        (pp, ps, fb, _h, _l, _), out = jax.lax.scan(
            step_df, (pp0, prev_s, fb_s, h0, l0, jnp.int32(0)),
            (phase_buf, abuf))
        return out, pp, ps, fb

    def step(carry, xs):
        pp, ps, fb, i = carry
        ph, am = xs
        adj = ftoi(fb * am * fb_scale)
        phase = (ph.astype(jnp.int64) + adj).astype(u32)
        s, valid = wosc_diff(pilut, wave, pp, phase)
        s = jnp.where(valid, s, ps)
        active = i < length
        pp_n = jnp.where(active & valid, phase, pp)
        ps_n = jnp.where(active & valid, s, ps)
        fb_n = jnp.where(active, (fb + s) * np.float32(0.5), fb)
        return (pp_n, ps_n, fb_n, i + 1), jnp.where(active, s,
                                                    np.float32(0))

    (pp, ps, fb, _), out = jax.lax.scan(
        step, (pp0, prev_s, fb_s, jnp.int32(0)),
        (phase_buf, abuf))
    return out, pp, ps, fb


# -- Pallas self-PM scalar-loop kernel (TPU) -----------------------------------
#
# The self-PM feedback is the one true per-sample recurrence in the
# reference (wosc.h:273-310): phase[i] depends on s[i-1]. As an XLA
# lax.scan each sample is a while-loop iteration with ~us-scale step
# overhead -- pm_feedback_pm.sau rendered at ~1x realtime, ~200x
# slower than the arithmetic itself. This kernel runs the SAME df64
# recurrence as a scalar fori_loop INSIDE one Pallas kernel: the
# block's phases/amps stream through SMEM tiles (grid steps run
# sequentially on TPU, carrying the oscillator state in SMEM
# scratch), the 2048-entry PILUT sits in SMEM for dynamic scalar tap
# loads, and each sample costs ~200 scalar f32 ops with no per-step
# dispatch. Same ops, same order as the lax.scan body (step_df
# above); only division lowering may differ by hardware path.

_SM_TILE = 1024


def _rint_s(t):
    """Scalar round-half-even via the 2^23 magic-add trick (Mosaic
    has no direct rint lowering): exact for |t| < 2^23; |t| >= 2^23
    is already an integer in f32."""
    big = np.float32(2.0 ** 23)
    mag = jnp.where(t >= np.float32(0.0), big, -big)
    r = (t + mag) - mag
    return jnp.where(jnp.abs(t) < big, r, t)


def _selfmod_kernel_factory(TILE, dvs, dvo):
    from jax.experimental import pallas as pl

    def kernel(ph_ref, am_ref, act_ref, si_ref, sf_ref, tab_ref,
               out_ref, opp_ref, ofs_ref, sc_i_ref, sc_f_ref):
        gi = pl.program_id(0)
        first = gi == 0
        pp0 = jnp.where(first, si_ref[0], sc_i_ref[0])
        ps0 = jnp.where(first, sf_ref[0], sc_f_ref[0])
        fb0 = jnp.where(first, sf_ref[1], sc_f_ref[1])
        ih0 = jnp.where(first, sf_ref[2], sc_f_ref[2])
        il0 = jnp.where(first, sf_ref[3], sc_f_ref[3])

        def body(i, carry):
            pp, ps, fb, ih, il = carry
            ph = ph_ref[i]
            am = am_ref[i]
            # adj = lrintf(fb*am*2^31) mod 2^32 as i32: rint via the
            # magic trick, then an exact signed fold into [-2^31,2^31)
            # (y and rint(y*2^-32)*2^32 share ulp granularity, so the
            # subtraction is exact; the i32 wraparound add below
            # matches the scan's int64-add-then-u32-cast mod 2^32)
            y = _rint_s(fb * am * P31)
            hi = _rint_s(y * np.float32(2.0 ** -32))
            r = y - hi * np.float32(2.0 ** 32)
            r = jnp.where(r == np.float32(2.0 ** 31),
                          np.float32(-(2.0 ** 31)), r)
            phase = ph + r.astype(i32)
            cell = jax.lax.shift_right_logical(phase,
                                               np.int32(SLENBITS))
            x = (phase & np.int32(W.SLENMASK)).astype(f32) * X_SCALE
            m = np.int32(W.LENMASK)
            t0 = tab_ref[(cell + m) & m]
            t1 = tab_ref[cell]
            t2 = tab_ref[(cell + np.int32(1)) & m]
            t3 = tab_ref[(cell + np.int32(2)) & m]
            h2, l2 = _herp_df64(t0, t1, t2, t3, x)
            pd = phase - pp
            valid = pd != np.int32(0)
            pdf = jnp.where(valid, pd, np.int32(1)).astype(f32)
            xf = np.float32(dvs) / pdf
            dh, dl = _df_add(h2, l2, -ih, -il)
            mh, ml = _df_mul_f(dh, dl, xf)
            sh, sl = _df_add(mh, ml, np.float32(dvo), np.float32(0.0))
            s = jnp.where(valid, sh + sl, ps)
            active = act_ref[i] != np.int32(0)
            av = active & valid
            out_ref[i] = jnp.where(active, s, np.float32(0.0))
            return (jnp.where(av, phase, pp), jnp.where(av, s, ps),
                    jnp.where(active, (fb + s) * np.float32(0.5), fb),
                    jnp.where(av, h2, ih), jnp.where(av, l2, il))

        # i32 bounds: Python-int bounds mint an int64 induction
        # variable under jax_enable_x64, which Mosaic rejects
        pp, ps, fb, ih, il = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(TILE), body,
            (pp0, ps0, fb0, ih0, il0))
        sc_i_ref[0] = pp
        sc_f_ref[0] = ps
        sc_f_ref[1] = fb
        sc_f_ref[2] = ih
        sc_f_ref[3] = il
        opp_ref[0] = pp
        ofs_ref[0] = ps
        ofs_ref[1] = fb
    return kernel


def _wosc_selfmod_pallas(wave, phase_buf, abuf, pp0, prev_s, fb_s,
                         h0, l0, length, active=None,
                         interpret=False):
    """Run the self-PM recurrence for one block in one Pallas launch.
    phase_buf: (B,) u32 base phases (incl. external PM), abuf: (B,)
    f32 amp; scalars pp0 (u32), prev_s, fb_s, h0/l0 (Is(pp0) df64
    pair). ``active``: optional (B,) bool per-sample gate (the flat
    path's block masks); default = the first ``length`` samples.
    Returns (out, pp, ps, fb) like the lax.scan path."""
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    B = phase_buf.shape[0]
    TILE = min(_SM_TILE, B)
    pad = (-B) % TILE
    ph = jax.lax.bitcast_convert_type(phase_buf, i32)
    am = abuf
    if active is None:
        act = (jnp.arange(B, dtype=i32)
               < jnp.asarray(length, i32)).astype(i32)
    else:
        act = active.astype(i32)
    if pad:
        ph = jnp.concatenate([ph, jnp.zeros(pad, i32)])
        am = jnp.concatenate([am, jnp.zeros(pad, f32)])
        act = jnp.concatenate([act, jnp.zeros(pad, i32)])
    n_tiles = (B + pad) // TILE
    si = jnp.stack([asi32(jnp.asarray(pp0, u32))])
    sf = jnp.stack([jnp.asarray(prev_s, f32), jnp.asarray(fb_s, f32),
                    jnp.asarray(h0, f32), jnp.asarray(l0, f32)])
    _, piluts = W.get_tables()
    tab = np.asarray(piluts, np.float32)[wave]  # (2048,) literal
    dvs = np.float32(W.dvscale(wave))
    dvo = np.float32(W.dvoffset(wave))

    def smem(n):
        return pl_.BlockSpec((n,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM)

    tile_spec = pl_.BlockSpec((TILE,), lambda i: (i,),
                              memory_space=pltpu.SMEM)
    out, opp, ofs = pl_.pallas_call(
        _selfmod_kernel_factory(TILE, dvs, dvo),
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, tile_spec,
                  smem(1), smem(4), smem(2048)],
        out_specs=[tile_spec, smem(1), smem(2)],
        out_shape=[jax.ShapeDtypeStruct((B + pad,), f32),
                   jax.ShapeDtypeStruct((1,), i32),
                   jax.ShapeDtypeStruct((2,), f32)],
        scratch_shapes=[pltpu.SMEM((1,), i32), pltpu.SMEM((4,), f32)],
        interpret=interpret,
    )(ph, am, act, si, jnp.asarray(sf), jnp.asarray(tab))
    return out[:B], asu32(opp[0]), ofs[0], ofs[1]


def selfmod_kernel_available():
    """Whether the Pallas self-PM kernel replaces the per-sample
    lax.scan (TPU only; SAUGNS_TPU_SELFMOD_KERNEL=0 restores the
    scan)."""
    return _on_tpu() and os.environ.get(
        'SAUGNS_TPU_SELFMOD_KERNEL', '1') == '1'


# -- random segments oscillator ----------------------------------------------

def rasg_map(func, level, alpha, oflags, cycle):
    """Endpoint pair map (rasg.h:296-683). ``cycle``: uint32 vector.
    Returns (a, b) float32. Static (python int) func/level/oflags
    prune to a single branch at trace time."""
    u1 = np.uint32(1)
    static = isinstance(oflags, int)
    violet = (oflags & P.RAS_O_VIOLET) != 0
    lvl = level if isinstance(level, int) else level.astype(i32)
    r_m1 = ranfast32(cycle - u1)
    r_0 = ranfast32(cycle)
    r_p1 = ranfast32(cycle + u1)

    def _sar(x):
        return asu32(asi32(x) >> lvl)

    def _divi2(x_u32):
        xi = asi32(x_u32)
        q = jnp.sign(xi) * (jnp.abs(xi) // 2)
        return asu32(q.astype(i32))

    def m_urand():
        def plain():
            a = asi32(r_0).astype(f32) * SCALE31
            b = asi32(r_p1).astype(f32) * SCALE31
            return a, b

        def vio():
            v0h = r_m1 // np.uint32(2)
            v1h = r_0 // np.uint32(2)
            v2h = r_p1 // np.uint32(2)
            a = asi32(v1h - v0h).astype(f32) * SCALE31
            b = asi32(v2h - v1h).astype(f32) * SCALE31
            return a, b
        return _pick(violet, vio, plain, static)

    def m_gauss():
        return franssgauss32(cycle), franssgauss32(cycle + u1)

    def m_bin():
        def plain():
            offs = np.uint32(0x7fffffff) + (cycle & u1) * np.uint32(2)
            s1 = _sar(r_0) + offs
            s2 = _sar(r_p1) - offs
            return (asi32(s1).astype(f32) * SCALE31,
                    asi32(s2).astype(f32) * SCALE31)

        def vio():
            scale_diff = np.float32(1.0) - (
                jnp.asarray(0x7fffffff, i32) >> lvl).astype(f32) \
                * SCALE31
            vscale = (np.float32(1.0) + scale_diff * scale_diff) \
                * SCALE31
            sb = (cycle & u1) << np.uint32(31)
            sb_flip = np.uint32(1 << 31) - sb
            vb0 = _divi2(_sar(r_m1) + sb)
            vb1 = _divi2(_sar(r_0) + sb_flip)
            vb2 = _divi2(_sar(r_p1) + sb)
            return (asi32(vb1 - vb0).astype(f32) * vscale,
                    asi32(vb2 - vb1).astype(f32) * vscale)
        return _pick(violet, vio, plain, static)

    def m_tern():
        sb = (cycle & u1) << np.uint32(31)
        sb_flip = np.uint32(1 << 31) - sb
        s1 = _sar(r_0) + sb_flip
        s2 = _sar(r_p1) + sb
        return (asi32(s1).astype(f32) * SCALE31,
                asi32(s2).astype(f32) * SCALE31)

    def m_fixed():
        sign = (1 - (cycle & u1).astype(i32) * 2)
        imax = jnp.int32(0x7fffffff)

        def simple():
            a = sign.astype(f32)
            return a, -a

        def plain():
            r1 = (asi32(r_0) >> lvl) - imax
            r2 = (asi32(r_p1) >> lvl) - imax
            return ((-sign * r1).astype(f32) * SCALE31,
                    (sign * r2).astype(f32) * SCALE31)

        def vio():
            r0 = (asi32(r_m1) >> lvl) - imax
            r1 = (asi32(r_0) >> lvl) - imax
            r2 = (asi32(r_p1) >> lvl) - imax
            s0 = _divi2(asu32(sign * r0))
            s1 = _divi2(asu32(-sign * r1))
            s2 = _divi2(asu32(sign * r2))
            return (asi32(s1 - s0).astype(f32) * SCALE31,
                    asi32(s2 - s1).astype(f32) * SCALE31)
        hi = (lvl >= P.ras_level(9)) if isinstance(lvl, int) \
            else (level >= P.ras_level(9))
        return _pick(hi, simple,
                     lambda: _pick(violet, vio, plain, static),
                     static and isinstance(lvl, int))

    def m_addrec():
        al = np.uint32(alpha) if isinstance(alpha, int) else alpha
        s0 = umul32(cycle, al)
        s1 = umul32(cycle + u1, al)
        return (asi32(s0).astype(f32) * SCALE31,
                asi32(s1).astype(f32) * SCALE31)

    fns = [m_urand, m_gauss, m_bin, m_tern, m_fixed, m_addrec]
    if isinstance(func, int):
        return fns[func]()
    pairs = [f() for f in fns]
    a = select_by(func, [p[0] for p in pairs])
    b = select_by(func, [p[1] for p in pairs])
    return a, b


def _pick(cond, tfn, ffn, static):
    """Two-way pick; static python condition prunes at trace time."""
    if static or isinstance(cond, bool):
        return tfn() if cond else ffn()
    ta, tb = tfn()
    fa, fb = ffn()
    return jnp.where(cond, ta, fa), jnp.where(cond, tb, fb)


def rasg_shape(line, oflags, phase, a, b):
    """Mode-flag post-pass + line map (rasg.h:692-743). Static
    (python int) line/oflags prune at trace time."""
    one = np.float32(1.0)
    static = isinstance(oflags, int)
    if static:
        if oflags & P.RAS_O_PERLIN:
            pa = np.float32(1.0) if oflags & (P.RAS_O_HALFSHAPE |
                                              P.RAS_O_ZIGZAG) \
                else np.float32(PERLIN_AMP[line])
            a = a * (pa * phase)
            b = b * (pa * (phase - one))
        if oflags & P.RAS_O_HALFSHAPE:
            a, b = jnp.maximum(a, b), jnp.minimum(a, b)
        if oflags & P.RAS_O_ZIGZAG:
            a, b = b, a
        if oflags & P.RAS_O_SQUARE:
            a = a * jnp.abs(a)
            b = b * jnp.abs(b)
        return line_val(line, phase, a, b)
    perlin_amp = jnp.where(
        (oflags & (P.RAS_O_HALFSHAPE | P.RAS_O_ZIGZAG)) != 0,
        one, jnp.asarray(PERLIN_AMP)[jnp.clip(line, 0, 12)])
    do_perlin = (oflags & P.RAS_O_PERLIN) != 0
    a = jnp.where(do_perlin, a * (perlin_amp * phase), a)
    b = jnp.where(do_perlin, b * (perlin_amp * (phase - one)), b)
    do_half = (oflags & P.RAS_O_HALFSHAPE) != 0
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    a = jnp.where(do_half, hi, a)
    b = jnp.where(do_half, lo, b)
    do_zig = (oflags & P.RAS_O_ZIGZAG) != 0
    a2 = jnp.where(do_zig, b, a)
    b2 = jnp.where(do_zig, a, b)
    do_sq = (oflags & P.RAS_O_SQUARE) != 0
    a2 = jnp.where(do_sq, a2 * jnp.abs(a2), a2)
    b2 = jnp.where(do_sq, b2 * jnp.abs(b2), b2)
    return line_val(line, phase, a2, b2)


def wosc_selfmod_masked(pilut, wave, ph, am, active, pp0, prev_s,
                        fb_s):
    """Self-PM over a flattened masked sample stream: like
    wosc_selfmod_scan but gated by the per-sample ``active`` vector
    (the flat path's block masks -- inactive samples output 0 and do
    not advance state). Reset pairing is resolved by the CALLER into
    ``pp0`` (first-active-sample raw phase minus SLEN, mirroring
    wosc.h:215-231 at the flat path's first_ir). Returns
    (out, pp, ps, fb)."""
    fb_scale = P31
    if use_fused_osc():
        dvs = np.float32(W.dvscale(wave))
        dvo = np.float32(W.dvoffset(wave))
        if ph.ndim == 1 and selfmod_kernel_available():
            h0, l0 = _Is_df64(wave, pp0)
            return _wosc_selfmod_pallas(wave, ph, am, pp0, prev_s,
                                        fb_s, h0, l0, None,
                                        active=active)
        h0, l0 = _Is_df64(wave, pp0)

        def step_df(carry, xs):
            pp, ps, fb, ih, il = carry
            phv, amv, act = xs
            adj = ftoi(fb * amv * fb_scale)
            phase = (phv.astype(jnp.int64) + adj).astype(u32)
            h2, l2 = _Is_df64(wave, phase)
            pd = asi32(phase - pp)
            valid = pd != 0
            pdf = jnp.where(valid, pd, 1).astype(f32)
            xf = dvs / pdf
            dh, dl = _df_add(h2, l2, -ih, -il)
            mh, ml = _df_mul_f(dh, dl, xf)
            sh, sl = _df_add(mh, ml, dvo, np.float32(0.0))
            s = jnp.where(valid, sh + sl, ps)
            av = act & valid
            return (jnp.where(av, phase, pp), jnp.where(act, s, ps),
                    jnp.where(act, (fb + s) * np.float32(0.5), fb),
                    jnp.where(av, h2, ih), jnp.where(av, l2, il)), \
                jnp.where(act, s, np.float32(0))

        (pp, ps, fb, _h, _l), out = jax.lax.scan(
            step_df, (pp0, prev_s, fb_s, h0, l0), (ph, am, active))
        return out, pp, ps, fb

    def step(carry, xs):
        pp, ps, fb = carry
        phv, amv, act = xs
        adj = ftoi(fb * amv * fb_scale)
        phase = (phv.astype(jnp.int64) + adj).astype(u32)
        s, valid = wosc_diff(pilut, wave, pp, phase)
        s = jnp.where(valid, s, ps)
        av = act & valid
        return (jnp.where(av, phase, pp), jnp.where(act, s, ps),
                jnp.where(act, (fb + s) * np.float32(0.5), fb)), \
            jnp.where(act, s, np.float32(0))

    (pp, ps, fb), out = jax.lax.scan(
        step, (pp0, prev_s, fb_s), (ph, am, active))
    return out, pp, ps, fb


def rasg_selfmod_masked(func, line, level, alpha, oflags, phase_buf,
                        cycle_buf, abuf, active, prev_s, fb_s):
    """RasG self-PM over a flattened masked sample stream (the flat
    path's block masks). Returns (out, ps, fb)."""
    # noise lines (ncl/nhl/uwh, >= 10) reinterpret float bits as a
    # PRNG seed -- Mosaic has no scalar f32<->i32 bitcast, so those
    # combos stay on the lax.scan path
    if (phase_buf.ndim == 1 and selfmod_kernel_available()
            and isinstance(func, int) and isinstance(oflags, int)
            and isinstance(line, int) and line < 10):
        return _rasg_selfmod_pallas(func, line, level, alpha, oflags,
                                    phase_buf, cycle_buf, abuf,
                                    prev_s, fb_s, None, active=active)

    def step(carry, xs):
        ps, fb = carry
        phase0, cyc0, amv, act = xs
        pm_a = fb * amv * np.float32(0.5)
        phase = phase0 + pm_a
        cycle_adj = jnp.floor(phase).astype(i32)
        cycle = (cyc0.astype(i32) + cycle_adj).astype(u32)
        phase = phase - cycle_adj.astype(f32)
        cv = jnp.reshape(cycle, (1,))
        a, b = rasg_map(func, level, alpha, oflags, cv)
        s = rasg_shape(line, oflags,
                       jnp.reshape(phase, (1,)), a, b)[0]
        fb_n = jnp.where(act, (fb + s + ps) * np.float32(0.5), fb)
        ps_n = jnp.where(act, s, ps)
        return (ps_n, fb_n), jnp.where(act, s, np.float32(0))

    (ps, fb), out = jax.lax.scan(
        step, (prev_s, fb_s), (phase_buf, cycle_buf, abuf, active))
    return out, ps, fb


_rasg_sm_kernels = {}


def _rasg_selfmod_kernel_factory(TILE, func, line, level, alpha,
                                 oflags):
    """Pallas scalar-loop kernel for the RasG self-PM recurrence
    (rasg.h:242-294,764-772) -- the same approach as the wosc
    self-PM kernel: the per-sample feedback chain runs as a fori_loop
    INSIDE one kernel launch (SMEM tiles, grid steps sequential on
    TPU, state carried in SMEM scratch). Unlike wosc there is no
    table: rasg_map/rasg_shape are pure arithmetic, so the body
    reuses the exact trace-time-pruned jnp code the lax.scan path
    evaluates -- same ops, same order, bit-identical."""
    from jax.experimental import pallas as pl

    def kernel(ph_ref, cy_ref, am_ref, act_ref, sf_ref, out_ref,
               ofs_ref, sc_f_ref):
        global _SCALAR_KERNEL_CTX
        _SCALAR_KERNEL_CTX = True  # traced once; reset at the end
        gi = pl.program_id(0)
        first = gi == 0
        ps0 = jnp.where(first, sf_ref[0], sc_f_ref[0])
        fb0 = jnp.where(first, sf_ref[1], sc_f_ref[1])

        def body(i, carry):
            ps, fb = carry
            ph0 = ph_ref[i]
            cyc0 = cy_ref[i]
            am = am_ref[i]
            pm_a = fb * am * np.float32(0.5)
            phase = ph0 + pm_a
            cycle_adj = jnp.floor(phase).astype(i32)
            cycle = asu32(cyc0 + cycle_adj)
            phase = phase - cycle_adj.astype(f32)
            a, b = rasg_map(func, level, alpha, oflags, cycle)
            s = rasg_shape(line, oflags, phase, a, b)
            active = act_ref[i] != np.int32(0)
            out_ref[i] = jnp.where(active, s, np.float32(0.0))
            return (jnp.where(active, s, ps),
                    jnp.where(active, (fb + s + ps) * np.float32(0.5),
                              fb))

        try:
            ps, fb = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(TILE), body, (ps0, fb0))
        finally:
            _SCALAR_KERNEL_CTX = False
        sc_f_ref[0] = ps
        sc_f_ref[1] = fb
        ofs_ref[0] = ps
        ofs_ref[1] = fb
    return kernel


def _rasg_selfmod_pallas(func, line, level, alpha, oflags, phase_buf,
                         cycle_buf, abuf, prev_s, fb_s, length,
                         active=None, interpret=False):
    """One-launch RasG self-PM block; same returns as the scan path
    (out, ps, fb). ``active``: optional per-sample gate vector
    (default = the first ``length`` samples)."""
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    B = phase_buf.shape[0]
    TILE = min(_SM_TILE, B)
    pad = (-B) % TILE
    ph = phase_buf
    cy = jax.lax.bitcast_convert_type(cycle_buf, i32)
    am = abuf
    if active is None:
        act = (jnp.arange(B, dtype=i32)
               < jnp.asarray(length, i32)).astype(i32)
    else:
        act = active.astype(i32)
    if pad:
        ph = jnp.concatenate([ph, jnp.zeros(pad, f32)])
        cy = jnp.concatenate([cy, jnp.zeros(pad, i32)])
        am = jnp.concatenate([am, jnp.zeros(pad, f32)])
        act = jnp.concatenate([act, jnp.zeros(pad, i32)])
    n_tiles = (B + pad) // TILE
    sf = jnp.stack([jnp.asarray(prev_s, f32), jnp.asarray(fb_s, f32)])

    def smem(n):
        return pl_.BlockSpec((n,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM)

    key = (TILE, func, line, int(level), int(alpha), int(oflags),
           bool(interpret))
    kern = _rasg_sm_kernels.get(key)
    if kern is None:
        kern = _rasg_selfmod_kernel_factory(TILE, func, line, level,
                                            alpha, oflags)
        _rasg_sm_kernels[key] = kern
    tile_spec = pl_.BlockSpec((TILE,), lambda i: (i,),
                              memory_space=pltpu.SMEM)
    out, ofs = pl_.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, tile_spec, tile_spec,
                  smem(2)],
        out_specs=[tile_spec, smem(2)],
        out_shape=[jax.ShapeDtypeStruct((B + pad,), f32),
                   jax.ShapeDtypeStruct((2,), f32)],
        scratch_shapes=[pltpu.SMEM((2,), f32)],
        interpret=interpret,
    )(ph, cy, am, act, sf)
    return out[:B], ofs[0], ofs[1]


def rasg_selfmod_scan(func, line, level, alpha, oflags, phase_buf,
                      cycle_buf, abuf, prev_s, fb_s, length):
    """sauRasG_run_selfmod (rasg.h:242-294, 764-772) as a scan."""
    # noise lines (ncl/nhl/uwh, >= 10) reinterpret float bits as a
    # PRNG seed -- Mosaic has no scalar f32<->i32 bitcast, so those
    # combos stay on the lax.scan path
    if (phase_buf.ndim == 1 and selfmod_kernel_available()
            and isinstance(func, int) and isinstance(oflags, int)
            and isinstance(line, int) and line < 10):
        return _rasg_selfmod_pallas(func, line, level, alpha, oflags,
                                    phase_buf, cycle_buf, abuf,
                                    prev_s, fb_s, length)

    def step(carry, xs):
        ps, fb, i = carry
        phase0, cyc0, am = xs
        pm_a = fb * am * np.float32(0.5)
        phase = phase0 + pm_a
        cycle_adj = jnp.floor(phase).astype(i32)
        cycle = (cyc0.astype(i32) + cycle_adj).astype(u32)
        phase = phase - cycle_adj.astype(f32)
        cv = jnp.reshape(cycle, (1,))
        a, b = rasg_map(func, level, alpha, oflags, cv)
        s = rasg_shape(line, oflags,
                       jnp.reshape(phase, (1,)), a, b)[0]
        active = i < length
        fb_n = jnp.where(active, (fb + s + ps) * np.float32(0.5), fb)
        ps_n = jnp.where(active, s, ps)
        return (ps_n, fb_n, i + 1), jnp.where(active, s, np.float32(0))

    (ps, fb, _), out = jax.lax.scan(
        step, (prev_s, fb_s, jnp.int32(0)),
        (phase_buf, cycle_buf, abuf))
    return out, ps, fb


# -- noise generator ---------------------------------------------------------

def noise_run(ntype, n0, nprev, length, B):
    """sauNoiseG_run (noise.h:177-185). Returns (out, new_prev).
    Static (python int) ntype prunes to one color at trace time."""
    idx = jnp.arange(B, dtype=u32)
    n = n0 + idx
    mask = jnp.arange(B, dtype=i32) < length
    li = jnp.maximum(length - 1, 0)

    def t_wh():
        return asi32(ranfast32(n)).astype(f32) * SCALE31, nprev

    def t_gw():
        return franssgauss32(n), nprev

    def _sbin():
        return (asi32(ranfast32(n)) >> 31) * 2 + 1

    def t_bw():
        return _sbin().astype(f32), nprev

    def t_tw():
        odd = (n & np.uint32(1)).astype(bool)
        return jnp.where(odd, _sbin().astype(f32), np.float32(0)), \
            nprev

    def t_re():
        inc = jnp.where(mask, asu32(asi32(ranfast32(n)) >> 6),
                        np.uint32(0))
        sums = nprev + prefix_sum(inc)
        out = asi32(foldhd32(sums)).astype(f32) * SCALE31
        return out, jnp.where(length > 0, sums[li], nprev)

    def t_vi():
        r = ranfast32(n)
        s0v = jnp.concatenate([jnp.reshape(nprev, (1,)), r[:-1]])
        out = asi32(r // np.uint32(2)
                    - s0v // np.uint32(2)).astype(f32) * SCALE31
        return out, jnp.where(length > 0, r[li], nprev)

    def t_bv():
        odd = (n & np.uint32(1)).astype(bool)
        sb1 = jnp.where(odd, _sbin(), 0)
        sb0 = jnp.concatenate([jnp.reshape(asi32(nprev), (1,)),
                               sb1[:-1]])
        out = (sb1 - sb0).astype(f32)
        return out, jnp.where(length > 0, asu32(sb1[li]), nprev)

    fns = [t_wh, t_gw, t_bw, t_tw, t_re, t_vi, t_bv]
    if isinstance(ntype, int):
        return fns[ntype]()
    pairs = [f() for f in fns]
    out = select_by(ntype, [p[0] for p in pairs])
    new_prev = select_by(ntype, [p[1] for p in pairs])
    return out, new_prev


# -- Pallas table gather (TPU) -------------------------------------------------
#
# TPU has no fast vector gather; XLA lowers table lookups to serialized
# scalar loads (~30 ns/element + ~0.7 ms fixed, measured on v5e) and
# Mosaic compiles of gather ops take minutes. The oscillator needs 4
# Hermite taps per sample, so lookups are the hot path. This kernel
# turns the lookup into an MXU one-hot matmul: one-hot rows are exact
# in bfloat16, and the float32 tap matrix is split into three bfloat16
# components (exact: 8+8+8 mantissa bits), so
#   taps = onehot @ [T1|T2|T3]  summed per component
# reproduces the float32 table values exactly.

_tap_mats = None


def _build_tap_mats():
    """(12, 256, 128) f32: per wave, tapmat[hi, k*8+lo] = component k
    of PILUT cell hi*8+lo, where the 12 components are the taps
    s[-1..2] each split into 3 bf16-exact pieces [t1(4) | t2(4) |
    t3(4)] (so the MXU's default f32->bf16 input truncation is
    lossless; bf16 storage itself would force a slow VPU relayout).
    The 256/8 split minimizes the kernel's VPU mask work (the
    bottleneck -- measured 2.25 ms per 2M samples vs 2.40 for 64/32
    and 2.54 for 128/16 on v5e): the lo-select compare+mul runs on
    12*8 = 96 lanes (padded to 128) instead of 256/384."""
    global _tap_mats
    if _tap_mats is not None:
        return _tap_mats
    import ml_dtypes
    _, piluts = W.get_tables()
    piluts = np.asarray(piluts)
    idx = np.arange(2048)
    taps = np.stack([piluts[:, (idx + k) & 2047] for k in (-1, 0, 1, 2)],
                    axis=-1)  # (12, 2048, 4) f32
    t1 = taps.astype(ml_dtypes.bfloat16).astype(np.float32)
    r = taps - t1
    t2 = r.astype(ml_dtypes.bfloat16).astype(np.float32)
    t3 = (r - t2)
    comp = np.concatenate([t1, t2, t3], axis=-1)   # (12, 2048, 12)
    # [w, hi*8+lo, k] -> [w, hi, k*8+lo], padded to 128 lanes
    m = comp.reshape(12, 256, 8, 12).transpose(0, 1, 3, 2) \
        .reshape(12, 256, 96)
    mats = np.concatenate(
        [m, np.zeros((12, 256, 32), np.float32)], axis=-1) \
        .astype(np.float32)
    # host array: inlined as an HLO literal under trace (a captured
    # device array costs ~25 ms per sync on the dev-rig runtime)
    _tap_mats = mats
    return _tap_mats


def _gather_taps_pallas(cells, tapmat):
    """cells: (B,) int32 in [0, 2048); tapmat: (256, 128) f32, laid
    out tapmat[hi, k*8+lo] = component k of cell hi*8+lo (lanes
    96..127 zero pad), values bf16-exact. Returns (8, B) f32 with the
    4 exact f32 taps of each cell in rows 0..3 (rows 4..7 zero). B:
    multiple of TILE.

    Two-level MXU gather: a 2048-wide one-hot matmul costs 2048 MACs
    per lookup; splitting the cell index into hi (256) and lo (8)
    does one 256-wide one-hot dot to fetch all 8 lo-candidates, masks
    by the lo one-hot, and reduces candidate groups with a constant
    0/1 matrix. The reduction matrix sums the three bf16-exact
    components of each tap directly (the components are
    non-overlapping truncations of one f32 value, so any accumulation
    order is exact), making the second dot an 8-row matmul and the
    kernel's HBM output small. The kernel is VPU-mask-bound, so the
    narrow 96-lane lo-select beats wider splits (measured 2.15 ms per
    2M samples vs 2.40 for 64/32 and 2.54 for 128/16 on v5e)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = cells.shape[0]
    TILE = 16384  # samples per kernel invocation
    ROWS = 2048   # samples per one-hot dot (TILE//ROWS >= 8 sublanes)
    grid = (B // TILE,)
    cells2 = cells.reshape(B // ROWS, ROWS)
    # component k = limb*4 + tap (see _build_tap_mats); row t sums all
    # limbs of tap t over the 8-wide lo-group: g[t, k*8+lo] = 1 iff
    # k % 4 == t. The second dot contracts on BOTH operands' minor
    # axis so the output lands transposed (taps x samples): tap rows
    # slice for free downstream (column slices of a (B, ...) result
    # cost ~100 us each as strided kLoop fusions on v5e).
    g = np.zeros((8, 128), np.float32)
    for k in range(12):
        g[k % 4, k * 8:(k + 1) * 8] = 1.0
    gmat = g  # host array -> HLO literal under trace

    def kernel(idx_ref, t_ref, g_ref, out_ref):
        # rows of ROWS indices; no reshapes (Mosaic-unfriendly)
        col8 = jax.lax.broadcasted_iota(i32, (ROWS, 128), 1) \
            % np.int32(8)
        for r in range(TILE // ROWS):
            idx = idx_ref[r, :]
            hi = idx >> np.int32(3)
            lo = idx & np.int32(7)
            oh = (jax.lax.broadcasted_iota(i32, (ROWS, 256), 1)
                  == hi[:, None]).astype(f32)
            cand = jnp.dot(oh, t_ref[:], preferred_element_type=f32)
            sel = (col8 == lo[:, None]).astype(f32)
            out_ref[:, r * ROWS:(r + 1) * ROWS] = jax.lax.dot_general(
                g_ref[:], cand * sel, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((TILE // ROWS, ROWS),
                               lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((256, 128),
                               lambda i: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128),
                               lambda i: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, TILE),
                               lambda i: (np.int32(0), i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), f32),
    )(cells2, tapmat, gmat)


# -- Pallas window lane-gather (TPU, default) ---------------------------------
#
# Mosaic lowers 2D ``jnp.take_along_axis(x, idx, axis=1)`` to
# ``tpu.dynamic_gather`` -- a VPU cross-lane gather within each
# 128-lane row, at any sublane count. A 2048-cell PILUT is 16 lane
# windows of 128; per tap the kernel gathers every window at the
# sample's low 7 index bits and select-accumulates by the high 4 bits
# (the 16-way where chain). No bf16 limb split (values move as raw
# f32 bits), no MXU dots, no mask matmuls. Measured on v5e: 0.29 ns
# per sample-tap-set vs 1.06 for the one-hot MXU kernel -- 3.7x --
# and bit-exact. The fused variant also evaluates the df64 Hermite
# in-kernel (phases in, Is hi/lo out): 0.32 ns per sample for the
# whole Is computation vs 1.11 for kernel+XLA-fusion, and bitwise
# identical to the XLA df64 chain (same IEEE f32 ops, same order).

_win_tabs = None
_W_TILE = 16384


def _build_window_tabs():
    """(12, 16, 128) f32: per wave, the raw f32 PILUT split into 16
    contiguous 128-lane windows (tab[w, l] = pilut[w*128 + l])."""
    global _win_tabs
    if _win_tabs is not None:
        return _win_tabs
    _, piluts = W.get_tables()
    # host array: inlined as an HLO literal under trace (a captured
    # device array costs ~25 ms per sync on the dev-rig runtime)
    _win_tabs = np.asarray(piluts, np.float32).reshape(12, 16, 128)
    return _win_tabs


_win_tabs4 = None


def _build_window_tabs4():
    """(12, 16, 128) f32 mod-4 interleaved window tables: row j*4+h
    holds class-j entries (pilut indices === j mod 4) for lane window
    h, i.e. tabs4[w, j*4+h, l] = pilut[w, 4*(128*h + l) + j]. Same
    exact f32 values, re-laid so _window_taps4_body needs one lane
    gather per (class, window) -- 16 instead of 64."""
    global _win_tabs4
    if _win_tabs4 is not None:
        return _win_tabs4
    _, piluts = W.get_tables()
    pil = np.asarray(piluts, np.float32)           # (12, 2048)
    # (12, 512, 4) -> classes minor; transpose to (12, 4, 512)
    byclass = pil.reshape(12, 512, 4).transpose(0, 2, 1)
    _win_tabs4 = np.ascontiguousarray(
        byclass.reshape(12, 4, 4, 128).reshape(12, 16, 128))
    return _win_tabs4


def _lane_gather(x, idx):
    """out[r, l] = x[r, idx[r, l]] -- the 2D lane-dim dynamic gather
    Mosaic lowers to ``tpu.dynamic_gather``. Built directly on
    lax.gather with i32 indices (jnp.take_along_axis mints int64
    index math under jax_enable_x64, which Mosaic rejects)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,),
        start_index_map=(1,), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    return jax.lax.gather(
        x, idx[:, :, None].astype(i32), dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _window_taps_body(tab_ref, cell, R, taps_needed=4):
    """Kernel body, plain layout: 4 Hermite taps (cells cell-1..
    cell+2) via 16-window lane gathers; cell: (R, 128) i32 in
    [0, 2048). 64 gathers + 64 selects -- kept for the
    SAUGNS_TPU_TAPS4=0 fallback and microbenches; production uses
    the mod-4 interleaved body below (4x fewer gathers)."""
    taps = []
    for t in range(taps_needed):
        c = (cell + np.int32(t - 1)) & np.int32(2047)
        hi = c >> np.int32(7)
        lo = c & np.int32(127)
        acc = jnp.zeros((R, 128), f32)
        for w in range(16):
            tw = jnp.broadcast_to(tab_ref[w, :][None, :], (R, 128))
            g = _lane_gather(tw, lo)
            acc = jnp.where(hi == np.int32(w), g, acc)
        taps.append(acc)
    return taps


def _use_taps4():
    """Mod-4 interleaved tap tables (default). Trace-time knob; set
    SAUGNS_TPU_TAPS4=0 before first engine use to restore the plain
    16-window layout."""
    return os.environ.get('SAUGNS_TPU_TAPS4', '1') == '1'


def _window_taps4_body(tab4_ref, cell, R):
    """Kernel body, mod-4 interleaved layout: the 4 Hermite taps are
    4 CONSECUTIVE pilut entries m..m+3 (m = cell-1 mod 2048), so they
    hit each residue class mod 4 exactly once. With the table split
    into 4 class-tables T_j[k] = pilut[4k+j] (512 entries = 4 lane
    windows each), each class needs ONE gather per window: 16 lane
    gathers total instead of 64 (the gather loop was ~90% of the
    fused kernel's compute, tools/bench_kernel_split.py). The class
    holding tap t is (r+t) mod 4 where r = m mod 4; its quotient is
    base + (j < r), wrapping mod 512 exactly as the flat index wraps
    mod 2048. Fetched values are the same f32 table entries in the
    same positions -- bit-identical taps."""
    m = (cell + np.int32(2047)) & np.int32(2047)
    r = m & np.int32(3)
    base = m >> np.int32(2)                       # [0, 512)
    g = []
    for j in range(4):
        q = base + jnp.where(r > np.int32(j), np.int32(1),
                             np.int32(0))
        q = q & np.int32(511)
        hi = q >> np.int32(7)
        lo = q & np.int32(127)
        acc = jnp.zeros((R, 128), f32)
        for h in range(4):
            tw = jnp.broadcast_to(tab4_ref[j * 4 + h, :][None, :],
                                  (R, 128))
            gg = _lane_gather(tw, lo)
            acc = jnp.where(hi == np.int32(h), gg, acc)
        g.append(acc)
    # tap_t = g[(r + t) & 3]
    m1 = r == np.int32(1)
    m2 = r == np.int32(2)
    m3 = r == np.int32(3)
    taps = []
    for t in range(4):
        v = g[t & 3]
        v = jnp.where(m1, g[(t + 1) & 3], v)
        v = jnp.where(m2, g[(t + 2) & 3], v)
        v = jnp.where(m3, g[(t + 3) & 3], v)
        taps.append(v)
    return taps


def _taps_body(tab_ref, cell, R):
    """Dispatch: interleaved (default) or plain window body. The
    caller must pass the MATCHING table (_window_tab(wave))."""
    if _use_taps4():
        return _window_taps4_body(tab_ref, cell, R)
    return _window_taps_body(tab_ref, cell, R)


def _window_tab(wave):
    """The (16, 128) window table matching _taps_body's layout."""
    if _use_taps4():
        return _build_window_tabs4()[wave]
    return _build_window_tabs()[wave]


def _flatten_batch(call, out_rows):
    """custom_vmap rule factory: a vmapped window-kernel call runs as
    ONE flat kernel over batch*samples instead of a batched grid --
    the sample axis is the only thing the kernel cares about, the
    batched lowering multiplies Mosaic compile time (a 32-wide vmap
    of the bank body spent 20+ minutes in kernel compiles), and one
    flat shape shares one compiled kernel across every consumer."""
    def rule(axis_size, in_batched, data, tab):
        assert not in_batched[1], 'window table must be unbatched'
        if not in_batched[0]:
            out = call(data, tab)
            return out, False
        V, B = data.shape
        out = call(data.reshape(V * B), tab)
        out = jnp.moveaxis(out.reshape(out_rows, V, B), 1, 0)
        return out, True
    return rule


def _gather_taps_window(cells, tab):
    """cells: (B,) i32 in [0, 2048), B a multiple of _W_TILE;
    tab: (16, 128) f32 window table. Returns (4, B) f32 exact taps."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    # np table -> trace-time literal; in EAGER use (validators,
    # bench self-check) the conversion makes it an argument so all
    # 12 waves share one compiled kernel instead of minting 12
    # literal-specialized executables
    tab = jnp.asarray(tab)
    B = cells.shape[0]
    TILE = _W_TILE
    R = TILE // 128

    def kernel(idx_ref, tab_ref, out_ref):
        taps = _taps_body(tab_ref, idx_ref[:, :], R)
        for t in range(4):
            out_ref[t, :, :] = taps[t]

    out = pl.pallas_call(
        kernel,
        grid=(B // TILE,),
        in_specs=[pl.BlockSpec((R, 128),
                               lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, 128),
                               lambda i: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, R, 128),
                               lambda i: (np.int32(0), i, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, B // 128, 128), f32),
    )(cells.reshape(B // 128, 128), tab)
    return out.reshape(4, B)


def _gather_is_window(ph_i32, tab):
    """Fused Is: phases (B,) i32-bitcast u32, B a multiple of _W_TILE;
    returns (2, B) f32 -- the df64 (hi, lo) pair of Is(phase), bitwise
    identical to gather_taps + _herp_df64 (same ops, same order)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    tab = jnp.asarray(tab)  # literal under trace, shared arg eagerly
    B = ph_i32.shape[0]
    TILE = _W_TILE
    R = TILE // 128

    def kernel(ph_ref, tab_ref, out_ref):
        ph = ph_ref[:, :]
        cell = jax.lax.shift_right_logical(ph, np.int32(SLENBITS))
        x = (ph & np.int32(W.SLENMASK)).astype(f32) * X_SCALE
        taps = _taps_body(tab_ref, cell, R)
        h, l = _herp_df64(taps[0], taps[1], taps[2], taps[3], x)
        out_ref[0, :, :] = h
        out_ref[1, :, :] = l

    out = pl.pallas_call(
        kernel,
        grid=(B // TILE,),
        in_specs=[pl.BlockSpec((R, 128),
                               lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, 128),
                               lambda i: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, R, 128),
                               lambda i: (np.int32(0), i, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, B // 128, 128), f32),
    )(ph_i32.reshape(B // 128, 128), tab)
    return out.reshape(2, B)


# vmap flattens into the sample axis (see _flatten_batch)
_gather_taps_window = jax.custom_batching.custom_vmap(
    _gather_taps_window)
_gather_taps_window.def_vmap(_flatten_batch(_gather_taps_window, 4))
_gather_is_window = jax.custom_batching.custom_vmap(_gather_is_window)
_gather_is_window.def_vmap(_flatten_batch(_gather_is_window, 2))


# -- Pallas forward fill (TPU) -------------------------------------------------
#
# out[i] = s[j] at the last valid j <= i (seed if none): the flat
# form of wosc's pd == 0 hold. The XLA formulation is a lax.cond
# between a 1-shift fast path and a log-depth associative scan; under
# vmap (voice banks) cond lowers to select and BOTH branches always
# execute -- the scan tree's per-level slice/pad kernels round-trip
# HBM and dominated a 1024-voice render (2.4 s of `slice` out of
# 4.1 s device busy). This kernel does the whole fill in one pass:
# within-tile log-doubling entirely in VMEM (pltpu.roll lane/sublane
# shifts), cross-tile via a scalar carry in SMEM scratch (TPU grid
# iterations run sequentially). Produces the scan ("slow") semantics
# at every position, which is what the flat path needs.

def _flat_shift(x, k, R, fill, mask_head=True):
    """y[i] = x[i-k] over the row-major (R, 128) flat order; the
    first k positions get ``fill``. k: a power of two (so it is
    either a pure lane shift or a pure row shift). mask_head=False
    skips the head fill -- valid when the caller overwrites those
    positions anyway (the fused kernel's k=1 shifts patch position 0
    with the cross-tile carry immediately after)."""
    from jax.experimental.pallas import tpu as pltpu
    lanes = k % 128
    rows = k // 128
    y = x
    if lanes:
        a = pltpu.roll(y, np.int32(lanes), 1)
        b = pltpu.roll(a, np.int32(1), 0)
        lane = jax.lax.broadcasted_iota(i32, (R, 128), 1)
        y = jnp.where(lane >= np.int32(lanes), a, b)
    if rows:
        y = pltpu.roll(y, np.int32(rows), 0)
    if not mask_head:
        return y
    idx = (jax.lax.broadcasted_iota(i32, (R, 128), 0) * np.int32(128)
           + jax.lax.broadcasted_iota(i32, (R, 128), 1))
    return jnp.where(idx >= np.int32(k), y, fill)


def _ffill_kernel_factory(TILE, tpv):
    from jax.experimental import pallas as pl
    R = TILE // 128

    def kernel(s_ref, m_ref, seeds_ref, out_ref, carry_ref):
        gi = pl.program_id(0)
        v = gi // np.int32(tpv)
        start = (gi % np.int32(tpv)) == 0
        carry = jnp.where(start, seeds_ref[v], carry_ref[0])
        val = s_ref[:, :]
        f = (m_ref[:, :] != 0).astype(f32)
        # log-doubling: after the loop, val[i] = s at the last valid
        # j <= i within the tile, f[i] = any valid <= i. Slots with
        # f == 0 may hold garbage; the final select masks them.
        k = 1
        while k < TILE:
            v2 = _flat_shift(val, k, R, np.float32(0.0))
            f2 = _flat_shift(f, k, R, np.float32(0.0))
            take = f == np.float32(0.0)
            val = jnp.where(take, v2, val)
            f = jnp.where(take, f2, f)
            k *= 2
        out = jnp.where(f != np.float32(0.0), val, carry)
        out_ref[:, :] = out
        row = jax.lax.broadcasted_iota(i32, (R, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (R, 128), 1)
        is_last = (row == np.int32(R - 1)) & (lane == np.int32(127))
        carry_ref[0] = jnp.sum(jnp.where(is_last, out,
                                         np.float32(0.0)))
    return kernel


def _forward_fill_flat(s, m_i32, seeds, tpv):
    """s, m: (N,) f32/i32 with N a multiple of _W_TILE; seeds: (V,)
    f32, one per ``tpv``-tile span. Returns the filled (N,)."""
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    N = s.shape[0]
    TILE = _W_TILE
    R = TILE // 128
    grid = (N // TILE,)
    nv = seeds.shape[0]
    out = pl_.pallas_call(
        _ffill_kernel_factory(TILE, tpv),
        grid=grid,
        in_specs=[pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
                  pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
                  pl_.BlockSpec((nv,), lambda i: (np.int32(0),),
                                memory_space=pltpu.SMEM)],
        out_specs=pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), f32),
        scratch_shapes=[pltpu.SMEM((1,), f32)],
    )(s.reshape(N // 128, 128), m_i32.reshape(N // 128, 128), seeds)
    return out.reshape(N)


def forward_fill_last_valid(s, valid, seed):
    """Scan-semantics forward fill of a flat buffer: out[i] = s at the
    last j <= i with valid[j], else ``seed``. Pallas kernel on TPU;
    the XLA associative scan elsewhere. Under vmap the batch flattens
    into one kernel launch with per-row seeds and carry resets at row
    boundaries (rows are padded to tile multiples)."""
    if _on_tpu() and _tap_kernel_mode() == 'window':
        return _ffill_entry(s, valid.astype(i32), seed.astype(f32))
    v0 = jnp.where(valid, s, seed)
    vals, _ = jax.lax.associative_scan(
        lambda a, b: (jnp.where(b[1], b[0], a[0]), a[1] | b[1]),
        (v0, valid))
    return vals


@jax.custom_batching.custom_vmap
def _ffill_entry(s, m, seed):
    N = s.shape[0]
    pad = (-N) % _W_TILE
    if pad:
        s = jnp.concatenate([s, jnp.zeros(pad, f32)])
        m = jnp.concatenate([m, jnp.zeros(pad, i32)])
    out = _forward_fill_flat(s, m, jnp.reshape(seed, (1,)),
                             (N + pad) // _W_TILE)
    return out[:N]


@_ffill_entry.def_vmap
def _ffill_vmap(axis_size, in_batched, s, m, seed):
    sb, mb, eb = in_batched
    if not sb:
        out = _ffill_entry(s, m, seed)
        return out, False
    if not mb:
        m = jnp.broadcast_to(m[None], s.shape)
    V, N = s.shape
    pad = (-N) % _W_TILE
    if pad:
        s = jnp.concatenate([s, jnp.zeros((V, pad), f32)], axis=1)
        m = jnp.concatenate([m, jnp.zeros((V, pad), i32)], axis=1)
    seeds = seed.astype(f32) if eb else \
        jnp.broadcast_to(jnp.reshape(seed, (1,)).astype(f32), (V,))
    out = _forward_fill_flat(s.reshape(V * (N + pad)),
                             m.reshape(V * (N + pad)),
                             seeds, (N + pad) // _W_TILE)
    return out.reshape(V, N + pad)[:, :N], True


# -- fused wosc sample + fill kernel (TPU) -------------------------------------
#
# The K_WRUN stage previously ran as: fused-Is Pallas kernel ->
# ~30 XLA elementwise ops (shifted-Is pairing, head/reset scatters,
# df64 diff chain) -> forward-fill Pallas kernel, plus custom_vmap
# moveaxis transposes of the (2, V, B) Is pairs. On a 1024-voice bank
# that shape was launch-bound: ~465k kernel executions per render with
# ~0.5 s of inter-launch gaps (docs/ROUND4-NOTES.md). This kernel does
# the WHOLE sample path in one pass -- window tap gathers, df64
# Hermite, shifted-Is diff (the previous sample's Is is this kernel's
# own previous lane, carried across tiles in SMEM), head/reset
# patching from per-row SMEM seeds, and the pd == 0 forward fill --
# reading one i32 phase per sample and writing one f32 sample.
# Bitwise identical to the composed path (same IEEE f32 ops in the
# same order); tiles are sized to the row (voice) length so vmapped
# banks flatten with zero padding.

# max tile for the fused sample+fill kernel: 4x the window-kernel
# tile. Grid steps cost ~0.4-0.5 us each in DMA/sync bookkeeping;
# at 16384 a 2.1M-sample call spent ~20% of its wall in the 128
# step boundaries. 65536 (R=512) keeps the kernel's ~15 live
# (R, 128) f32 temporaries ~4 MiB, well under the 16 MiB scoped
# VMEM limit the compiler enforces.
_F_TILE = 65536


def _tile_for(n):
    """Fused-kernel tile for row length n: the largest multiple of
    1024 (8 f32 sublanes x 128 lanes) <= _F_TILE that divides n, so
    padded rows cost nothing; when n is not a multiple of 1024, the
    smallest power-of-2 roundup (pad < half a tile)."""
    if n % 1024 == 0:
        for m in range(min(n, _F_TILE) // 1024, 0, -1):
            if n % (m * 1024) == 0:
                return m * 1024
    t = 1024
    while t < n and t < _F_TILE:
        t *= 2
    return t


def _wosc_fill_factory(TILE, tpv, dvs, dvo):
    from jax.experimental import pallas as pl
    R = TILE // 128

    def kernel(ph_ref, pp_ref, ish_ref, isl_ref, ps_ref, fi_ref,
               drst_ref, rph_ref, rh_ref, rl_ref, tab_ref, out_ref,
               cf_ref):
        gi = pl.program_id(0)
        v = gi // np.int32(tpv)
        ti = gi % np.int32(tpv)
        start = ti == 0
        ph = ph_ref[:, :]
        cell = jax.lax.shift_right_logical(ph, np.int32(SLENBITS))
        x = (ph & np.int32(W.SLENMASK)).astype(f32) * X_SCALE
        taps = _taps_body(tab_ref, cell, R)
        h2, l2 = _herp_df64(taps[0], taps[1], taps[2], taps[3], x)
        # shifted-Is pairing: Is(p_prev[i]) == Is(ph[i-1]); position 0
        # takes the row seed (tile 0) or the cross-tile carry -- the
        # pos0 patch below overwrites the head, so the shifts skip
        # their head fill
        h1 = _flat_shift(h2, 1, R, np.float32(0.0), mask_head=False)
        l1 = _flat_shift(l2, 1, R, np.float32(0.0), mask_head=False)
        php = _flat_shift(ph, 1, R, np.int32(0), mask_head=False)
        ch = jnp.where(start, ish_ref[v], cf_ref[0])
        cl = jnp.where(start, isl_ref[v], cf_ref[1])
        cfill = jnp.where(start, ps_ref[v], cf_ref[2])
        # phase carry rides as two exact f32 halfword limbs: Mosaic's
        # i32 reduce lowering re-traces jnp.sum under the ambient
        # config, minting i64 when jax_enable_x64 is on
        carry_ph = (cf_ref[4].astype(i32) << np.int32(16)) \
            | cf_ref[3].astype(i32)
        cph = jnp.where(start, pp_ref[v], carry_ph)
        row = jax.lax.broadcasted_iota(i32, (R, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (R, 128), 1)
        pos0 = (row == np.int32(0)) & (lane == np.int32(0))
        h1 = jnp.where(pos0, ch, h1)
        l1 = jnp.where(pos0, cl, l1)
        php = jnp.where(pos0, cph, php)
        # unconsumed reset: the row's first ACTIVE sample (row-relative
        # index fi, not necessarily 0) pairs with rst_prev instead
        # (wosc.h:215-231)
        ridx = ti * np.int32(TILE) + row * np.int32(128) + lane
        match = (ridx == fi_ref[v]) & (drst_ref[v] != np.int32(0))
        h1 = jnp.where(match, rh_ref[v], h1)
        l1 = jnp.where(match, rl_ref[v], l1)
        php = jnp.where(match, rph_ref[v], php)
        # s = DVSCALE * (Is2 - Is1) / pd + DVOFFSET (wosc.h:238-266)
        pd = ph - php
        valid = pd != np.int32(0)
        pdf = jnp.where(valid, pd, np.int32(1)).astype(f32)
        xf = np.float32(dvs) / pdf
        dh, dl = _df_add(h2, l2, -h1, -l1)
        mh, ml = _df_mul_f(dh, dl, xf)
        sh, sl = _df_add(mh, ml, np.float32(dvo), np.float32(0.0))
        s = sh + sl
        # cross-tile carries: only element [R-1, 127] matters, so
        # reduce a (1, 128) last-row slice instead of the full tile
        # (5 full-tile masked reductions were ~5 extra passes)
        lane1 = jax.lax.broadcasted_iota(i32, (1, 128), 1)
        lastl = lane1 == np.int32(127)

        def last_elem(row1):
            return jnp.sum(jnp.where(lastl, row1, np.float32(0.0)))

        cf_ref[0] = last_elem(h2[R - 1:R, :])
        cf_ref[1] = last_elem(l2[R - 1:R, :])
        ph_last = ph[R - 1:R, :]
        cf_ref[3] = last_elem((ph_last & np.int32(0xffff)).astype(f32))
        cf_ref[4] = last_elem(jax.lax.shift_right_logical(
            ph_last, np.int32(16)).astype(f32))
        # pd == 0 hold: forward fill (log-doubling in VMEM, carry in
        # SMEM -- same scheme as _ffill_kernel_factory). A tile with
        # no holds -- the overwhelmingly common case: any audible
        # frequency advances the phase every sample -- skips the
        # ~log2(TILE) shift/select rounds entirely (pl.when); the
        # fill is the identity there, so outputs stay bitwise equal.
        # -13% kernel time measured (tools/bench_fused_variants.py).
        nhold = jnp.sum(jnp.where(valid, np.float32(0.0),
                                  np.float32(1.0)))

        @pl.when(nhold == np.float32(0.0))
        def _():
            out_ref[:, :] = s
            cf_ref[2] = last_elem(s[R - 1:R, :])

        @pl.when(nhold != np.float32(0.0))
        def _():
            val = jnp.where(valid, s, np.float32(0.0))
            f = valid.astype(f32)
            k = 1
            while k < TILE:
                v2 = _flat_shift(val, k, R, np.float32(0.0))
                f2 = _flat_shift(f, k, R, np.float32(0.0))
                take = f == np.float32(0.0)
                val = jnp.where(take, v2, val)
                f = jnp.where(take, f2, f)
                k *= 2
            out = jnp.where(f != np.float32(0.0), val, cfill)
            out_ref[:, :] = out
            cf_ref[2] = last_elem(out[R - 1:R, :])
    return kernel


def _wosc_fill_flat(ph, pp, ish, isl, ps, fi, drst, rph, rh, rl,
                    tab, tpv, TILE, dvs, dvo):
    """ph: (N,) i32-bitcast phases, N a multiple of TILE; per-row
    seed arrays of length V = N // (tpv*TILE). Returns (N,) f32
    filled samples."""
    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu
    N = ph.shape[0]
    R = TILE // 128
    nv = pp.shape[0]

    def smem(n):
        return pl_.BlockSpec((n,), lambda i: (np.int32(0),),
                             memory_space=pltpu.SMEM)

    out = pl_.pallas_call(
        _wosc_fill_factory(TILE, tpv, dvs, dvo),
        grid=(N // TILE,),
        in_specs=[pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM)]
        + [smem(nv)] * 9
        + [pl_.BlockSpec((16, 128),
                         lambda i: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM)],
        out_specs=pl_.BlockSpec((R, 128),
                                lambda i: (i, np.int32(0)),
                                memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), f32),
        scratch_shapes=[pltpu.SMEM((5,), f32)],
    )(ph.reshape(N // 128, 128), pp, ish, isl, ps, fi, drst, rph,
      rh, rl, tab)
    return out.reshape(N)


_wosc_fill_entries = {}


def _get_wosc_fill_entry(wave: int):
    ent = _wosc_fill_entries.get(wave)
    if ent is not None:
        return ent
    dvs = np.float32(W.dvscale(wave))
    dvo = np.float32(W.dvoffset(wave))

    def call_flat(ph, scalars, tab, tpv, TILE):
        return _wosc_fill_flat(ph, *scalars, tab=tab, tpv=tpv,
                               TILE=TILE, dvs=dvs, dvo=dvo)

    @jax.custom_batching.custom_vmap
    def entry(ph, pp, ish, isl, ps, fi, drst, rph, rh, rl, tab):
        N = ph.shape[0]
        TILE = _tile_for(N)
        pad = (-N) % TILE
        if pad:
            ph = jnp.concatenate([ph, jnp.zeros(pad, i32)])
        scalars = tuple(jnp.reshape(a, (1,)) for a in
                        (pp, ish, isl, ps, fi, drst, rph, rh, rl))
        out = call_flat(ph, scalars, tab, (N + pad) // TILE, TILE)
        return out[:N]

    @entry.def_vmap
    def rule(axis_size, in_batched, ph, pp, ish, isl, ps, fi, drst,
             rph, rh, rl, tab):
        assert not in_batched[10], 'window table must be unbatched'
        if not in_batched[0]:
            return entry(ph, pp, ish, isl, ps, fi, drst, rph, rh,
                         rl, tab), False
        V, N = ph.shape
        TILE = _tile_for(N)
        pad = (-N) % TILE
        if pad:
            ph = jnp.concatenate(
                [ph, jnp.zeros((V, pad), i32)], axis=1)
        scalars = []
        for a, b in zip((pp, ish, isl, ps, fi, drst, rph, rh, rl),
                        in_batched[1:10]):
            scalars.append(a if b else
                           jnp.broadcast_to(jnp.reshape(a, (1,)),
                                            (V,)))
        out = call_flat(ph.reshape(V * (N + pad)), tuple(scalars),
                        tab, (N + pad) // TILE, TILE)
        return out.reshape(V, N + pad)[:, :N], True

    _wosc_fill_entries[wave] = entry
    return entry


def fused_fill_available():
    """Whether the one-pass wosc sample+fill kernel is active (TPU
    window mode; SAUGNS_TPU_FUSED_FILL=0 restores the composed
    Is-kernel + XLA chain + fill-kernel path)."""
    return _fused_is_available() \
        and os.environ.get('SAUGNS_TPU_FUSED_FILL', '1') == '1' \
        and use_fused_osc()


def wosc_s_filled(wave: int, ph_u32, pp_in, prev_s, first_ir,
                  do_rst, rst_prev):
    """Filled oscillator output for a flat phase buffer in ONE Pallas
    pass: equivalent to wosc_s_shifted(...) followed by
    forward_fill_last_valid(s_raw, valid, prev_s) -- bitwise (same
    IEEE f32 op sequence). ``first_ir``/``do_rst``/``rst_prev``: the
    unconsumed-reset patch position and pairing phase (wosc.h:215-231).
    Under vmap the batch flattens into one kernel launch with per-row
    SMEM seeds (zero padding when the row length is a tile multiple).
    """
    hp, lp = _Is_df64(wave, pp_in)
    hr, lr = _Is_df64(wave, rst_prev)
    # literal under trace, shared arg eagerly (see _gather_taps_window)
    tab = jnp.asarray(_window_tab(wave))
    ent = _get_wosc_fill_entry(wave)
    return ent(jax.lax.bitcast_convert_type(ph_u32, i32),
               jax.lax.bitcast_convert_type(pp_in, i32),
               hp, lp, prev_s.astype(f32) if hasattr(prev_s, 'astype')
               else jnp.float32(prev_s),
               first_ir.astype(i32), do_rst.astype(i32),
               jax.lax.bitcast_convert_type(rst_prev, i32), hr, lr,
               tab)


def salt_zero(salt):
    """Always +0.0f, but unfoldable: the per-call salt must stay live
    in the compiled executable so the dev-rig runtime's identical-call
    replay cache never hits (a folded `salt * 0` lets XLA prune the
    parameter, making repeat renders byte-identical calls that the
    runtime answers from cache with microsecond walls). The
    optimization barrier blocks constant propagation; min(abs(x), 0)
    needs range analysis XLA does not do."""
    sb = jax.lax.optimization_barrier(salt.astype(f32)
                                      if hasattr(salt, 'astype')
                                      else jnp.float32(salt))
    return jnp.minimum(jnp.abs(sb), np.float32(0.0))


def _tap_kernel_mode():
    """'window' (default) or 'onehot' (SAUGNS_TPU_TAPKERNEL)."""
    return os.environ.get('SAUGNS_TPU_TAPKERNEL', 'window')


def _fused_is_available():
    return _on_tpu() and _tap_kernel_mode() == 'window'


def _gather_is_fused(ph_u32, wave: int):
    """Fused-kernel Is for a phase buffer (TPU window mode only)."""
    B = ph_u32.shape[0]
    pad = (-B) % _W_TILE
    ph_i = jax.lax.bitcast_convert_type(ph_u32, i32)
    if pad:
        ph_i = jnp.concatenate([ph_i, jnp.zeros(pad, i32)])
    out = _gather_is_window(ph_i, _window_tab(wave))
    return out[0, :B], out[1, :B]


def _on_tpu():
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def use_fused_osc():
    """Whether the K_WRUN sample path uses the shifted-Is df64 chain
    (TPU only; SAUGNS_TPU_FUSED_OSC=0 restores the two-point
    XLA-f64 chain; =force enables it off-TPU for validation).
    Evaluated at trace time -- set before first engine use."""
    v = os.environ.get('SAUGNS_TPU_FUSED_OSC', '1')
    if v == 'force':
        return True
    return _on_tpu() and v == '1'


def gather_taps(cells, wave):
    """Hermite taps for each cell index as rows: (4, B) with rows
    (s[-1], s0, s1, s2); exact float32 table values. ``wave`` must be
    a python int (the planner bakes it per epoch). Uses the Pallas
    window lane-gather kernel on TPU (SAUGNS_TPU_TAPKERNEL=onehot
    restores the MXU one-hot kernel), plain indexing elsewhere."""
    assert isinstance(wave, int)
    if _on_tpu():
        B = cells.shape[0]
        pad = (-B) % 16384
        cp = jnp.concatenate([cells, jnp.zeros(pad, i32)]) if pad \
            else cells
        if _tap_kernel_mode() == 'window':
            return _gather_taps_window(
                cp, _window_tab(wave))[:, :B]
        mats = _build_tap_mats()
        return _gather_taps_pallas(
            cp, jnp.asarray(mats[wave]))[0:4, :B]
    _, piluts = get_tables()
    pilut = jnp.asarray(piluts[wave])  # np -> trace-time literal
    c = cells[None, :] + jnp.arange(-1, 3, dtype=i32)[:, None]
    return pilut[c & LENMASK]


def _padded_pilut(wave: int):
    """pilut row padded so taps(cell) = padded[cell:cell+4]."""
    _, piluts = get_tables()
    row = piluts[wave]
    return jnp.concatenate([row[-1:], row, row[:2]])


def taps_at(cell, wave: int):
    """Taps for one dynamic cell index (4,)."""
    return jax.lax.dynamic_slice(_padded_pilut(wave),
                                 (cell.astype(i32),), (4,))


def _coeffs_from_taps(taps):
    """c1, c2, c3 from row-major taps (4, ...), difference form (exact
    in f32 for smooth tables; see _hermite_coeffs)."""
    s0 = taps[0]
    s1 = taps[1]
    s2 = taps[2]
    s3 = taps[3]
    half = np.float32(0.5)
    d0 = s1 - s0
    d1 = s2 - s1
    d2 = s3 - s2
    c1 = half * (d0 + d1)
    c2 = np.float32(1.5) * d1 - d0 - half * d2
    c3 = half * (d0 + d2) - d1
    return c1, c2, c3


def wosc_cells(phase_buf):
    """Cell indices for a phase buffer (for batched tap gathers)."""
    return (phase_buf >> SLENBITS).astype(i32)


def wosc_run_taps(wave: int, phase_buf, prev_phase, prev_s, reset,
                  length, taps2=None):
    """Vectorized sauWOsc_run with plan-static wave: one MXU tap
    gather per block; the previous sample's taps are the shifted
    current taps. Sample math is the reference-exact float64 chain
    (_wosc_s64). ``taps2``: pre-gathered tap rows for
    wosc_cells(phase_buf) (the engine batches same-level gathers into
    one kernel call). Returns (out, new_prev_phase, new_prev_s)."""
    B = phase_buf.shape[0]
    idx = jnp.arange(B, dtype=i32)
    p0 = phase_buf[0] - np.uint32(W.SLEN)
    pp = jnp.where(reset, p0, prev_phase)
    p_prev = jnp.concatenate([jnp.reshape(pp, (1,)), phase_buf[:-1]])
    if use_fused_osc():
        s_raw, valid = wosc_s_shifted(wave, phase_buf, p_prev, pp,
                                      taps2=taps2)
    else:
        pd = asi32(phase_buf - p_prev)
        cells2 = wosc_cells(phase_buf)
        if taps2 is None:
            taps2 = gather_taps(cells2, wave)            # (4, B)
        ptaps = taps_at(pp >> SLENBITS, wave)
        taps1 = jnp.concatenate([jnp.reshape(ptaps, (4, 1)),
                                 taps2[:, :-1]], axis=1)
        x1 = (p_prev & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
        x2 = (phase_buf & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
        s_raw, valid = _wosc_s64(wave, pd, x1, x2, taps1, taps2)
    out = forward_fill_valid(s_raw, valid, prev_s, length)
    has = length > 0
    li = jnp.maximum(length - 1, 0)
    new_pp = jnp.where(has, phase_buf[li], prev_phase)
    new_ps = jnp.where(has, out[li], prev_s)
    return out, new_pp, new_ps


def wosc_pairs(wave: int, p_prev, p_cur):
    """Stateless oscillator output for (prev, cur) phase pairs of any
    shape (flattened internally; pads to the Pallas tile size). Used
    by the bulk-polyphony path where phases are closed-form."""
    shape = p_cur.shape
    pp = p_prev.reshape(-1)
    pc = p_cur.reshape(-1)
    n = pc.shape[0]
    pad = (-n) % 2048
    if pad:
        pp = jnp.concatenate([pp, jnp.zeros(pad, u32)])
        pc = jnp.concatenate([pc, jnp.zeros(pad, u32)])
    cells1 = (pp >> SLENBITS).astype(i32)
    cells2 = (pc >> SLENBITS).astype(i32)
    taps = gather_taps(jnp.concatenate([cells1, cells2]), wave)
    taps1 = taps[:, :cells1.shape[0]]
    taps2 = taps[:, cells1.shape[0]:]
    s = _diff_from_taps(wave, pp, pc, taps1, taps2)
    if pad:
        s = s[:n]
    return s.reshape(shape)


def _diff_from_taps(wave: int, p_prev, p_cur, taps1, taps2):
    """Compensated, cancellation-free oscillator sample from phase
    pairs and their Hermite taps (shared core of wosc_run_taps)."""
    pd = asi32(p_cur - p_prev)
    x1 = (p_prev & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    x2 = (p_cur & np.uint32(W.SLENMASK)).astype(f32) * X_SCALE
    c1a, c2a, c3a = _coeffs_from_taps(taps1)
    c1b, c2b, c3b = _coeffs_from_taps(taps2)
    one = np.float32(1.0)
    diff_scale = np.float32(W.dvscale(wave))
    diff_offset = np.float32(W.dvoffset(wave))
    valid = pd != 0
    pdf = jnp.where(valid, pd, 1).astype(f32)
    xf = diff_scale / pdf
    q3 = x2 * x2 + x1 * x2 + x1 * x1
    q2 = x2 + x1
    t3h, t3l = _two_prod(c3a, q3)
    t2h, t2l = _two_prod(c2a, q2)
    bh, be = _two_sum(t3h, t2h)
    bh, be2 = _two_sum(bh, c1a)
    b_lo = be + be2 + t3l + t2l
    m_same = (x2 - x1)
    head_h, head_l = _horner_diff(c1b, c2b, c3b, x2)
    tailb = (c3a * (one + x1 + x1 * x1) + c2a * (one + x1) + c1a)
    th, tl = _two_prod(one - x1, tailb)
    mh, ml = _two_sum(taps2[1], -taps1[2])
    dh, de = _two_sum(head_h, th)
    dh, de2 = _two_sum(dh, mh)
    d_lo = de + de2 + head_l + tl + ml
    i1 = (p_prev >> SLENBITS).astype(i32)
    i2 = (p_cur >> SLENBITS).astype(i32)
    same_cell = i1 == i2
    dIs_h = jnp.where(same_cell, bh * m_same, dh)
    dIs_l = jnp.where(same_cell, b_lo * m_same, d_lo)
    ph, pe = _two_prod(dIs_h, xf)
    lo = pe + dIs_l * xf
    sh, se = _two_sum(ph, diff_offset)
    s = sh + (se + lo)
    return jnp.where(valid, s, np.float32(0.0))


# -- Pallas prefix scans -------------------------------------------------------
#
# jax.lax.associative_scan lowers to ~log2(B) slice/pad/add rounds,
# each a separate XLA fusion with an HBM round trip; inside the
# per-block scan body those launches dominate. These kernels run the
# whole Hillis-Steele scan in VMEM: per-row scan along lanes, then a
# row-offset scan along sublanes.

def _scan_kernel_body(rows, combine, identity, y):
    """In-kernel inclusive scan of y (R, 128) in flattened row-major
    order."""
    from jax.experimental.pallas import tpu as pltpu
    R = rows
    lane = jax.lax.broadcasted_iota(i32, (R, 128), 1)
    k = 1
    while k < 128:
        sh = tuple(pltpu.roll(v, np.int32(k), 1) for v in y)
        sh = tuple(jnp.where(lane >= k, s, i_)
                   for s, i_ in zip(sh, identity))
        y = combine(y, sh)
        k *= 2
    # row offsets: scan of row totals (lane 127) along sublanes
    row = jax.lax.broadcasted_iota(i32, (R, 128), 0)
    tot = tuple(jnp.broadcast_to(v[:, 127:128], (R, 128)) for v in y)
    c = tot
    k = 1
    while k < R:
        sh = tuple(pltpu.roll(v, np.int32(k), 0) for v in c)
        sh = tuple(jnp.where(row >= k, s, i_)
                   for s, i_ in zip(sh, identity))
        c = combine(c, sh)
        k *= 2
    # callers derive exclusive offsets as inclusive row scan minus
    # the row's own total (or shifted rows for non-invertible combines)
    return y, c, tot


def _pallas_scan_add_u32(x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = x.shape[0]
    R = B // 128

    def kernel(x_ref, o_ref):
        y = (x_ref[:].reshape(R, 128),)
        ident = (jnp.zeros((R, 128), u32),)
        comb = lambda a, b: (a[0] + b[0],)
        y, c, tot = _scan_kernel_body(R, comb, ident, y)
        out = y[0] + (c[0] - tot[0])
        o_ref[:] = out.reshape(B)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B,), u32))(x)


def _pallas_scan_add_u64(x_lo, x_hi):
    """64-bit prefix sum as (lo, hi) u32 planes with exact carries."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = x_lo.shape[0]
    R = B // 128

    K = np.uint32(0x80000000)

    def ult(a, b):
        # Mosaic lowers u32 '<' as signed; bias to get unsigned compare
        return asi32(a ^ K) < asi32(b ^ K)

    def add64(a, b):
        lo = a[0] + b[0]
        carry = ult(lo, a[0]).astype(u32)
        hi = a[1] + b[1] + carry
        return (lo, hi)

    def sub64(a, b):
        lo = a[0] - b[0]
        borrow = ult(a[0], b[0]).astype(u32)
        hi = a[1] - b[1] - borrow
        return (lo, hi)

    def kernel(lo_ref, hi_ref, olo_ref, ohi_ref):
        y = (lo_ref[:].reshape(R, 128), hi_ref[:].reshape(R, 128))
        ident = (jnp.zeros((R, 128), u32), jnp.zeros((R, 128), u32))
        y, c, tot = _scan_kernel_body(R, add64, ident, y)
        offs = sub64(c, tot)
        out = add64(y, offs)
        olo_ref[:] = out[0].reshape(B)
        ohi_ref[:] = out[1].reshape(B)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B,), u32),
                   jax.ShapeDtypeStruct((B,), u32)))(x_lo, x_hi)


def _pallas_scan_max_i32(x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = x.shape[0]
    R = B // 128

    # For max, the exclusive row offset is the inclusive row scan
    # shifted by one row; build it with an extra roll inside:
    def kernel2(x_ref, o_ref):
        from jax.experimental.pallas import tpu as pltpu
        y = x_ref[:].reshape(R, 128)
        lane = jax.lax.broadcasted_iota(i32, (R, 128), 1)
        k = 1
        while k < 128:
            sh = pltpu.roll(y, np.int32(k), 1)
            y = jnp.maximum(y, jnp.where(lane >= k, sh, 0))
            k *= 2
        row = jax.lax.broadcasted_iota(i32, (R, 128), 0)
        tot = jnp.broadcast_to(y[:, 127:128], (R, 128))
        # exclusive row max: shift totals down one row, then scan
        prev = jnp.where(row >= 1, pltpu.roll(tot, np.int32(1), 0), 0)
        k = 1
        while k < R:
            sh = pltpu.roll(prev, np.int32(k), 0)
            prev = jnp.maximum(prev, jnp.where(row >= k, sh, 0))
            k *= 2
        o_ref[:] = jnp.maximum(y, prev).reshape(B)

    return pl.pallas_call(
        kernel2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B,), i32))(x)


def _use_pallas_scan():
    import os
    return os.environ.get('SAUGNS_TPU_PALLAS_SCAN', '0') == '1'


def cumsum_u32(x):
    """Inclusive u32 prefix sum (wrapping)."""
    if _use_pallas_scan() and _on_tpu() and x.shape[0] % 1024 == 0:
        return _pallas_scan_add_u32(x)
    return jax.lax.associative_scan(jnp.add, x)


def cumsum_u64(x):
    """Inclusive u64 prefix sum (wrapping)."""
    if _use_pallas_scan() and _on_tpu() and x.shape[0] % 1024 == 0:
        lo = x.astype(u64) & np.uint64(0xffffffff)
        lo32 = lo.astype(u32)
        hi32 = (x >> np.uint64(32)).astype(u32)
        olo, ohi = _pallas_scan_add_u64(lo32, hi32)
        return olo.astype(u64) | (ohi.astype(u64) << np.uint64(32))
    return jax.lax.associative_scan(jnp.add, x)


def cummax_i32(x):
    """Inclusive i32 prefix max (values >= 0)."""
    if _use_pallas_scan() and _on_tpu() and x.shape[0] % 1024 == 0:
        return _pallas_scan_max_i32(x)
    return jax.lax.associative_scan(jnp.maximum, x)
