"""NumPy reference renderer: block-based event-timeline interpreter.

Exact behavioral port of sau/generator.c + sau/generator/{wosc,rasg,
noise}.h: per-block recursive evaluation of the operator DAG with a
buffer pool, integer phase accumulators, PILUT-differentiation
oscillators, random-segment and noise generators, value-range
modulation, pan mix, and int16 output.

This renderer is the correctness baseline the JAX/TPU engine
(render/engine.py) is differentially tested against.
"""
from __future__ import annotations

import numpy as np

import ctypes

from ..dsp import lines as L
from ..dsp import prim
from ..dsp import wavetables as W
from ..lang import program as P
from ..native import get_lib as _get_native
from .linestate import LineState


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))

f32 = np.float32
BUF_LEN = 1024

ON_INIT = 1 << 0
ON_VISITED = 1 << 1
ON_TIME_INF = 1 << 2

VN_INIT = 1 << 0


def ftoi_f32(x):
    """sau_ftoi on a float32 array -> int64 (wrap-around use)."""
    return np.rint(np.asarray(x, dtype=np.float64)).astype(np.int64)


def herp(lut, phase_u32):
    """Hermite 4-point LUT interpolation (sau/wave.h:127-141).
    Returns float64 array.  The coefficient subtractions (s2-s0),
    (s3-s0), (s1-s2) round in float32 exactly like the C, where the
    float operands are subtracted before the double constant
    multiplies widen the result -- bit-parity with the reference
    binary depends on it (FM chains integrate the derived sample)."""
    ind = (phase_u32 >> np.uint32(W.SLENBITS)).astype(np.int64)
    s0 = lut[(ind - 1) & W.LENMASK]
    s1 = lut[ind & W.LENMASK]
    s2 = lut[(ind + 1) & W.LENMASK]
    s3 = lut[(ind + 2) & W.LENMASK]
    x = (phase_u32 & np.uint32(W.SLENMASK)).astype(np.float64) \
        * np.float64(f32(1.0 / W.SLEN))
    c0 = s1.astype(np.float64)
    c1 = 0.5 * (s2 - s0).astype(np.float64)
    c2 = (s0.astype(np.float64) - 2.5 * s1.astype(np.float64)
          + (f32(2.0) * s2).astype(np.float64)
          - 0.5 * s3.astype(np.float64))
    c3 = (0.5 * (s3 - s0).astype(np.float64)
          + 1.5 * (s1 - s2).astype(np.float64))
    return ((c3 * x + c2) * x + c1) * x + c0


def herp_scalar(lut, phase):
    return float(herp(lut, np.array([phase], dtype=np.uint32))[0])


def lerp(lut, phase_u32):
    """Linear LUT interpolation (sau/wave.h:113-120)."""
    ind = (phase_u32 >> np.uint32(W.SLENBITS)).astype(np.int64)
    s0 = lut[ind & W.LENMASK].astype(np.float64)
    s1 = lut[(ind + 1) & W.LENMASK].astype(np.float64)
    x = (phase_u32 & np.uint32(W.SLENMASK)).astype(np.float64) \
        * np.float64(f32(1.0 / W.SLEN))
    return s0 + (s1 - s0) * x


# -- wave oscillator (sau/generator/wosc.h) ------------------------------------

OSC_RESET_DIFF = 1 << 0
OSC_RESET = (1 << 1) - 1


class WOsc:
    __slots__ = ('phase', 'coeff', 'wave', 'flags', 'prev_phase',
                 'prev_Is', 'prev_s', 'fb_s')

    def __init__(self, srate):
        self.phase = W.PICOEFFS[W.N_sin][2] & 0xffffffff
        self.coeff = float(f32(np.float64(4294967296.0) / srate))
        self.wave = W.N_sin
        self.flags = OSC_RESET
        self.prev_phase = 0
        self.prev_Is = 0.0
        self.prev_s = 0.0
        self.fb_s = 0.0

    def set_phase(self, phase):
        self.phase = (phase + W.PICOEFFS[self.wave][2]) & 0xffffffff

    def set_wave(self, wave):
        old_offset = W.PICOEFFS[self.wave][2] & 0xffffffff
        offset = W.PICOEFFS[wave][2] & 0xffffffff
        self.phase = (self.phase + offset - old_offset) & 0xffffffff
        self.wave = wave
        self.flags |= OSC_RESET_DIFF

    def phasor_fill(self, length, freq, pm, fpm):
        """sauPhasor_fill (wosc.h:135-169). Pre-incremented phase.
        Returns uint32[length] and advances state."""
        fpm_scale = f32(1.0 / prim.HUMMID)
        coeff = f32(self.coeff)
        incs = ftoi_f32(coeff * freq.astype(f32)).astype(np.uint32)
        run = np.cumsum(incs, dtype=np.uint32) + np.uint32(self.phase)
        if pm is None and fpm is None:
            ofs = np.uint32(0)
        elif fpm is None:
            ofs = ftoi_f32(pm.astype(f32) * f32(2147483648.0)).astype(np.uint32)
        elif pm is None:
            s_pofs = fpm.astype(f32) * fpm_scale * freq.astype(f32)
            ofs = ftoi_f32(s_pofs * f32(2147483648.0)).astype(np.uint32)
        else:
            s_pofs = pm.astype(f32) + (fpm.astype(f32) * fpm_scale
                                       * freq.astype(f32))
            ofs = ftoi_f32(s_pofs * f32(2147483648.0)).astype(np.uint32)
        out = ofs + run
        self.phase = int(run[-1]) if length > 0 else self.phase
        return out

    def _reset(self, phase0):
        """sauWOsc_reset (wosc.h:215-231)."""
        lut = W.get_tables()[1][self.wave]
        diff_scale = W.dvscale(self.wave)
        diff_offset = W.dvoffset(self.wave)
        if self.flags & OSC_RESET_DIFF:
            phase_diff = W.SLEN
            self.prev_Is = herp_scalar(lut, (phase0 - phase_diff)
                                       & 0xffffffff)
            Is = herp_scalar(lut, phase0)
            x = float(f32(diff_scale) / f32(phase_diff))
            self.prev_s = float(f32((Is - self.prev_Is) * x + diff_offset))
            self.prev_Is = Is
            self.prev_phase = phase0
        self.flags &= ~OSC_RESET

    def run(self, phase_buf):
        """sauWOsc_run PILUT path (wosc.h:238-266). Returns f32 array."""
        length = len(phase_buf)
        if length == 0:
            return np.zeros(0, dtype=f32)
        if self.flags & OSC_RESET:
            self._reset(int(phase_buf[0]))
        lib = _get_native()
        if lib is not None:
            out = np.empty(length, dtype=f32)
            pb = np.ascontiguousarray(phase_buf, dtype=np.uint32)
            pp = np.array([self.prev_phase], dtype=np.uint32)
            pIs = np.array([self.prev_Is], dtype=np.float64)
            ps = np.array([self.prev_s], dtype=f32)
            lib.wosc_run(_f32p(out), _u32p(pb), length,
                         _f32p(W.get_tables()[1][self.wave]),
                         ctypes.c_float(W.dvscale(self.wave)),
                         ctypes.c_float(W.dvoffset(self.wave)),
                         _u32p(pp),
                         pIs.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_double)),
                         _f32p(ps))
            self.prev_phase = int(pp[0])
            self.prev_Is = float(pIs[0])
            self.prev_s = float(ps[0])
            return out
        lut = W.get_tables()[1][self.wave]
        diff_scale = W.dvscale(self.wave)
        diff_offset = W.dvoffset(self.wave)
        ext = np.empty(length + 1, dtype=np.uint32)
        ext[0] = self.prev_phase
        ext[1:] = phase_buf
        d = (ext[1:] - ext[:-1]).view(np.int32)
        Is = herp(lut, phase_buf)
        Is_prev = np.empty(length, dtype=np.float64)
        Is_prev[0] = self.prev_Is
        Is_prev[1:] = Is[:-1]
        valid = d != 0
        with np.errstate(divide='ignore', invalid='ignore', over='ignore'):
            # C: double x = (diff_scale / phase_diff) -- float division
            x = (f32(diff_scale) / d.astype(f32)).astype(np.float64)
        s_raw = ((Is - Is_prev) * x + diff_offset).astype(f32)
        # forward-fill invalid (phase_diff == 0) positions with prev s
        s = np.empty(length + 1, dtype=f32)
        s[0] = f32(self.prev_s)
        s[1:] = s_raw
        # forward fill: position i takes s at the last valid j <= i
        # (index 0 = carried prev_s)
        last_valid = np.maximum.accumulate(
            np.where(valid, np.arange(1, length + 1), 0))
        out = s[last_valid]
        # update state from last valid sample
        if valid.any():
            li = int(np.nonzero(valid)[0][-1])
            self.prev_Is = float(Is[li])
            self.prev_s = float(out[-1])
            self.prev_phase = int(phase_buf[li])
        return out

    def run_selfmod(self, phase_buf, pm_abuf):
        """sauWOsc_run_selfmod (wosc.h:273-310). Scalar recurrence."""
        length = len(phase_buf)
        out = np.zeros(length, dtype=f32)
        if length == 0:
            return out
        if self.flags & OSC_RESET:
            self._reset(int(phase_buf[0]))
        lib = _get_native()
        if lib is not None:
            pb = np.ascontiguousarray(phase_buf, dtype=np.uint32)
            ab = np.ascontiguousarray(pm_abuf, dtype=f32)
            pp = np.array([self.prev_phase], dtype=np.uint32)
            pIs = np.array([self.prev_Is], dtype=np.float64)
            ps = np.array([self.prev_s], dtype=f32)
            fb = np.array([self.fb_s], dtype=f32)
            lib.wosc_run_selfmod(
                _f32p(out), _u32p(pb), length, _f32p(ab),
                _f32p(W.get_tables()[1][self.wave]),
                ctypes.c_float(W.dvscale(self.wave)),
                ctypes.c_float(W.dvoffset(self.wave)), _u32p(pp),
                pIs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                _f32p(ps), _f32p(fb))
            self.prev_phase = int(pp[0])
            self.prev_Is = float(pIs[0])
            self.prev_s = float(ps[0])
            self.fb_s = float(fb[0])
            return out
        lut = W.get_tables()[1][self.wave]
        diff_scale = W.dvscale(self.wave)
        diff_offset = W.dvoffset(self.wave)
        fb_scale = float(f32(2147483648.0))
        fb_s = f32(self.fb_s)
        prev_phase = self.prev_phase
        prev_Is = self.prev_Is
        prev_s = f32(self.prev_s)
        pm_a = pm_abuf.astype(f32)
        for i in range(length):
            adj = int(np.rint(np.float64(f32(fb_s * pm_a[i]) * fb_scale)))
            phase = (int(phase_buf[i]) + adj) & 0xffffffff
            phase_diff = phase - prev_phase
            if phase_diff >= 0x80000000:
                phase_diff -= 0x100000000
            elif phase_diff < -0x80000000:
                phase_diff += 0x100000000
            if phase_diff == 0:
                s = prev_s
            else:
                Is = herp_scalar(lut, phase)
                x = float(f32(diff_scale) / f32(phase_diff))
                s = f32((Is - prev_Is) * x + diff_offset)
                prev_Is = Is
                prev_s = s
                prev_phase = phase
            out[i] = s
            fb_s = f32((fb_s + s) * f32(0.5))
        self.fb_s = float(fb_s)
        self.prev_phase = prev_phase
        self.prev_Is = prev_Is
        self.prev_s = float(prev_s)
        return out


# -- random segments oscillator (sau/generator/rasg.h) --------------------------

class RasG:
    __slots__ = ('cycle_phase', 'coeff', 'rate2x', 'line', 'func', 'level',
                 'alpha', 'opt_flags', 'prev_s', 'fb_s')

    def __init__(self, srate):
        self.cycle_phase = 0  # u64
        self.coeff = float(f32(np.float64(4294967296.0) / srate))
        self.rate2x = True
        self.line = L.N_lin
        self.func = P.RAS_F_URAND
        self.level = P.ras_level(9)
        self.alpha = prim.FIBH32
        self.opt_flags = 0
        self.prev_s = 0.0
        self.fb_s = 0.0

    # cycle/phase get/set (rasg.h:59-92)
    def get_cycle(self):
        return (self.cycle_phase >> 32) & ~1 & 0xffffffff

    def get_phase(self):
        v = (self.cycle_phase >> 1) if self.rate2x else self.cycle_phase
        return v & 0xffffffff

    def set_cycle(self, cycle):
        phase = self.get_phase()
        phase64 = (phase << 1) if self.rate2x else phase
        self.cycle_phase = (((cycle & ~1) & 0xffffffff) << 32 | phase64) \
            & 0xffffffffffffffff

    def set_phase(self, phase):
        cycle = self.get_cycle()
        phase64 = (phase << 1) if self.rate2x else phase
        self.cycle_phase = ((cycle << 32) | phase64) & 0xffffffffffffffff

    def set_opt(self, opt):
        """sauRasG_set_opt (rasg.h:97-119)."""
        flags = opt.flags
        if opt.flags & P.RAS_O_LINE_SET:
            self.line = opt.line
        if opt.flags & P.RAS_O_FUNC_SET:
            self.func = opt.func
        else:
            flags |= self.opt_flags
        if opt.flags & P.RAS_O_LEVEL_SET:
            self.level = opt.level
        if opt.flags & P.RAS_O_ASUBVAL_SET:
            self.alpha = opt.alpha
        self.opt_flags = flags
        rate2x = not (flags & P.RAS_O_HALFSHAPE)
        if rate2x != self.rate2x:
            cycle = self.get_cycle()
            phase = self.get_phase()
            self.rate2x = rate2x
            self.set_cycle(cycle)
            self.set_phase(phase)

    def cyclor_fill(self, length, freq, pm, fpm):
        """sauCyclor_fill (rasg.h:165-222). Post-incremented.
        Returns (cycle_u32, phase_f32)."""
        fpm_scale = f32(1.0 / prim.HUMMID)
        coeff = f32(self.coeff)
        phase_scale = f32(2147483648.0)
        if self.rate2x:
            coeff = coeff * f32(2)
            phase_scale = phase_scale * f32(2)
        incs = ftoi_f32(coeff * freq.astype(f32)).astype(np.uint64)
        base = np.uint64(self.cycle_phase) + np.concatenate(
            [np.zeros(1, dtype=np.uint64),
             np.cumsum(incs, dtype=np.uint64)[:-1]])
        if pm is None and fpm is None:
            ofs = np.uint64(0)
        elif fpm is None:
            ofs = ftoi_f32(pm.astype(f32) * phase_scale).astype(np.uint64)
        elif pm is None:
            s_pofs = fpm.astype(f32) * fpm_scale * freq.astype(f32)
            ofs = ftoi_f32(s_pofs * phase_scale).astype(np.uint64)
        else:
            s_pofs = pm.astype(f32) + (fpm.astype(f32) * fpm_scale
                                       * freq.astype(f32))
            ofs = ftoi_f32(s_pofs * phase_scale).astype(np.uint64)
        cycle_phase = ofs + base
        if length > 0:
            # u64 wraparound is intended (the reference's cycle_phase
            # accumulator wraps, rasg.h:29-33); do it in Python ints
            # so NumPy's scalar-overflow RuntimeWarning never fires
            self.cycle_phase = (int(self.cycle_phase)
                                + int(np.sum(incs, dtype=np.uint64))) \
                & 0xffffffffffffffff
        cycle = (cycle_phase >> np.uint64(32)).astype(np.uint32)
        phase = (cycle_phase.astype(np.uint32) >> np.uint32(1))
        phase_f = phase.view(np.int32).astype(f32) * f32((2.0**-31))
        return cycle, phase_f

    # -- map functions (rasg.h:296-683) -------------------------------------

    def _map(self, cycle):
        """Compute (end_a, end_b) float32 arrays from cycle numbers."""
        func = self.func
        fl = self.opt_flags
        lvl = self.level
        c = cycle.astype(np.uint32)
        u1 = np.uint32(1)
        if func == P.RAS_F_URAND:
            if fl & P.RAS_O_VIOLET:
                s0 = prim.np_ranfast32(c - u1) // np.uint32(2)
                s1 = prim.np_ranfast32(c) // np.uint32(2)
                s2 = prim.np_ranfast32(c + u1) // np.uint32(2)
                a = (s1 - s0).view(np.int32).astype(f32) * f32((2.0**-31))
                b = (s2 - s1).view(np.int32).astype(f32) * f32((2.0**-31))
            else:
                a = prim.np_ranfast32(c).view(np.int32).astype(f32) \
                    * f32((2.0**-31))
                b = prim.np_ranfast32(c + u1).view(np.int32).astype(f32) \
                    * f32((2.0**-31))
        elif func == P.RAS_F_GAUSS:
            a = _franssgauss32(c)
            b = _franssgauss32(c + u1)
        elif func == P.RAS_F_BIN:
            if fl & P.RAS_O_VIOLET:
                scale_diff = f32(1.0) - f32(
                    prim.sar32(0x7fffffff, lvl) / 2147483648.0)
                scale = (f32(1.0) + scale_diff * scale_diff) / f32(2147483648.0)
                sb = ((c & u1) << np.uint32(31))
                sb_flip = np.uint32(1 << 31) - sb
                s0 = _divi2(prim.np_sar32(prim.np_ranfast32(c - u1), lvl)
                            + sb)
                s1 = _divi2(prim.np_sar32(prim.np_ranfast32(c), lvl)
                            + sb_flip)
                s2 = _divi2(prim.np_sar32(prim.np_ranfast32(c + u1), lvl)
                            + sb)
                a = (s1 - s0).view(np.int32).astype(f32) * scale
                b = (s2 - s1).view(np.int32).astype(f32) * scale
            else:
                offs = np.uint32(0x7fffffff) + (c & u1) * np.uint32(2)
                s1 = prim.np_sar32(prim.np_ranfast32(c), lvl) + offs
                s2 = prim.np_sar32(prim.np_ranfast32(c + u1), lvl) - offs
                a = s1.view(np.int32).astype(f32) * f32((2.0**-31))
                b = s2.view(np.int32).astype(f32) * f32((2.0**-31))
        elif func == P.RAS_F_TERN:
            sb = ((c & u1) << np.uint32(31))
            sb_flip = np.uint32(1 << 31) - sb
            s1 = prim.np_sar32(prim.np_ranfast32(c), lvl) + sb_flip
            s2 = prim.np_sar32(prim.np_ranfast32(c + u1), lvl) + sb
            a = s1.view(np.int32).astype(f32) * f32((2.0**-31))
            b = s2.view(np.int32).astype(f32) * f32((2.0**-31))
        elif func == P.RAS_F_FIXED:
            sign = (1 - ((c & u1).astype(np.int32) * 2)).astype(np.int64)
            if self.level >= P.ras_level(9):
                a = sign.astype(f32)
                b = -a
            elif fl & P.RAS_O_VIOLET:
                imax = np.int64(0x7fffffff)
                r0 = (prim.np_ranfast32(c - u1).view(np.int32).astype(
                    np.int64) >> lvl) - imax
                r1 = (prim.np_ranfast32(c).view(np.int32).astype(
                    np.int64) >> lvl) - imax
                r2 = (prim.np_ranfast32(c + u1).view(np.int32).astype(
                    np.int64) >> lvl) - imax
                s0 = _divi2_i64(sign * r0)
                s1 = _divi2_i64(-sign * r1)
                s2 = _divi2_i64(sign * r2)
                a = (s1 - s0).astype(np.uint32).view(np.int32).astype(f32) \
                    * f32((2.0**-31))
                b = (s2 - s1).astype(np.uint32).view(np.int32).astype(f32) \
                    * f32((2.0**-31))
            else:
                imax = np.int64(0x7fffffff)
                r1 = (prim.np_ranfast32(c).view(np.int32).astype(
                    np.int64) >> lvl) - imax
                r2 = (prim.np_ranfast32(c + u1).view(np.int32).astype(
                    np.int64) >> lvl) - imax
                a = (-sign * r1).astype(np.uint32).view(np.int32).astype(
                    f32) * f32((2.0**-31))
                b = (sign * r2).astype(np.uint32).view(np.int32).astype(
                    f32) * f32((2.0**-31))
        elif func == P.RAS_F_ADDREC:
            alpha = np.uint32(self.alpha)
            s0 = c * alpha
            s1 = (c + u1) * alpha
            a = s0.view(np.int32).astype(f32) * f32((2.0**-31))
            b = s1.view(np.int32).astype(f32) * f32((2.0**-31))
        else:
            a = np.zeros(len(c), dtype=f32)
            b = np.zeros(len(c), dtype=f32)
        return a, b

    def run(self, main_buf, cycle_buf):
        """sauRasG_run (rasg.h:692-743): main_buf holds phase values,
        replaced by output. Returns f32 array."""
        a, b = self._map(cycle_buf)
        fl = self.opt_flags
        line = self.line
        phase = main_buf.astype(f32)
        if fl & P.RAS_O_PERLIN:
            perlin_amp = f32(1.0) if fl & (P.RAS_O_HALFSHAPE |
                                           P.RAS_O_ZIGZAG) \
                else L.PERLIN_AMP[line]
            a = a * (perlin_amp * phase)
            b = b * (perlin_amp * (phase - f32(1.0)))
        if fl & P.RAS_O_HALFSHAPE:
            hi = np.maximum(a, b)
            lo = np.minimum(a, b)
            a, b = hi, lo
        if fl & P.RAS_O_ZIGZAG:
            a, b = b, a
        if fl & P.RAS_O_SQUARE:
            a = a * np.abs(a)
            b = b * np.abs(b)
        return np.asarray(L.VAL_FUNCS[line](phase, a, b), dtype=f32)

    def run_selfmod(self, main_buf, cycle_buf, pm_abuf):
        """sauRasG_run_selfmod (rasg.h:764-772 + RASG_MAP_S_LOOP
        rasg.h:242-280). Scalar recurrence."""
        length = len(main_buf)
        out = np.zeros(length, dtype=f32)
        fl = self.opt_flags
        line = self.line
        val_f = L.VAL_FUNCS[line]
        perlin_amp = f32(1.0) if fl & (P.RAS_O_HALFSHAPE | P.RAS_O_ZIGZAG) \
            else L.PERLIN_AMP[line]
        fb_s = f32(self.fb_s)
        prev_s = f32(self.prev_s)
        pm_a_arr = pm_abuf.astype(f32)
        phase_arr = main_buf.astype(f32)
        for i in range(length):
            pm_a = f32(fb_s * pm_a_arr[i] * f32(0.5))
            phase = f32(phase_arr[i] + pm_a)
            cycle_adj = int(np.floor(phase))
            cycle = np.uint32((int(cycle_buf[i]) + cycle_adj) & 0xffffffff)
            phase = f32(phase - cycle_adj)
            ca = np.array([cycle], dtype=np.uint32)
            a, b = self._map(ca)
            a = a[0]
            b = b[0]
            if fl & P.RAS_O_PERLIN:
                a = f32(a * (perlin_amp * phase))
                b = f32(b * (perlin_amp * (phase - f32(1.0))))
            if fl & P.RAS_O_HALFSHAPE:
                hi = max(a, b)
                lo = min(a, b)
                a, b = hi, lo
            if fl & P.RAS_O_ZIGZAG:
                a, b = b, a
            if fl & P.RAS_O_SQUARE:
                a = f32(a * abs(a))
                b = f32(b * abs(b))
            s = f32(val_f(np.array([phase], dtype=f32),
                          np.array([a], dtype=f32),
                          np.array([b], dtype=f32))[0])
            out[i] = s
            fb_s = f32((fb_s + s + prev_s) * f32(0.5))
            prev_s = s
        self.fb_s = float(fb_s)
        self.prev_s = float(prev_s)
        return out


def _divi2(x_u32):
    """sau_divi(x, 2): int32 division by 2 (truncating), u32 in/out."""
    return (x_u32.view(np.int32) // np.int32(2) +
            (x_u32.view(np.int32) % np.int32(2) != 0).astype(np.int32) *
            (x_u32.view(np.int32) < 0).astype(np.int32)).view(np.uint32)


def _divi2_i64(x_i64):
    """C int32 division by 2 on value wrapped to int32 first."""
    x = x_i64.astype(np.uint32).view(np.int32).astype(np.int64)
    q = x // 2
    r = x - q * 2
    q = q + ((r != 0) & (x < 0)).astype(np.int64)
    return q


def _franssgauss32(n_u32):
    """sau_franssgauss32 (noise.h:61-98)."""
    s0 = prim.np_ranfast32(n_u32)
    s1 = prim.np_mcg32(s0)
    a = s0.view(np.int32).astype(f32) * f32((2.0**-32))
    b = s1.view(np.int32).astype(f32) * f32((2.0**-32))
    # soft_sqrtm2logp1_2_r01
    c0 = f32(-0.80270565422983103084)
    c1 = f32(+5.52274428214641442648)
    c2 = f32(-138.87126103150588693697)
    x2 = a * a
    x4 = x2 * x2
    c = f32(0.5) + a * (c0 + x4 * (c1 + x4 * c2))
    # ssgauss_dist4
    cx2 = c * c
    gx = (c + cx2) * f32(0.5)
    c = c * (f32(1.0) - gx * (f32(1.0) - cx2))
    return c * prim.np_sinpi_d5f(b)


# -- plain noise generator (sau/generator/noise.h) --------------------------------

class NoiseG:
    __slots__ = ('n', 'prev', 'type')

    def __init__(self):
        self.n = 0
        self.prev = 0
        self.type = 0

    def set_seed(self, seed):
        self.n = seed & 0xffffffff

    def set_noise(self, noise):
        self.type = noise
        self.prev = 0

    def run(self, length):
        t = self.type
        n = (np.uint32(self.n) + np.arange(length, dtype=np.uint32))
        scale31 = f32((2.0**-31))
        if t == P.NOISE_wh:
            out = prim.np_ranfast32(n).view(np.int32).astype(f32) * scale31
        elif t == P.NOISE_gw:
            out = _franssgauss32(n)
        elif t == P.NOISE_bw:
            s = prim.np_sar32(prim.np_ranfast32(n), 31).view(np.int32) \
                * np.int32(2) + np.int32(1)
            out = s.astype(f32)
        elif t == P.NOISE_tw:
            s = prim.np_sar32(prim.np_ranfast32(n), 31).view(np.int32) \
                * np.int32(2) + np.int32(1)
            out = np.where((n & np.uint32(1)).astype(bool),
                           s.astype(f32), f32(0.0))
        elif t == P.NOISE_re:
            s = prim.np_ranfast32(n).view(np.int32)
            inc = (s >> np.int32(6)).view(np.uint32)
            sums = np.uint32(self.prev) + np.cumsum(inc, dtype=np.uint32)
            folded = prim.np_foldhd32(sums).view(np.int32)
            out = folded.astype(f32) * scale31
            if length > 0:
                self.prev = int(sums[-1])
        elif t == P.NOISE_vi:
            s1 = prim.np_ranfast32(n)
            s0 = np.empty(length, dtype=np.uint32)
            s0[0] = self.prev
            s0[1:] = s1[:-1]
            out = (s1 // np.uint32(2) - s0 // np.uint32(2)).view(
                np.int32).astype(f32) * scale31
            if length > 0:
                self.prev = int(s1[-1])
        elif t == P.NOISE_bv:
            s1 = prim.np_sar32(prim.np_ranfast32(n), 31).view(np.int32)
            s1 = np.where((n & np.uint32(1)).astype(bool),
                          s1 * np.int32(2) + np.int32(1), np.int32(0))
            s0 = np.empty(length, dtype=np.int32)
            s0[0] = np.int32(self.prev - (1 << 32)
                             if self.prev & 0x80000000 else self.prev)
            s0[1:] = s1[:-1]
            out = (s1 - s0).astype(f32)
            if length > 0:
                self.prev = int(s1[-1]) & 0xffffffff
        else:
            out = prim.np_ranfast32(n).view(np.int32).astype(f32) * scale31
        self.n = (self.n + length) & 0xffffffff
        return out


# -- operator / voice nodes -----------------------------------------------------

class ParWithRangeMod:
    __slots__ = ('par', 'r_par', 'mods', 'r_mods')

    def __init__(self):
        self.par = LineState()
        self.r_par = LineState()
        self.mods = ()
        self.r_mods = ()


class OperatorNode:
    __slots__ = ('time', 'type', 'flags', 'amp', 'pan', 'camods',
                 'freq', 'pmods', 'fpmods', 'pm_a', 'apmods',
                 'wosc', 'rasg', 'noiseg')

    def __init__(self):
        self.time = 0
        self.type = 0
        self.flags = 0
        self.amp = ParWithRangeMod()
        self.pan = LineState()
        self.camods = ()
        self.freq = ParWithRangeMod()
        self.pmods = ()
        self.fpmods = ()
        self.pm_a = LineState()
        self.apmods = ()
        self.wosc = None
        self.rasg = None
        self.noiseg = None


class VoiceNode:
    __slots__ = ('duration', 'flags', 'freq_buf_id', 'carr_op_id')

    def __init__(self):
        self.duration = 0
        self.flags = 0
        self.freq_buf_id = 0
        self.carr_op_id = 0


class Generator:
    """Port of sauGenerator (sau/generator.c:116-973)."""

    def __init__(self, prg: P.Program, srate: int):
        self.srate = srate
        self.prg = prg
        self.gen_flags_out_clear = False
        self.gen_mix_add_max = 0
        n_bufs = (1 + prg.op_nest_depth) * 7
        self.gen_bufs = [np.zeros(BUF_LEN, dtype=f32)
                         for _ in range(n_bufs)]
        self.mix_l = np.zeros(BUF_LEN, dtype=f32)
        self.mix_r = np.zeros(BUF_LEN, dtype=f32)
        self.event = 0
        self.event_pos = 0
        self.voice = 0
        self.voices = [VoiceNode() for _ in range(prg.vo_count)]
        self.operators = [OperatorNode() for _ in range(prg.op_count)]
        amp_scale = f32(0.5) * f32(prg.ampmult)
        if prg.mode & P.PMODE_AMP_DIV_VOICES:
            amp_scale = f32(amp_scale / np.int32(max(prg.vo_count, 1)))
        self.amp_scale = float(amp_scale)
        carry = [0]
        self.ev_waits = [prim.ms_in_samples(e.wait_ms, srate, carry)
                         for e in prg.events]

    # -- event handling (generator.c:245-377) ---------------------------------

    def _prepare_op(self, n, vn, od):
        if od.use_type == P.POP_N_carr and vn is not None:
            vn.freq_buf_id = 0
        n.__init__()
        t = od.type
        n.type = t
        if t == P.POPT_WAVE:
            n.wosc = WOsc(self.srate)
            if od.use_type == P.POP_N_carr and vn is not None:
                vn.freq_buf_id = 3 - 1
        elif t == P.POPT_RASEG:
            n.rasg = RasG(self.srate)
            if od.use_type == P.POP_N_carr and vn is not None:
                vn.freq_buf_id = 4 - 1
        elif t == P.POPT_NOISE:
            n.noiseg = NoiseG()
        n.flags = ON_INIT

    def _update_op(self, n, od):
        params = od.params
        t = od.type
        if t == P.POPT_NOISE:
            if params & P.POPP_MODE:
                n.noiseg.set_noise(od.mode_main)
            if params & P.POPP_SEED:
                n.noiseg.set_seed(od.seed)
        elif t == P.POPT_WAVE:
            if params & P.POPP_MODE:
                n.wosc.set_wave(od.mode_main)
            if params & P.POPP_PHASE:
                n.wosc.set_phase(od.phase)
        elif t == P.POPT_RASEG:
            if params & P.POPP_MODE:
                n.rasg.set_opt(od.mode_ras)
            if params & P.POPP_PHASE:
                n.rasg.set_phase(od.phase)
            if params & P.POPP_SEED:
                n.rasg.set_cycle(od.seed)
        if t in (P.POPT_WAVE, P.POPT_RASEG):
            if od.fmods is not None:
                n.freq.mods = od.fmods
            if od.rfmods is not None:
                n.freq.r_mods = od.rfmods
            if od.pmods is not None:
                n.pmods = od.pmods
            if od.apmods is not None:
                n.apmods = od.apmods
            if od.fpmods is not None:
                n.fpmods = od.fpmods
            n.freq.par.copy_from(od.freq, self.srate)
            n.freq.r_par.copy_from(od.freq2, self.srate)
            n.pm_a.copy_from(od.pm_a, self.srate)
        if params & P.POPP_TIME:
            if od.time.flags & P.TIMEP_IMPLICIT:
                n.time = 0
                n.flags |= ON_TIME_INF
            else:
                n.time = prim.ms_in_samples(od.time.v_ms, self.srate)
                n.flags &= ~ON_TIME_INF
        if od.camods is not None:
            n.camods = od.camods
        if od.amods is not None:
            n.amp.mods = od.amods
        if od.ramods is not None:
            n.amp.r_mods = od.ramods
        n.amp.par.copy_from(od.amp, self.srate)
        n.amp.r_par.copy_from(od.amp2, self.srate)
        n.pan.copy_from(od.pan, self.srate)

    def _handle_event(self, ev_i):
        pe = self.prg.events[ev_i]
        vn = self.voices[pe.vo_id] if pe.vo_id != P.PVO_NO_ID else None
        for od in pe.op_data:
            n = self.operators[od.id]
            if not (n.flags & ON_INIT):
                self._prepare_op(n, vn, od)
            self._update_op(n, od)
        if vn is not None:
            vn.carr_op_id = pe.carr_op_id
            vn.flags |= VN_INIT
            if self.voice > pe.vo_id:
                self.voice = pe.vo_id
            # set voice duration (generator.c:233-240)
            gen = self.operators[vn.carr_op_id]
            vn.duration = gen.time

    # -- mixing helpers (generator.c:384-440) ----------------------------------

    @staticmethod
    def _block_mix(wave_env, layer, buf, length, in_buf, amp):
        if wave_env:
            s_amp = amp[:length] * f32(0.5)
            s = in_buf[:length] * s_amp + np.abs(s_amp)
            if layer:
                buf[:length] *= s
            else:
                buf[:length] = s
        else:
            if layer:
                buf[:length] += in_buf[:length] * amp[:length]
            else:
                buf[:length] = in_buf[:length] * amp[:length]

    # -- param with range modulation (generator.c:448-477) ----------------------

    def _run_param_with_rangemod(self, bufs, length, pwr, param_mulbuf,
                                 reused_freq, is_freq):
        par_buf = self.gen_bufs[bufs + 0]
        if reused_freq is not None:
            freq = reused_freq
        elif is_freq:
            freq = par_buf
        else:
            freq = None
        mb = param_mulbuf[:length] if param_mulbuf is not None else None
        par_buf[:length] = pwr.par.run(length, mb)
        if len(pwr.r_mods) > 0:
            r_par_buf = self.gen_bufs[bufs + 1]
            r_par_buf[:length] = pwr.r_par.run(length, mb)
            for i, mid in enumerate(pwr.r_mods):
                self._run_block(bufs + 2, length, self.operators[mid],
                                freq, True, i != 0)
            mod_buf = self.gen_bufs[bufs + 2]
            par_buf[:length] += (r_par_buf[:length] - par_buf[:length]) \
                * mod_buf[:length]
        else:
            pwr.r_par.skip(length)
        if len(pwr.mods) > 0:
            for mid in pwr.mods:
                self._run_block(bufs + 0, length, self.operators[mid],
                                freq, False, True)

    def _run_osc_selfmod_param(self, bufs, length, n, freq):
        """generator.c:479-498. Returns True if buffer filled."""
        buf_filled = False
        if n.pm_a.v0 != 0.0 or (n.pm_a.flags & P.LINEP_GOAL):
            self.gen_bufs[bufs][:length] = n.pm_a.run(length, None)
            buf_filled = True
        else:
            n.pm_a.skip(length)
        for mid in n.apmods:
            self._run_block(bufs, length, self.operators[mid], freq,
                            False, buf_filled)
            buf_filled = True
        return buf_filled

    # -- per-type block functions (generator.c:505-664) --------------------------

    def _run_block_amp(self, bufs, length, n, parent_freq, wave_env, layer):
        mix_buf = self.gen_bufs[bufs]
        self._run_param_with_rangemod(bufs + 1, length, n.amp, None,
                                      None, False)
        amp = self.gen_bufs[bufs + 1]
        tmp_buf = self.gen_bufs[bufs + 2]
        tmp_buf[:length] = f32(1.0)
        self._block_mix(wave_env, layer, mix_buf, length, tmp_buf, amp)

    def _run_block_noiseg(self, bufs, length, n, parent_freq, wave_env,
                          layer):
        mix_buf = self.gen_bufs[bufs]
        self._run_param_with_rangemod(bufs + 1, length, n.amp, None,
                                      None, False)
        amp = self.gen_bufs[bufs + 1]
        tmp_buf = self.gen_bufs[bufs + 2]
        tmp_buf[:length] = n.noiseg.run(length)
        self._block_mix(wave_env, layer, mix_buf, length, tmp_buf, amp)

    def _run_block_wosc(self, bufs, length, n, parent_freq, wave_env,
                        layer):
        mix_buf = self.gen_bufs[bufs]
        phase_buf_i = bufs + 1
        self._run_param_with_rangemod(bufs + 2, length, n.freq,
                                      parent_freq, None, True)
        freq = self.gen_bufs[bufs + 2]
        pm_buf = None
        fpm_buf = None
        if len(n.pmods) > 0:
            for i, mid in enumerate(n.pmods):
                self._run_block(bufs + 3, length, self.operators[mid],
                                freq, False, i != 0)
            pm_buf = self.gen_bufs[bufs + 3]
        if len(n.fpmods) > 0:
            for i, mid in enumerate(n.fpmods):
                self._run_block(bufs + 4, length, self.operators[mid],
                                freq, False, i != 0)
            fpm_buf = self.gen_bufs[bufs + 4]
        phase = n.wosc.phasor_fill(
            length, freq[:length],
            pm_buf[:length] if pm_buf is not None else None,
            fpm_buf[:length] if fpm_buf is not None else None)
        self._run_param_with_rangemod(bufs + 3, length, n.amp, None,
                                      freq, False)
        amp = self.gen_bufs[bufs + 3]
        tmp_buf = self.gen_bufs[bufs + 4]
        if self._run_osc_selfmod_param(bufs + 5, length, n, freq):
            selfmod = self.gen_bufs[bufs + 5]
            tmp_buf[:length] = n.wosc.run_selfmod(phase, selfmod[:length])
        else:
            tmp_buf[:length] = n.wosc.run(phase)
        self._block_mix(wave_env, layer, mix_buf, length, tmp_buf, amp)

    def _run_block_rasg(self, bufs, length, n, parent_freq, wave_env,
                        layer):
        mix_buf = self.gen_bufs[bufs]
        rasg_buf = self.gen_bufs[bufs + 2]
        self._run_param_with_rangemod(bufs + 3, length, n.freq,
                                      parent_freq, None, True)
        freq = self.gen_bufs[bufs + 3]
        pm_buf = None
        fpm_buf = None
        if len(n.pmods) > 0:
            for i, mid in enumerate(n.pmods):
                self._run_block(bufs + 4, length, self.operators[mid],
                                freq, False, i != 0)
            pm_buf = self.gen_bufs[bufs + 4]
        if len(n.fpmods) > 0:
            for i, mid in enumerate(n.fpmods):
                self._run_block(bufs + 5, length, self.operators[mid],
                                freq, False, i != 0)
            fpm_buf = self.gen_bufs[bufs + 5]
        cycle_buf, phase_f = n.rasg.cyclor_fill(
            length, freq[:length],
            pm_buf[:length] if pm_buf is not None else None,
            fpm_buf[:length] if fpm_buf is not None else None)
        rasg_buf[:length] = phase_f
        self._run_param_with_rangemod(bufs + 4, length, n.amp, None,
                                      freq, False)
        amp = self.gen_bufs[bufs + 4]
        if self._run_osc_selfmod_param(bufs + 5, length, n, freq):
            selfmod = self.gen_bufs[bufs + 5]
            rasg_buf[:length] = n.rasg.run_selfmod(
                rasg_buf[:length].copy(), cycle_buf, selfmod[:length])
        else:
            rasg_buf[:length] = n.rasg.run(rasg_buf[:length].copy(),
                                           cycle_buf)
        self._block_mix(wave_env, layer, mix_buf, length, rasg_buf, amp)

    def _run_block(self, bufs, buf_len, n, parent_freq, wave_env, layer):
        """generator.c:675-729."""
        mix_buf = self.gen_bufs[bufs]
        if n.flags & ON_VISITED:
            mix_buf[:buf_len] = 0
            return buf_len
        n.flags |= ON_VISITED
        length = buf_len
        skip_len = 0
        if n.time < length and not (n.flags & ON_TIME_INF):
            skip_len = length - n.time
            length = n.time
        t = n.type
        if t == P.POPT_AMP:
            self._run_block_amp(bufs, length, n, parent_freq, wave_env,
                                layer)
        elif t == P.POPT_NOISE:
            self._run_block_noiseg(bufs, length, n, parent_freq, wave_env,
                                   layer)
        elif t == P.POPT_WAVE:
            self._run_block_wosc(bufs, length, n, parent_freq, wave_env,
                                 layer)
        elif t == P.POPT_RASEG:
            self._run_block_rasg(bufs, length, n, parent_freq, wave_env,
                                 layer)
        if not (n.flags & ON_TIME_INF):
            if not layer and skip_len > 0:
                mix_buf[length:length + skip_len] = 0
            n.time -= length
        n.flags &= ~ON_VISITED
        return length

    # -- voice mixing (generator.c:734-788) -----------------------------------

    def _mix_clear(self):
        if self.gen_mix_add_max == 0:
            return
        self.mix_l[:self.gen_mix_add_max] = 0
        self.mix_r[:self.gen_mix_add_max] = 0
        self.gen_mix_add_max = 0

    def _mix_add(self, n, vn, length):
        s_buf = self.gen_bufs[0]
        pan_buf = None
        if (n.pan.flags & P.LINEP_GOAL) or len(n.camods) > 0:
            pan_buf = self.gen_bufs[1 + vn.freq_buf_id]
            pan_buf[:length] = n.pan.run(length, None)
        else:
            n.pan.skip(length)
        if len(n.camods) > 0:
            freq_buf = self.gen_bufs[vn.freq_buf_id] \
                if vn.freq_buf_id > 0 else None
            for mid in n.camods:
                self._run_block(1 + vn.freq_buf_id, length,
                                self.operators[mid], freq_buf, False, True)
        amp_scale = f32(self.amp_scale)
        s = s_buf[:length] * amp_scale
        if pan_buf is not None:
            s_r = s * pan_buf[:length]
        else:
            s_r = s * f32(n.pan.v0)
        self.mix_l[:length] += s - s_r
        self.mix_r[:length] += s + s_r
        if self.gen_mix_add_max < length:
            self.gen_mix_add_max = length

    def _mix_write(self, out_i16, pos, length, stereo):
        """generator.c:795-825. Writes into out_i16 at sample pos."""
        self.gen_flags_out_clear = False
        if stereo:
            l = np.clip(self.mix_l[:length], f32(-1.0), f32(1.0))
            r = np.clip(self.mix_r[:length], f32(-1.0), f32(1.0))
            li = np.rint((l * f32(32767.0)).astype(np.float64)) \
                .astype(np.int16)
            ri = np.rint((r * f32(32767.0)).astype(np.float64)) \
                .astype(np.int16)
            out_i16[pos * 2:(pos + length) * 2:2] += li
            out_i16[pos * 2 + 1:(pos + length) * 2:2] += ri
        else:
            m = (self.mix_l[:length] + self.mix_r[:length]) * f32(0.5)
            m = np.clip(m, f32(-1.0), f32(1.0))
            mi = np.rint((m * f32(32767.0)).astype(np.float64)) \
                .astype(np.int16)
            out_i16[pos:pos + length] += mi

    # -- voice scheduling (generator.c:833-878) ----------------------------------

    def _run_voice(self, vn, length):
        n = self.operators[vn.carr_op_id]
        time = min(vn.duration, min(length, BUF_LEN))
        out_len = 0
        if n.time > 0:
            out_len = self._run_block(0, time, n, None, False, False)
        if out_len > 0:
            self._mix_add(n, vn, out_len)
        vn.duration -= time
        return out_len

    def _run_for_time(self, time, out_i16, pos, stereo):
        gen_len = 0
        while time > 0:
            length = min(time, BUF_LEN)
            time -= length
            self._mix_clear()
            last_len = 0
            for i in range(self.voice, len(self.voices)):
                vn = self.voices[i]
                if vn.duration != 0:
                    voice_len = self._run_voice(vn, length)
                    if voice_len > last_len:
                        last_len = voice_len
            if last_len > 0:
                self._mix_write(out_i16, pos + gen_len, last_len, stereo)
                gen_len += last_len
        return gen_len

    def run(self, out_i16, buf_len, stereo):
        """sauGenerator_run (generator.c:905-973).
        Returns (more, out_len)."""
        if not self.gen_flags_out_clear:
            self.gen_flags_out_clear = True
            out_i16[:] = 0
        pos = 0
        length = buf_len
        gen_len = 0
        while True:
            skip_len = 0
            while self.event < len(self.ev_waits):
                e_wait = self.ev_waits[self.event]
                if self.event_pos < e_wait:
                    waittime = e_wait - self.event_pos
                    if waittime < length:
                        skip_len = length - waittime
                        length = waittime
                    self.event_pos += length
                    break
                self._handle_event(self.event)
                self.event += 1
                self.event_pos = 0
            last_len = self._run_for_time(length, out_i16, pos, stereo)
            if skip_len > 0:
                gen_len += length
                pos += length
                length = skip_len
                continue
            gen_len += last_len
            break
        # advance starting voice / end check (generator.c:953-972)
        while True:
            if self.voice == len(self.voices):
                if self.event != len(self.ev_waits):
                    break
                return False, gen_len
            vn = self.voices[self.voice]
            if vn.duration != 0:
                break
            self.voice += 1
        return True, buf_len
