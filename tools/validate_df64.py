#!/usr/bin/env python
"""Validate the df64 (double-float32) oscillator chain against the
exact float64 chain, per wave table.

The TPU render path (jdsp.wosc_s_shifted) evaluates the PILUT Hermite
and difference in explicit double-float32 instead of XLA's emulated
float64 (wosc.h:238-266 is float64 in the reference). This tool draws
random phase steps, evaluates both chains on the CPU platform with
x64 enabled (so the f64 chain is true IEEE double = the reference's
math), and reports the worst int16-domain deviation. The acceptance
bar used for the TPU default: 0 int16 mismatches.

Usage: python tools/validate_df64.py [n_samples_per_wave]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp

from saugns_tpu.render import jdsp
from saugns_tpu.dsp import wavetables as W


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    rng = np.random.default_rng(7)
    worst = 0
    total_mism = 0
    n_waves = len(W.WAVE_NAMES)
    for wave in range(n_waves):
        ph = rng.integers(0, 1 << 32, size=n, dtype=np.uint64) \
            .astype(np.uint32)
        # phase deltas spanning tiny (high pitch ratio) to huge
        pd = rng.integers(1, 1 << 28, size=n, dtype=np.int64) \
            .astype(np.int32) * rng.choice([1, -1], size=n)
        pp = (ph - pd.astype(np.uint32)).astype(np.uint32)
        x1 = ((pp & np.uint32(W.SLENMASK)).astype(np.float32)
              * jdsp.X_SCALE)
        x2 = ((ph & np.uint32(W.SLENMASK)).astype(np.float32)
              * jdsp.X_SCALE)
        taps1 = np.asarray(jdsp.gather_taps(
            jnp.asarray((pp >> jdsp.SLENBITS).astype(np.int32)), wave))
        taps2 = np.asarray(jdsp.gather_taps(
            jnp.asarray((ph >> jdsp.SLENBITS).astype(np.int32)), wave))
        s64, _ = jdsp._wosc_s64(wave, jnp.asarray(pd), jnp.asarray(x1),
                                jnp.asarray(x2), jnp.asarray(taps1),
                                jnp.asarray(taps2))
        sdf, _ = jdsp._wosc_s_df64(wave, jnp.asarray(pd),
                                   jnp.asarray(x1), jnp.asarray(x2),
                                   jnp.asarray(taps1),
                                   jnp.asarray(taps2))
        a = np.asarray(s64, np.float64)
        b = np.asarray(sdf, np.float64)
        # int16 domain: the mix scales by amp in [0,1]; compare at
        # full scale (the worst case for absolute error)
        qa = np.clip(np.rint(a * 32767.0), -32768, 32767)
        qb = np.clip(np.rint(b * 32767.0), -32768, 32767)
        mism = int(np.sum(qa != qb))
        total_mism += mism
        mxa = float(np.max(np.abs(a - b)))
        worst = max(worst, mxa)
        print('wave %2d %-8s  max|ds| %.3e  int16 mismatches %d / %d'
              % (wave, W.WAVE_NAMES[wave], mxa, mism, n))
    print('TOTAL: worst abs err %.3e, int16 mismatches %d / %d'
          % (worst, total_mism, n * n_waves))
    return 1 if total_mism else 0


if __name__ == '__main__':
    sys.exit(main())
