/* saugns_tpu native fast path: PILUT oscillator inner loops.
 *
 * Implements the wave-oscillator output semantics documented in
 * sau/generator/wosc.h:238-310 (pre-integrated-table differentiation
 * with Hermite interpolation, self-PM feedback with 1-pole damping).
 * Independent implementation; compiled with the same optimization
 * flags as the reference build (-O3 -ffast-math) so the float
 * contraction behavior matches bit-for-bit on this machine.
 */
#include <stdint.h>
#include <math.h>

#define LEN 2048
#define LENMASK (LEN - 1)
#define SLENBITS 21
#define SLEN (1u << SLENBITS)
#define SLENMASK (SLEN - 1u)

/* 4-point, 3rd-order Hermite interpolation of a periodic table at a
 * 32-bit phase (semantics of sauWave_get_herp, sau/wave.h:127-141). */
static inline double table_herp(const float *tab, uint32_t phase)
{
    uint32_t ind = phase >> SLENBITS;
    float s0 = tab[(ind - 1) & LENMASK];
    float s1 = tab[ind & LENMASK];
    float s2 = tab[(ind + 1) & LENMASK];
    float s3 = tab[(ind + 2) & LENMASK];
    double x = (phase & SLENMASK) * (1.f / SLEN);
    double c0 = s1;
    double c1 = 0.5 * (s2 - s0);
    double c2 = s0 - 2.5 * s1 + 2.0 * s2 - 0.5 * s3;
    double c3 = 0.5 * (s3 - s0) + 1.5 * (s1 - s2);
    return ((c3 * x + c2) * x + c1) * x + c0;
}

/* Differentiated pre-integrated-table oscillator over a phase buffer.
 * State in/out: prev_phase, prev_Is, prev_s. */
void wosc_run(float *out, const uint32_t *phase, long n,
              const float *pilut, float diff_scale, float diff_offset,
              uint32_t *prev_phase, double *prev_Is, float *prev_s)
{
    uint32_t pp = *prev_phase;
    double pIs = *prev_Is;
    float ps = *prev_s;
    for (long i = 0; i < n; ++i) {
        uint32_t p = phase[i];
        int32_t pd = (int32_t)(p - pp);
        float s;
        if (pd == 0) {
            s = ps;
        } else {
            double Is = table_herp(pilut, p);
            double x = (diff_scale / pd);
            s = (float)((Is - pIs) * x + diff_offset);
            pIs = Is;
            ps = s;
            pp = p;
        }
        out[i] = s;
    }
    *prev_phase = pp;
    *prev_Is = pIs;
    *prev_s = ps;
}

/* Self-PM ("feedback FM") variant: the previous output sample, scaled
 * by pm_abuf and a fixed 2^31 factor, offsets the phase; ringing is
 * damped with a 1-pole average (semantics of wosc.h:273-310). */
void wosc_run_selfmod(float *out, const uint32_t *phase, long n,
                      const float *pm_abuf,
                      const float *pilut, float diff_scale,
                      float diff_offset, uint32_t *prev_phase,
                      double *prev_Is, float *prev_s, float *fb_s)
{
    const float fb_scale = 2147483648.f; /* 2^31 */
    uint32_t pp = *prev_phase;
    double pIs = *prev_Is;
    float ps = *prev_s;
    float fb = *fb_s;
    for (long i = 0; i < n; ++i) {
        uint32_t p = phase[i]
            + (uint32_t)(int64_t)llrintf(fb * pm_abuf[i] * fb_scale);
        int32_t pd = (int32_t)(p - pp);
        float s;
        if (pd == 0) {
            s = ps;
        } else {
            double Is = table_herp(pilut, p);
            double x = (diff_scale / pd);
            s = (float)((Is - pIs) * x + diff_offset);
            pIs = Is;
            ps = s;
            pp = p;
        }
        out[i] = s;
        fb = (fb + s) * 0.5f;
    }
    *prev_phase = pp;
    *prev_Is = pIs;
    *prev_s = ps;
    *fb_s = fb;
}

/* Phase-accumulator fill (semantics of sauPhasor_fill,
 * wosc.h:135-169): pre-incremented integer phase, optional PM and
 * frequency-scaled PM offsets. Buffers may be NULL. */
void phasor_fill(uint32_t *out, long n, float coeff, uint32_t *phase,
                 const float *freq, const float *pm, const float *fpm)
{
    const float fpm_scale = 1.f / 632.45553203367586639978f;
    uint32_t ph = *phase;
    for (long i = 0; i < n; ++i) {
        uint32_t ofs = 0;
        float f = freq[i];
        if (pm && fpm)
            ofs = (uint32_t)(int64_t)llrintf(
                (pm[i] + fpm[i] * fpm_scale * f) * 0x1p31f);
        else if (pm)
            ofs = (uint32_t)(int64_t)llrintf(pm[i] * 0x1p31f);
        else if (fpm)
            ofs = (uint32_t)(int64_t)llrintf(
                fpm[i] * fpm_scale * f * 0x1p31f);
        ph += (uint32_t)(int64_t)llrintf(coeff * f);
        out[i] = ofs + ph;
    }
    *phase = ph;
}
