"""Multi-device rendering over a jax.sharding.Mesh.

The reference is single-threaded (SURVEY.md §2.5); the natural TPU
scaling axes for SAU rendering are:

- **voices** (data-parallel): independent carrier trees summed into one
  stereo mix (sau/generator.c:863-869) -- shard voices across devices,
  ``psum`` the mix over ICI.
- **time** (sequence-parallel): sample blocks; integer phasors are
  prefix sums, so per-chunk increment totals are exchanged with an
  ``all_gather`` and each device offsets its local cumsum -- a
  parallel scan over the mesh's time axis.
- **scripts** (batch): independent renders, trivially sharded.

``render_fm_bank`` below is a closed-form FM voice bank (carrier +
modulator per voice, swept freq/amp/pan) with both mesh axes active --
the time-axis (sequence-parallel) scaling demo: per-chunk phasor
offsets derive from the global start sample, so the time axis shards
with no cross-device scan. Rendering of real compiled Programs over a
mesh lives in ``parallel.voicebank`` (which also backs
``__graft_entry__.dryrun_multichip`` and the poly1024 benchmark).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import jdsp

f32 = jnp.float32
u32 = jnp.uint32


def make_mesh(n_devices: int) -> Mesh:
    """Mesh over the first n devices: 2D (voices x time) when there are
    enough devices for both axes, else 1D over voices."""
    devs = np.asarray(jax.devices()[:n_devices])
    if n_devices >= 4 and n_devices % 2 == 0:
        return Mesh(devs.reshape(n_devices // 2, 2), ('voices', 'time'))
    return Mesh(devs.reshape(n_devices), ('voices',))


def _fm_voice_chunk(phase_c, phase_m, freq, ratio, index, amp, pan,
                    n_local, t0):
    """Render one time chunk of an FM voice bank.

    phase_c/phase_m: (V,) u32 carrier/modulator phase at chunk start.
    freq: (V,) Hz; ratio: modulator ratio; index: PM index; amp, pan:
    (V,). Returns (mix (n_local, 2), phase_c', phase_m')."""
    coeff = np.float32(4294967296.0 / 96000.0)
    inc_c = jdsp.ftoi(coeff * freq).astype(u32)          # (V,)
    inc_m = jdsp.ftoi(coeff * freq * ratio).astype(u32)
    i = jnp.arange(1, n_local + 1, dtype=u32)            # (T,)
    ph_m = phase_m[:, None] + inc_m[:, None] * i[None, :]
    # bulk path: sine phase-to-value directly on the VPU (a sine wave
    # is its own bandlimited form; no table gather, no DPW needed --
    # the scripted engine's PILUT machinery is for arbitrary tables)
    two_pi_scale = np.float32(2.0 * np.pi / 4294967296.0)
    s_m = jnp.sin(jdsp.asi32(ph_m).astype(f32) * two_pi_scale)
    ofs = jdsp.ftoi(s_m * index[:, None] * jdsp.P31).astype(u32)
    ph_c = phase_c[:, None] + inc_c[:, None] * i[None, :] + ofs
    s_c = jnp.sin(jdsp.asi32(ph_c).astype(f32) * two_pi_scale)
    s = s_c * amp[:, None]
    s_r = s * pan[:, None]
    mix = jnp.stack([(s - s_r).sum(0), (s + s_r).sum(0)], axis=-1)
    return mix, ph_c[:, -1], ph_m[:, -1] - ofs[:, -1] * 0  # mod phase


def render_fm_bank(mesh: Mesh, freq, ratio, index, amp, pan, n_samples,
                   donate: bool = False):
    """Mesh-parallel FM voice bank render.

    freq/ratio/index/amp/pan: (V,) float32, V divisible by the mesh's
    'voices' axis; n_samples divisible by the 'time' axis (if present).
    Returns the stereo mix (n_samples, 2), replicated."""
    axes = mesh.axis_names
    has_time = 'time' in axes
    vspec = P('voices')
    n_t = mesh.shape['time'] if has_time else 1
    n_local = n_samples // n_t

    # per-step time chunk: bounds the tap-gather working set
    # ((chunk*V, 128) f32) regardless of total length
    chunk = 8192
    while n_local % chunk:
        chunk //= 2

    def step(freq, ratio, index, amp, pan):
        vidx = jax.lax.axis_index('voices')
        tidx = jax.lax.axis_index('time') if has_time else 0
        coeff = np.float32(4294967296.0 / 96000.0)
        inc_c = jdsp.ftoi(coeff * freq).astype(u32)
        inc_m = jdsp.ftoi(coeff * freq * ratio).astype(u32)
        # time-parallel phasor: phases at any chunk's start are the
        # increments times the global start sample (exact u32 wrap)
        t_base = (tidx * n_local).astype(u32) if has_time \
            else np.uint32(0)

        def body(_, ci):
            t0 = t_base + (ci * chunk).astype(u32)
            mix, _, _ = _fm_voice_chunk(inc_c * t0, inc_m * t0, freq,
                                        ratio, index, amp, pan,
                                        chunk, t0)
            return 0, mix

        _, mixes = jax.lax.scan(
            body, 0, jnp.arange(n_local // chunk, dtype=u32))
        mix = mixes.reshape(n_local, 2)
        # reduce voices over ICI; time chunks stay sharded on axis 0
        mix = jax.lax.psum(mix, 'voices')
        return mix

    in_specs = (vspec,) * 5
    out_spec = P('time') if has_time else P()
    # check_vma=False: the closed-form per-chunk phasor bases are
    # computed from axis_index, which the varying-mesh-axes checker
    # cannot see through
    fn = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec, check_vma=False)
    return fn(freq, ratio, index, amp, pan)


def sharded_args(mesh: Mesh, n_voices, n_samples, seed=0):
    """Example argument set for render_fm_bank, placed on the mesh."""
    rng = np.random.RandomState(seed)
    vdev = mesh.shape['voices']
    v = max(n_voices - n_voices % vdev, vdev)
    freq = (110.0 * 2.0 ** (rng.randint(0, 36, v) / 12.0)).astype(
        np.float32)
    ratio = rng.choice([0.5, 1.0, 1.5, 2.0, 3.0], v).astype(np.float32)
    index = rng.uniform(0.0, 2.0, v).astype(np.float32)
    amp = np.full(v, 1.0 / v, np.float32)
    pan = rng.uniform(-1.0, 1.0, v).astype(np.float32)
    sh = NamedSharding(mesh, P('voices'))
    args = tuple(jax.device_put(x, sh)
                 for x in (freq, ratio, index, amp, pan))
    return args, n_samples
