"""saugns_tpu: a TPU-native implementation of the SAU (Scriptable AUdio)
language and renderer, with the capabilities of saugns v0.4.7.

Architecture (see SURVEY.md for the reference layer map):

- ``saugns_tpu.lang``    -- host-side compiler: scanner/parser for the SAU
  language producing a flat, time-ordered event ``Program`` IR
  (reference: sau/scanner.c, sau/parser.c, sau/parser/parseconv.h).
- ``saugns_tpu.dsp``     -- DSP primitive definitions: wavetables and
  pre-integrated LUTs, line (sweep) shapes, hash-noise PRNG kit
  (reference: sau/wave.c, sau/line.c, sau/math.h).
- ``saugns_tpu.render``  -- block renderers. ``render.cpu`` is a NumPy
  reference interpreter mirroring sau/generator.c semantics; ``render.engine``
  is the TPU JAX/XLA engine: the program timeline is compiled to a static
  plan and rendered with ``lax.scan`` over sample blocks.
- ``saugns_tpu.io``      -- WAV/AU/raw writers and optional system audio
  (reference: player/sndfile.c, player/audiodev.c).
- ``saugns_tpu.parallel``-- multi-device sharding of renders over a
  ``jax.sharding.Mesh`` (voice-parallel with psum mix; bulk script batching).
"""

__version__ = "0.1.0"
SAU_VERSION_COMPAT = "v0.4.7"

from .lang.program import Program, build_program  # noqa: F401
