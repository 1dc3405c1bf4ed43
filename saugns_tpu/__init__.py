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

import os as _os

# Bit-parity with the reference binary requires XLA:CPU not to
# contract mul+add chains into FMAs (see render/engine.py for the
# full rationale). XLA parses XLA_FLAGS once, when the first client
# is created -- and jax.devices() in e.g. parallel.scripts runs
# before render.engine is imported on the CLI path -- so the guard
# must be applied at package import, before ANY jax client exists.
# (A flag set after client creation is silently ignored; the result
# was +-1-LSB FMA rounding drift on CLI renders only, while direct
# engine use -- and thus the test suite -- stayed byte-exact.)
if 'xla_cpu_max_isa' not in _os.environ.get('XLA_FLAGS', '') \
        and _os.environ.get('SAUGNS_TPU_CPU_FMA') != '1':
    _os.environ['XLA_FLAGS'] = (_os.environ.get('XLA_FLAGS', '')
                                + ' --xla_cpu_max_isa=AVX').strip()

from .lang.program import Program, build_program  # noqa: F401
# Load the `render` SUBPACKAGE before binding the `render` FUNCTION:
# the import system sets a parent-package attribute for a submodule
# only on its first load, so importing it here (cheap -- its __init__
# is empty) guarantees a later `from .render.engine import ...`
# cannot silently rebind `saugns_tpu.render` from the API function
# back to the module. Function wins; the module stays reachable as
# `saugns_tpu.render` in sys.modules and via `from saugns_tpu.render
# import ...` forms (which never consult this attribute).
from . import render as _render_pkg  # noqa: F401
from .api import (SAUError, compile_script, render,  # noqa: F401
                  write_wav)
