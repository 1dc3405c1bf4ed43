"""Public library API: compile and render SAU scripts from Python.

The reference project is a CLI binary (`saugns.c`); its library-shaped
core is the two-stage pipeline ``sau_build_Program`` (sau/parser.c:2092)
-> ``sauGenerator`` pull loop (saugns.c:575-623). This module exposes
that pipeline directly to Python callers, so the engine can be used
without going through ``saugns_tpu.cli``:

    import saugns_tpu as st

    audio = st.render("Wsin f440 t1")            # (samples, 2) int16
    prg = st.compile_script(path="song.sau")     # reusable Program IR
    st.write_wav("song.wav", program=prg, srate=44100)

All functions accept either inline ``source`` text (the CLI's ``-e``),
a script ``path``, or an already-compiled ``program``.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .lang.program import Program, ScriptArg, build_program

__all__ = ['SAUError', 'compile_script', 'render', 'write_wav']

DEFAULT_SRATE = 96000  # saugns.c:49 (DEFAULT_SRATE)


class SAUError(ValueError):
    """A script failed to compile (parse errors go to stderr, matching
    the reference's diagnostics; the exception carries the script
    name)."""


def _resolve_program(source: Optional[str], path: Optional[str],
                     program: Optional[Program],
                     predef: Sequence[Tuple[str, float]] = ()
                     ) -> Program:
    given = sum(x is not None for x in (source, path, program))
    if given != 1:
        raise TypeError('pass exactly one of source=, path=, program= '
                        '(got %d)' % given)
    if program is not None:
        return program
    sa = ScriptArg(str=source if source is not None else path,
                   is_path=path is not None,
                   no_time=True, predef=list(predef))
    prg = build_program(sa)
    # The reference's sau_build_Program returns a non-NULL *empty*
    # program even when parse_file fails or a $? requirement aborts the
    # script (saugns.c:680-691 exits 0 on that path) -- the CLI keeps
    # that exact behavior.  The failure is still distinguishable: the
    # program's name stays NULL (sau/parser.c:2104-2113), which is what
    # the library API surfaces as an exception.
    if prg is None or prg.name is None:
        raise SAUError('script failed to compile: %r'
                       % (path if path is not None else source))
    return prg


def compile_script(source: Optional[str] = None, *,
                   path: Optional[str] = None,
                   predef: Sequence[Tuple[str, float]] = ()) -> Program:
    """Compile SAU text (or a script file) to a ``Program`` IR.

    The Program is a plain, srate-independent data object (the
    reference's ``sauProgram``, sau/program.h); it can be rendered many
    times, serialized via ``lang.serialize``, or inspected with
    ``Program.print_info()``. ``predef`` supplies external variables
    (the CLI's ``-D name=value``).

    Raises ``SAUError`` if the script does not parse; the positioned
    warnings/errors themselves go to stderr exactly as the reference
    binary prints them.
    """
    return _resolve_program(source, path, None, predef)


def _make_generator(prg: Program, srate: int, backend: Optional[str]):
    if backend is None:
        backend = os.environ.get('SAUGNS_TPU_BACKEND', 'jax')
    if backend == 'cpu':
        from .render.cpu import Generator
        return Generator(prg, srate)
    if backend != 'jax':
        raise ValueError("backend must be 'jax', 'cpu', or None "
                         "(got %r)" % (backend,))
    from .render.engine import JaxGenerator
    return JaxGenerator(prg, srate)


def render(source: Optional[str] = None, *,
           path: Optional[str] = None,
           program: Optional[Program] = None,
           srate: int = DEFAULT_SRATE,
           stereo: bool = True,
           backend: Optional[str] = None,
           predef: Sequence[Tuple[str, float]] = ()) -> np.ndarray:
    """Render a script to a ``(samples, channels)`` int16 array.

    The output is bit-identical to what the CLI writes into a WAV file
    (minus the header): int16 is the reference's wire format
    (player/sndfile.c), and conversion happens on device so only final
    samples cross the host boundary.

    ``backend``: ``'jax'`` (the TPU/XLA engine, default), ``'cpu'``
    (host NumPy + native-C renderer -- no JIT warm-up), or None to
    honor ``SAUGNS_TPU_BACKEND``.
    """
    prg = _resolve_program(source, path, program, predef)
    gen = _make_generator(prg, srate, backend)
    ch = 2 if stereo else 1
    buf_len = 4096
    buf = np.zeros(buf_len * ch, dtype=np.int16)
    chunks = []
    while True:
        more, n = gen.run(buf, buf_len, stereo)
        if n:
            chunks.append(buf[:n * ch].copy())
        if not more:
            break
    flat = (np.concatenate(chunks) if chunks
            else np.zeros(0, np.int16))
    return flat.reshape(-1, ch)


def write_wav(out_path: str, source: Optional[str] = None, *,
              path: Optional[str] = None,
              program: Optional[Program] = None,
              srate: int = DEFAULT_SRATE,
              stereo: bool = True,
              backend: Optional[str] = None,
              predef: Sequence[Tuple[str, float]] = ()) -> int:
    """Render a script and write a 16-bit PCM WAV file; returns the
    number of sample frames written. Byte-identical to the CLI's
    ``-o out_path`` (player/sndfile.c WAV header + payload)."""
    from .io import wav
    audio = render(source, path=path, program=program, srate=srate,
                   stereo=stereo, backend=backend, predef=predef)
    sf = wav.SndFile(out_path, wav.FORMAT_WAV, audio.shape[1], srate)
    try:
        sf.write(audio.reshape(-1), audio.shape[0])
    finally:
        sf.close()
    return audio.shape[0]
