"""Multi-script sharding: render independent programs concurrently
across devices.

The reference renders a script list serially (saugns.c:648-659); the
renders are independent -- the only ordering requirement is the output
order (audio device / file / stdout writes). Here each program is
rendered on its own device (round-robin over the mesh/devices) in a
worker thread -- JAX dispatch is per-device-asynchronous, so renders
overlap -- and the results are consumed strictly in program order, so
the sink output is byte-identical to the serial path.

Host memory is bounded by ``max_buffer_samples`` per in-flight render
(pre-rendered int16); programs longer than the cap render serially
through the ordinary streaming generator instead.
"""
from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np


class PrerenderedGenerator:
    """sauGenerator_run-compatible delivery from a pre-rendered host
    int16 array ((n, 2) stereo or (n,) mono)."""

    def __init__(self, arr: np.ndarray, stereo: bool):
        self.arr = arr
        self.stereo = stereo
        self.pos = 0

    def run(self, out_i16, buf_len, stereo):
        assert stereo == self.stereo
        out_i16[:] = 0
        n = len(self.arr) - self.pos
        take = min(buf_len, n)
        part = self.arr[self.pos:self.pos + take]
        if stereo:
            out_i16[:take * 2:2] = part[:, 0]
            out_i16[1:take * 2:2] = part[:, 1]
        else:
            out_i16[:take] = part
        self.pos += take
        if self.pos >= len(self.arr):
            return False, take
        return True, buf_len


def _render_on_device(prg, srate, stereo, device):
    """Full render of one program pinned to ``device``; returns the
    host int16 array."""
    import jax
    from ..render.engine import JaxGenerator
    with jax.default_device(device):
        g = JaxGenerator(prg, srate)
        chunks = list(g._stream_i16(stereo))
    if not chunks:
        return np.zeros((0, 2) if stereo else 0, np.int16)
    return np.concatenate(chunks, axis=0)


class ShardedRenderQueue:
    """Pre-renders a program list across devices; ``generator(i)``
    returns a run()-compatible generator for program i (pre-rendered
    if it was sharded, else None -- caller uses the serial path).

    Sharding applies when there is >1 device and >1 program and the
    JAX engine is the active backend; SAUGNS_TPU_SHARD_SCRIPTS=0
    disables it."""

    def __init__(self, prgs: List, srate: int, stereo: bool,
                 devices=None,
                 max_buffer_samples: int = 1 << 25):
        import jax
        self.prgs = prgs
        self.futures = {}
        if os.environ.get('SAUGNS_TPU_SHARD_SCRIPTS', '1') != '1':
            return
        if os.environ.get('SAUGNS_TPU_BACKEND', 'jax') != 'jax':
            return
        devices = list(devices if devices is not None
                       else jax.devices())
        live = [i for i, p in enumerate(prgs) if p is not None]
        if len(devices) < 2 or len(live) < 2:
            return
        from ..render.plan import RenderPlan
        self._ex = ThreadPoolExecutor(max_workers=len(devices))
        for k, i in enumerate(live):
            prg = prgs[i]
            plan_len = RenderPlan(prg, srate).signal_end
            if plan_len > max_buffer_samples:
                continue  # stream serially; don't buffer minutes of audio
            dev = devices[k % len(devices)]
            self.futures[i] = self._ex.submit(
                _render_on_device, prg, srate, stereo, dev)

    def generator(self, i: int) -> Optional[PrerenderedGenerator]:
        fut = self.futures.get(i)
        if fut is None:
            return None
        arr = fut.result()
        return PrerenderedGenerator(arr, arr.ndim == 2)

    def close(self):
        ex = getattr(self, '_ex', None)
        if ex is not None:
            ex.shutdown(wait=False)
