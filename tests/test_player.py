"""Player dual-generator (split_gen) behavior: when the audio device
negotiates a different sample rate than requested AND file/stdout
output is active, the reference runs the whole program twice at two
rates in lockstep -- device fed from one generator, file from the
other (saugns.c:518-543,585-599). Without file output it instead
adopts the device rate (saugns.c:524-526).

These tests force a rate mismatch with a null device at a different
negotiated rate and assert the file side is byte-identical to a plain
render at the requested rate.
"""
import os

import numpy as np
import pytest

from saugns_tpu.io.audiodev import NullAudioDev
from saugns_tpu.io.player import (OPT_SYSAU_ENABLE, Player)
from saugns_tpu.lang.program import ScriptArg, build_program

WSIN = 'Wsin f440 t0.3'


def _build(src):
    prg = build_program(ScriptArg(str=src, is_path=False,
                                  no_time=True, predef=[]))
    assert prg is not None and prg.name is not None
    return prg


class CountingNullDev(NullAudioDev):
    def __init__(self, srate):
        super().__init__(srate)
        self.frames = 0

    def write(self, buf, samples):
        self.frames += samples
        return True


@pytest.fixture
def cpu_backend(monkeypatch):
    monkeypatch.setenv('SAUGNS_TPU_BACKEND', 'cpu')


def test_split_gen_file_side_byte_identical(tmp_path, monkeypatch,
                                            capsys, cpu_backend):
    # requested 6000 Hz, device "negotiates" 8000 Hz -> split_gen
    dev = CountingNullDev(8000)
    import saugns_tpu.io.audiodev as ad_mod
    monkeypatch.setattr(ad_mod, 'open_audiodev',
                        lambda ch, sr: dev)
    prg = _build(WSIN)
    out = tmp_path / 'split.wav'
    p = Player(6000, OPT_SYSAU_ENABLE, str(out))
    assert p.ok
    assert p.split_gen
    assert p.srate == 6000 and p.ad_srate == 8000
    err = capsys.readouterr().err
    assert 'generating audio twice' in err
    assert p.run(prg)
    p.finish()
    # the device consumed the 8 kHz render: 0.3 s * 8000 = 2400 frames
    assert dev.frames == 2400
    # the file side must be byte-identical to a plain 6 kHz render
    ref = tmp_path / 'plain.wav'
    p2 = Player(6000, 0, str(ref))  # no system audio requested
    assert p2.ok and not p2.split_gen
    assert p2.run(_build(WSIN))
    p2.finish()
    assert out.read_bytes() == ref.read_bytes()


def test_rate_mismatch_without_file_adopts_device_rate(
        monkeypatch, cpu_backend):
    # no file output: the player switches to the device rate instead
    # of running two generators (saugns.c:524-526)
    dev = CountingNullDev(8000)
    import saugns_tpu.io.audiodev as ad_mod
    monkeypatch.setattr(ad_mod, 'open_audiodev',
                        lambda ch, sr: dev)
    p = Player(6000, 0, None)
    assert p.ok
    assert not p.split_gen
    assert p.srate == 8000
    assert p.run(_build(WSIN))
    p.finish()
    assert dev.frames == 2400  # 0.3 s at the adopted 8 kHz


def test_matching_rate_no_split(monkeypatch, tmp_path, cpu_backend):
    dev = CountingNullDev(6000)
    import saugns_tpu.io.audiodev as ad_mod
    monkeypatch.setattr(ad_mod, 'open_audiodev',
                        lambda ch, sr: dev)
    out = tmp_path / 'same.wav'
    p = Player(6000, OPT_SYSAU_ENABLE, str(out))
    assert p.ok and not p.split_gen
    assert p.run(_build(WSIN))
    p.finish()
    assert dev.frames == 1800
