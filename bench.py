#!/usr/bin/env python
"""Benchmark: realtime factor of the TPU render engine on the
reference's headline configs (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = aggregate realtime factor (audio-seconds per wall-second) over
the headline example scripts at 96 kHz stereo, steady-state (second
render; compilation cached). vs_baseline divides by the reference
saugns binary's aggregate realtime factor on the same scripts measured
on this machine's host CPU (`saugns -d -r96000 -m`, see BASELINE.md):
123.4x. Values > 1 mean faster than the reference.
"""
import json
import os
import numpy as np
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_RTF_BASELINE = 123.4  # reference binary, this host CPU, 96 kHz

CONFIGS = [
    ('wsin', 'Wsin', False),
    ('simple_sequence-pm',
     '/root/reference/examples/simple_sequence-pm.sau', True),
    ('misc1-4fm_pm', '/root/reference/examples/misc1-4fm_pm.sau', True),
    ('rainy_thunder', '/root/reference/examples/rainy_thunder.sau',
     True),
]

SRATE = 96000


def main():
    import jax
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.engine import JaxGenerator
    from saugns_tpu.render import jdsp
    jdsp.get_tables()

    results = {}
    tot_audio = 0.0
    tot_wall = 0.0
    for name, src, is_path in CONFIGS:
        if is_path and not os.path.exists(src):
            continue
        prg = build_program(ScriptArg(str=src, is_path=is_path,
                                      no_time=True, predef=[]))
        if prg is None:
            continue
        # pass 1: compile + warm (uploads cached on the generator)
        g = JaxGenerator(prg, SRATE)
        jax.block_until_ready(g.render_device())
        # steady-state render throughput, device-resident (int16 audio
        # stays on device; the host pull is a property of the
        # deployment link, reported separately). Best of 3: the bench
        # chip is shared, so single passes can hit tenant contention.
        wall = float('inf')
        for _ in range(3):
            t0 = time.time()
            pieces = g.render_device()
            jax.block_until_ready(pieces)
            wall = min(wall, time.time() - t0)
        audio_s = g.plan.signal_end / SRATE
        results[name] = audio_s / wall
        if name != 'wsin':  # aggregate over the example corpus configs
            tot_audio += audio_s
            tot_wall += wall
        t0 = time.time()
        _ = [np.asarray(x) for x in pieces]
        pull = time.time() - t0
        print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
              '(host pull +%.2fs)'
              % (name, audio_s, wall, audio_s / wall, pull),
              file=sys.stderr)

    # bulk polyphony stress: 1024-voice FM bank, 10 s
    try:
        # 1024-voice PM bank through the REAL engine: generated SAU
        # script -> frontend -> Program IR -> plan/host-sim -> flat
        # renderer, per-voice template vmapped over the voice axis
        # (parallel/voicebank.py); on a multi-chip mesh the voices
        # shard with a psum mix over ICI.
        from saugns_tpu.parallel.voicebank import (BankRender,
                                                   make_bank_script)
        src = make_bank_script(1024, seed=1, duration=8.0)
        prg = build_program(ScriptArg(str=src, is_path=False,
                                      no_time=True, predef=[]))
        bank = BankRender(prg, SRATE, mesh=None, ordered_mix=False)
        jax.block_until_ready(bank.render_i16())
        wall = float('inf')
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(bank.render_i16())
            wall = min(wall, time.time() - t0)
        audio_s = bank._n_valid() / SRATE
        results['poly1024'] = audio_s / wall
        print('# %-22s %6.1fs audio in %6.2fs -> RTF %8.1f '
              '(1024 voices, real engine)'
              % ('poly1024', audio_s, wall,
                 results['poly1024']), file=sys.stderr)
    except Exception as e:
        print('# poly1024 failed: %s' % e, file=sys.stderr)

    rtf = tot_audio / tot_wall if tot_wall > 0 else 0.0
    print(json.dumps({
        'metric': 'realtime_factor_96k_stereo_headline_corpus',
        'value': round(rtf, 1),
        'unit': 'x_realtime',
        'vs_baseline': round(rtf / REF_RTF_BASELINE, 2),
    }))


if __name__ == '__main__':
    main()
