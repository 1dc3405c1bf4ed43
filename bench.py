#!/usr/bin/env python
"""Benchmark: realtime factor of the TPU render engine on the
reference's headline configs (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

value = aggregate realtime factor (audio-seconds per wall-second) over
the headline example scripts at 96 kHz stereo, steady-state
(compilation cached), rendered back-to-back as one pipelined device
stream with a single final sync (the analog of timing the reference
binary across a script list; per-script walls incl. per-render sync
are reported on stderr). vs_baseline divides by the reference saugns
binary's aggregate realtime factor on the same scripts measured on
this machine's host CPU (`saugns -d -r96000 -m`, see BASELINE.md):
123.4x. Values > 1 mean faster than the reference.

Extra JSON keys qualify the number so a partial can never masquerade
as the corpus aggregate: "configs" = how many of the three corpus
scripts the value covers, "pipelined" = whether it is the one-sync
pipelined measurement (vs a sum of single-pass fallbacks),
"fidelity_db" = the on-chip corpus fidelity gate (a full 96 kHz
rainy_thunder render SNR-compared against the CPU oracle before any
timing; the `make fullcheck` analog, reference Makefile:31-32), and
one key per measured config (steady-state RTF: the three corpus
scripts, wsin, wsin_pipelined, poly1024).

Further keys from the full-corpus phases: "corpus_full_rtf" +
"corpus_full_scripts" (n/75) + "corpus_full_audio_s" -- every
renderable examples/ script pipelined with one forced fetch
(BASELINE.md's full-corpus row; "corpus_full_vs_ref" divides by the
reference binary's 497.6x measured over the same 75 scripts);
"gate_<name>_db" -- per-feature on-chip fidelity gates (noise colors,
self-PM, wave tables, rasg/ring-mod) run before the corpus timing;
"script_list_rtf"/"script_list_vs_ref" -- the real CLI path over the
20 heaviest example scripts, muted, one completion sync (reference
aggregate on the same list: 422.5x).

A watchdog thread guarantees the JSON line is printed even if a cold
XLA compile (minutes through the dev-rig tunnel on first run) eats the
harness budget: after BENCH_DEADLINE seconds the aggregate over the
configs completed so far is emitted and the process exits 0. Warming
is ordered by aggregate priority: the three corpus configs strictly
before wsin and the poly1024 stress bank.

Timing methodology: every timed pass ends in a FORCED completion --
an on-device checksum of all outputs fetched to the host (_force).
``jax.block_until_ready`` is not trusted: on the dev-rig runtime it
can return without waiting (a 60 s render "completed" in 0.10 ms;
the subsequent 4-sample host pull took the real 38 ms). The fetch
round trip is the rig's ~25 ms floor for ANY executable (a trivial
one-op jit pays the same), so pipelined lines (many renders, one
forced fetch) are the deployment-relevant throughput numbers and
single-short-render RTFs are floor-bound near audio_s / 25 ms.
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_RTF_BASELINE = 123.4  # reference binary, this host CPU, 96 kHz
# the internal watchdog must fire BEFORE any external `timeout 540`
# wrapper kills the process: a round-4 rehearsal under `timeout 540`
# lost the race (rc=124, no JSON at all) when the deadline and the
# watchdog were both 540 s -- a partial aggregate always beats nothing
DEADLINE = float(os.environ.get('BENCH_DEADLINE', '505'))

# the three corpus configs form the aggregate; wsin is the latency
# smoke config (reported separately, never in the aggregate)
CONFIGS = [
    ('simple_sequence-pm',
     '/root/reference/examples/simple_sequence-pm.sau', True),
    ('misc1-4fm_pm', '/root/reference/examples/misc1-4fm_pm.sau', True),
    ('rainy_thunder', '/root/reference/examples/rainy_thunder.sau',
     True),
]
N_CORPUS = len(CONFIGS)
WSIN = ('wsin', 'Wsin', False)
# RasG self-PM feedback (rasg.h:242-280,764-772): the per-sample
# recurrence runs as the Pallas scalar-loop kernel
# (jdsp._rasg_selfmod_pallas); reported separately like wsin
RASG_FB = ('rasg_feedback',
           'Rcos mf f60 p.a.5[Rlin f7 a.4] a.6 t10', False)

SRATE = 96000

# full examples corpus (BASELINE.md row: "Full examples/ corpus,
# stereo 96 kHz, single TPU chip: aggregate >=1000x"). 75 scripts,
# 1685.8 s of audio; the reference binary renders the whole set in
# 3.388 s on this host CPU (best of 3, `saugns -m -d -r96000 <all>`,
# measured 2026-08-20) = 497.6x aggregate.
CORPUS_GLOB = '/root/reference/examples/**/*.sau'
REF_WALL_FULL_CORPUS = 3.388

# script-list config (the real CLI path over a 20-script list -- the
# deployment shape of the reference's serial loop, saugns.c:648-659).
# The list is the 20 highest-wall examples scripts for the reference
# binary on this host; 1010.3 s of audio, reference wall 2.391 s
# (best of 3) = 422.5x aggregate.
SCRIPT_LIST = [
    '/root/reference/examples/rainy_thunder.sau',
    '/root/reference/examples/tests/long/sqr_am_2m.sau',
    '/root/reference/examples/misc1-4fm_pm.sau',
    '/root/reference/examples/sounds/bg-scape-00b.sau',
    '/root/reference/examples/sounds/bg-scape-00.sau',
    '/root/reference/examples/sounds/bass-sounds.sau',
    '/root/reference/examples/sounds/music-elem-02.sau',
    '/root/reference/examples/sounds/bg-drum-01b.sau',
    '/root/reference/examples/sounds/music-elem-01.sau',
    '/root/reference/examples/sounds/bg-drum-01c.sau',
    '/root/reference/examples/tests/long/sin_pm_1m.sau',
    '/root/reference/examples/sounds/bg-scape-02.sau',
    '/root/reference/examples/sounds/cat-purr.sau',
    '/root/reference/examples/sounds/bg-noise-00.sau',
    '/root/reference/examples/simple_mixed_up-pm.sau',
    '/root/reference/examples/sounds/music-elem-00.sau',
    '/root/reference/examples/sounds/bg-noise-00b.sau',
    '/root/reference/examples/sounds/drum-rich-g.sau',
    '/root/reference/examples/tests/long/sin_fm_Ruwh.sau',
    '/root/reference/examples/sounds/bg-drum-01.sau',
]
REF_WALL_SCRIPT_LIST = 2.391

# on-chip fidelity gates: full 96 kHz renders SNR-compared against
# the CPU oracle before headline timing (the CPU-platform suite
# cannot see a broken Pallas kernel). The set covers the distinct
# device code paths: rasg funcs + noise (rainy_thunder), the 7 noise
# colors (stereo_static), wosc self-PM feedback (pm_feedback_pm),
# wave tables + PM (wave_allh3), rasg cos line + ring-mod
# (voicelike-Rcos_rm).
GATE_CONFIGS = [
    ('rainy_thunder', '/root/reference/examples/rainy_thunder.sau'),
    ('stereo_static', '/root/reference/examples/sounds/stereo_static.sau'),
    ('pm_feedback_pm', '/root/reference/examples/sounds/pm_feedback_pm.sau'),
    ('wave_allh3', '/root/reference/examples/tests/wave_allh3.sau'),
    ('voicelike-Rcos_rm',
     '/root/reference/examples/sounds/voicelike-Rcos_rm.sau'),
]

# physical plausibility bound: these workloads cannot render beyond
# a few thousand x realtime on one chip (the tap gather alone is
# ~1 ns per sample-stage), so a faster wall means the dev-rig
# runtime replayed an identical call from its response cache instead
# of executing (the renders are salted against this, engine._mono;
# the guard is belt-and-braces)
RTF_PLAUSIBLE = 5000.0


def _plausible(audio_s, wall):
    if wall <= 0 or audio_s / wall > RTF_PLAUSIBLE:
        print('# WARNING: %.1fs audio in %.4fs looks like a replayed '
              'call, discarding pass' % (audio_s, wall),
              file=sys.stderr, flush=True)
        return False
    return True


_ck_fns = {}


def _force(pieces):
    """Force REAL completion of a render and return after the result
    is provably materialized: reduce every output to one scalar ON
    DEVICE and fetch it. On the dev-rig runtime,
    ``jax.block_until_ready`` can return without waiting (measured:
    a 60 s render "completed" in 0.10 ms, then a 4-sample host pull
    took the real 38 ms), so any block-based wall is fiction; a
    dependent scalar fetch cannot lie. The fetch round trip itself is
    the rig's ~25 ms floor (a trivial one-op executable pays the
    same), which is why single-short-render walls bottom out near
    25 ms regardless of device work."""
    import jax
    import jax.numpy as jnp
    key = tuple((tuple(p.shape), str(p.dtype)) for p in pieces)
    ck = _ck_fns.get(key)
    if ck is None:
        ck = jax.jit(lambda ps: sum(
            jnp.sum(p.astype(jnp.int32)) if p.dtype == jnp.int16
            else jnp.sum(p) for p in ps))
        _ck_fns[key] = ck
    return ck(list(pieces)).item()

_state = {'tot_audio': 0.0, 'tot_wall': 0.0, 'done': False,
          'pipelined': False, 'n_configs': 0, 'fidelity_db': None,
          'per_config': {}}
_lock = threading.Lock()

# at most 1 cold-compile stream in flight: a 4-way concurrent
# Mosaic-compile storm wedged the dev-rig's remote compile service
# hard enough that even fresh processes hung for minutes, and a
# round-4 rehearsal with 2 streams + the trivial probe wedged it
# again for 15+ minutes (the probe's jnp.sum took 283 s). With the
# cache warm this semaphore is never contended (everything loads);
# it only serializes the cold worst case.
_compile_sem = threading.BoundedSemaphore(
    int(os.environ.get('BENCH_COMPILE_CONCURRENCY', '1')))


def _emit_json():
    with _lock:
        if _state['done']:
            return
        _state['done'] = True
        rtf = (_state['tot_audio'] / _state['tot_wall']
               if _state['tot_wall'] > 0 else 0.0)
        rec = {
            'metric': 'realtime_factor_96k_stereo_headline_corpus',
            'value': round(rtf, 1),
            'unit': 'x_realtime',
            'vs_baseline': round(rtf / REF_RTF_BASELINE, 2),
            'configs': '%d/%d' % (_state['n_configs'], N_CORPUS),
            'pipelined': _state['pipelined'],
        }
        if _state['fidelity_db'] is not None:
            rec['fidelity_db'] = round(_state['fidelity_db'], 1)
        # watchdogged partial with the trivial device probe never
        # completing = the dev-rig tunnel wedged under another
        # tenant's load before ANY device work (an environmental
        # failure mode seen 3x in round 5, self-healing in ~10-30
        # min) -- tell the reader the numbers describe a wedge, not
        # the engine
        if _state['n_configs'] == 0 \
                and not _state.get('probe_done', False):
            rec['tunnel_wedge_suspected'] = True
        for k in ('corpus_full_scripts', 'corpus_full_audio_s'):
            if k in _state:
                rec[k] = _state[k]
        for k, v in sorted(_state['per_config'].items()):
            rec[k] = round(v, 2 if k.endswith('_vs_ref') else 1)
        print(json.dumps(rec), flush=True)


def _watchdog():
    time.sleep(DEADLINE)
    print('# watchdog: deadline %.0fs hit, emitting partial aggregate '
          '(%d/%d corpus configs measured)'
          % (DEADLINE, _state['n_configs'], N_CORPUS),
          file=sys.stderr, flush=True)
    _emit_json()
    os._exit(0)


def _cpu_render(src, is_path, srate):
    """Host-oracle int16 stereo render (NumPy backend -- itself
    byte-identical to the reference binary on this script,
    tests/test_engine_corpus.py)."""
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.cpu import Generator as CpuGenerator
    prg = build_program(ScriptArg(str=src, is_path=is_path,
                                  no_time=True, predef=[]))
    g = CpuGenerator(prg, srate)
    buf = np.zeros(65536 * 2, np.int16)
    chunks = []
    while True:
        more, n = g.run(buf, 65536, True)
        chunks.append(buf[:n * 2].copy())
        if not more:
            break
    return np.concatenate(chunks).reshape(-1, 2)


def _self_check():
    """Device-path fidelity gate: the CPU-platform test suite never
    exercises the TPU Pallas kernels, so the bench validates the
    device render before timing it -- (a) the tap-gather kernel
    bit-exact vs direct table indexing for all 12 waves, (b) the
    forward-fill kernel vs the NumPy scan, (c) a Wsin render
    bit-identical to the NumPy host backend (itself byte-identical
    to the reference binary)."""
    import jax
    import numpy as np
    from saugns_tpu.dsp import wavetables as W
    from saugns_tpu.render import jdsp
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.engine import JaxGenerator
    import jax.numpy as jnp
    ok = True
    _, piluts = W.get_tables()
    piluts = np.asarray(piluts)
    cells = np.random.RandomState(0).randint(
        0, 2048, 50000).astype(np.int32)
    cj = jnp.asarray(cells)
    for w in range(12):
        out = np.asarray(jdsp.gather_taps(cj, w))
        ref = piluts[w][(cells[None, :]
                         + np.arange(-1, 3)[:, None]) & 2047]
        n = int((out != ref).sum())
        if n:
            ok = False
            print('# SELF-CHECK FAIL: tap gather wave %d: %d '
                  'mismatches' % (w, n), file=sys.stderr, flush=True)
    # forward-fill kernel (TPU-only path; CPU tests never run it)
    rng = np.random.RandomState(1)
    n = 50000
    s = rng.randn(n).astype(np.float32)
    valid = rng.rand(n) < 0.5
    seed = np.float32(2.5)
    out = np.asarray(jdsp.forward_fill_last_valid(
        jnp.asarray(s), jnp.asarray(valid), jnp.float32(seed)))
    idx = np.where(valid, np.arange(1, n + 1), 0)
    np.maximum.accumulate(idx, out=idx)
    ref = np.concatenate([[seed], s])[idx]
    n_bad = int((out != ref).sum())
    if n_bad:
        ok = False
        print('# SELF-CHECK FAIL: forward fill: %d mismatches'
              % n_bad, file=sys.stderr, flush=True)
    prg = build_program(ScriptArg(str='Wsin', is_path=False,
                                  no_time=True, predef=[]))
    g = JaxGenerator(prg, SRATE)
    dev = g.assemble(g.render_device())
    ref = _cpu_render('Wsin', False, SRATE)
    devv = dev[:len(ref)]
    n = int(np.any(devv != ref, axis=1).sum())
    if n:
        ok = False
        print('# SELF-CHECK FAIL: Wsin device render differs from '
              'host backend on %d/%d frames' % (n, len(ref)),
              file=sys.stderr, flush=True)
    print('# self-check: %s' % ('ok' if ok else 'FAILED'),
          file=sys.stderr, flush=True)
    return ok


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    from saugns_tpu.lang.program import ScriptArg, build_program
    from saugns_tpu.render.engine import JaxGenerator
    from saugns_tpu.render import engine as _engine
    from saugns_tpu.render import jdsp
    # configure the persistent compile cache BEFORE the first kernel
    # compile: the self-check's Pallas kernels otherwise bypass it
    # entirely (engine only configures it at JaxGenerator
    # construction), and a cold Mosaic compile through the dev-rig
    # tunnel is minutes -- this exact gap ate the round-3 driver
    # budget before a single corpus config was measured
    _engine._ensure_compile_cache()
    jdsp.get_tables()
    cache_dir = os.path.join(
        os.environ.get('SAUGNS_TPU_CACHE',
                       os.path.expanduser('~/.cache/saugns_tpu_xla')),
        jax.default_backend())
    n_seed = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) \
        else 0
    print('# compile cache ready (%d entries); probing device...'
          % n_seed, file=sys.stderr, flush=True)

    # tunnel-health probe in a side thread: on the shared dev rig the
    # remote service can wedge under another tenant's load, blocking
    # every RPC indefinitely -- if this line never appears in a
    # watchdogged run's stderr, the wedge hit before ANY device work
    # (environmental, not a compile-cost problem). DELIBERATELY
    # outside _compile_sem: serializing it behind a wedged corpus
    # compile would blind exactly the diagnosis it exists for; its
    # own jnp.sum compile is the one tolerated second stream
    def _probe():
        import jax.numpy as jnp
        t0 = time.time()
        v = float(jnp.sum(jnp.arange(8.0)))
        print('# device probe: sum=%g in %.2fs' % (v, time.time() - t0),
              file=sys.stderr, flush=True)
        with _lock:
            _state['probe_done'] = True
    threading.Thread(target=_probe, daemon=True).start()

    results = {}

    def _record(key, rtf):
        results[key] = rtf
        with _lock:
            _state['per_config'][key] = rtf

    gens = []
    from concurrent.futures import ThreadPoolExecutor, as_completed
    ex = ThreadPoolExecutor(max_workers=N_CORPUS + 3)

    # the corpus fidelity gate's host oracle renders on the local CPU
    # -- zero tunnel contention, so it starts immediately
    gate_name, gate_src = 'rainy_thunder', \
        '/root/reference/examples/rainy_thunder.sau'
    gate_fut = None
    if os.path.exists(gate_src):
        gate_fut = ex.submit(_cpu_render, gate_src, True, SRATE)

    def warm_one(cfg):
        name, src, is_path = cfg
        if is_path and not os.path.exists(src):
            return None
        prg = build_program(ScriptArg(str=src, is_path=is_path,
                                      no_time=True, predef=[]))
        if prg is None:
            return None
        g = JaxGenerator(prg, SRATE)
        with _compile_sem:
            print('# %s: dispatching first render' % name,
                  file=sys.stderr, flush=True)
            _force(g.render_device())  # compile + warm + first-touch
        audio_s = g.plan.signal_end / SRATE
        wall = None
        for _ in range(3):
            t0 = time.time()
            _force(g.render_device())
            w = time.time() - t0
            if _plausible(audio_s, w):
                wall = w
                break
        return name, g, wall

    # phase 1: warm the three corpus configs and STRICTLY BEFORE
    # wsin/poly/self-check -- if the budget dies here, the partial
    # aggregate still covers only corpus configs, and the JSON says
    # how many. Each records one timed pass as the fallback aggregate.
    # The self-check runs AFTER the warms (phase 1a): on a cold cache
    # its Pallas-kernel compiles must never starve the corpus
    # aggregate of budget (they ate the round-3 driver capture).
    futs = [ex.submit(warm_one, cfg) for cfg in CONFIGS]
    gate_gen = None
    for fut in as_completed(futs):
        w = fut.result()
        if w is None:
            continue
        name, g, wall = w
        audio_s = g.plan.signal_end / SRATE
        gens.append((name, g, audio_s))
        if name == gate_name:
            gate_gen = g
        if wall is None:
            continue  # all warm passes replayed; phase 3 retries
        _record(name, audio_s / wall)
        with _lock:
            if not _state['pipelined']:
                _state['tot_audio'] += audio_s
                _state['tot_wall'] += wall
                _state['n_configs'] += 1
        print('# %-22s warmed; single-pass RTF %8.1f'
              % (name, audio_s / wall), file=sys.stderr,
              flush=True)

    # phase 1a: device-path fidelity self-check (tap-gather /
    # forward-fill kernels, Wsin device bit-identity) -- after the
    # corpus warms so its kernel compiles can't eat their budget,
    # before the HEADLINE timing so a broken Pallas kernel is loudly
    # flagged (phase 1's single-pass RTFs may already sit in the
    # fallback aggregate by now; the pipelined phase-2 measurement
    # that normally becomes the headline runs strictly after this)
    try:
        with _compile_sem:
            _self_check()
    except Exception as e:
        print('# self-check errored: %s' % e, file=sys.stderr,
              flush=True)

    # phase 1b: on-chip corpus fidelity gate, before any headline
    # timing -- a full corpus script at 96 kHz SNR-compared against
    # the CPU oracle (the CPU-platform suite cannot see a broken
    # Pallas kernel; this can)
    if gate_fut is not None and gate_gen is not None:
        try:
            ref = gate_fut.result()
            dev = gate_gen.assemble(gate_gen.render_device())
            dev = dev[:len(ref)]
            err = (dev.astype(np.float64)
                   - ref.astype(np.float64)).ravel()
            p = float((ref.astype(np.float64) ** 2).sum())
            e = float((err ** 2).sum())
            snr = float('inf') if e == 0 else 10 * np.log10(p / e)
            with _lock:
                _state['fidelity_db'] = min(snr, 999.0)
            status = 'ok' if snr >= 90.0 else 'FAILED (<90 dB)'
            print('# fidelity-gate %s 96k on-chip vs CPU oracle: '
                  '%.1f dB: %s' % (gate_name, snr, status),
                  file=sys.stderr, flush=True)
            if snr < 90.0:
                print('# FIDELITY GATE FAILED -- timing numbers below '
                      'describe a broken render', file=sys.stderr,
                      flush=True)
        except Exception as e:
            print('# fidelity gate errored: %s' % e, file=sys.stderr,
                  flush=True)

    # phase 2 -- the headline number: the corpus configs rendered
    # back-to-back as one pipelined device stream (dispatch is
    # asynchronous; the device executes the renders serially) with
    # a single final sync -- exactly how a production pipeline
    # renders a corpus, and the analog of timing the reference binary
    # over a script list. The dev-rig tunnel's ~30 ms completion
    # round trip is paid once instead of once per script. Best of 3:
    # the bench chip is shared, and single passes hit tenant
    # contention.
    if gens:
        agg_wall = float('inf')
        agg_audio = sum(a for _n, _g, a in gens)
        for _ in range(3):
            t0 = time.time()
            all_pieces = []
            for _n, g, _a in gens:
                all_pieces.extend(g.render_device())
            _force(all_pieces)
            w = time.time() - t0
            if _plausible(agg_audio, w):
                agg_wall = min(agg_wall, w)
        if agg_wall == float('inf'):
            agg_wall = 0.0
        if agg_wall > 0:
            with _lock:
                _state['pipelined'] = True
                _state['tot_audio'] = agg_audio
                _state['tot_wall'] = agg_wall
                _state['n_configs'] = len(gens)
        print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
              '(%d scripts, one sync)'
              % ('corpus-pipelined', agg_audio, agg_wall,
                 agg_audio / agg_wall, len(gens)),
              file=sys.stderr, flush=True)

    # phase 2c -- the FULL examples corpus (BASELINE.md's remaining
    # row): every renderable script at 96 kHz stereo, pipelined with
    # one forced fetch. Warming is budgeted: scripts warm until the
    # cutoff, and the JSON states exactly how many the number covers.
    # With the shipped AOT export/compile packs every script loads
    # without tracing or XLA recompilation; a cold cache run reports
    # an honest partial instead of blowing the deadline.
    import glob as _glob
    t_start = time.time()

    def corpus_full_warm():
        cutoff = DEADLINE - 120.0
        scripts = sorted(_glob.glob(CORPUS_GLOB, recursive=True))
        cgens = []
        for src in scripts:
            if time.time() - t_start > cutoff:
                print('# corpus_full: warm budget exhausted after %d/'
                      '%d scripts' % (len(cgens), len(scripts)),
                      file=sys.stderr, flush=True)
                break
            try:
                prg = build_program(ScriptArg(
                    str=src, is_path=True, no_time=True, predef=[]))
                if prg is None or prg.name is None or not prg.events:
                    continue
                g = JaxGenerator(prg, SRATE)
                with _compile_sem:
                    _force(g.render_device())
                cgens.append((src, g))
            except Exception as e:
                print('# corpus_full: %s failed: %s'
                      % (os.path.basename(src), e), file=sys.stderr,
                      flush=True)
        return cgens, len(scripts)

    def corpus_full_measure(cgens, n_total):
        if not cgens:
            return
        audio_total = sum(g.plan.signal_end / SRATE
                          for _src, g in cgens)
        # the 75 salted dispatches make a runtime replay impossible,
        # and light scripts legitimately exceed the single-script
        # plausibility bound, so the corpus aggregate uses its own
        # (looser) bound
        wall = float('inf')
        for _ in range(3):
            t0 = time.time()
            pieces = []
            for _src, g in cgens:
                pieces.extend(g.render_device())
            _force(pieces)
            w = time.time() - t0
            if w > 0 and audio_total / w <= 20000.0:
                wall = min(wall, w)
        if wall == float('inf'):
            return
        rtf = audio_total / wall
        with _lock:
            _state['per_config']['corpus_full_rtf'] = rtf
            _state['per_config']['corpus_full_vs_ref'] = \
                rtf / (1685.8 / REF_WALL_FULL_CORPUS)
        _state['corpus_full_scripts'] = '%d/%d' % (len(cgens),
                                                   n_total)
        _state['corpus_full_audio_s'] = round(audio_total, 1)
        print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
              '(%d/%d scripts, one sync; ref binary %.1fx)'
              % ('corpus-full', audio_total, wall, rtf,
                 len(cgens), n_total,
                 1685.8 / REF_WALL_FULL_CORPUS),
              file=sys.stderr, flush=True)

    def fidelity_gates(cgens):
        """Per-feature on-chip gates: device renders (already warmed
        by corpus_full) SNR-compared against the CPU oracle."""
        by_src = dict(cgens or [])
        for name, src in GATE_CONFIGS:
            if name == gate_name:
                continue  # phase 1b already gated rainy_thunder
            g = by_src.get(src)
            if g is None:
                continue
            try:
                ref = _cpu_render(src, True, SRATE)
                dev = g.assemble(g.render_device())[:len(ref)]
                err = (dev.astype(np.float64)
                       - ref.astype(np.float64)).ravel()
                p = float((ref.astype(np.float64) ** 2).sum())
                e = float((err ** 2).sum())
                snr = float('inf') if e == 0 else 10 * np.log10(p / e)
                with _lock:
                    _state['per_config']['gate_%s_db' % name] = \
                        min(snr, 999.0)
                status = 'ok' if snr >= 90.0 else 'FAILED (<90 dB)'
                print('# fidelity-gate %s 96k on-chip: %.1f dB: %s'
                      % (name, snr, status), file=sys.stderr,
                      flush=True)
            except Exception as e:
                print('# fidelity-gate %s errored: %s' % (name, e),
                      file=sys.stderr, flush=True)

    def script_list_bench():
        """The real CLI path over the 20-script heavy list, muted --
        parse + plan + dispatch per script, one completion sync in
        Player.finish() (the deployment shape of the reference's
        serial script loop, saugns.c:648-659)."""
        from saugns_tpu.cli import main as cli_main
        audio_s = 1010.3
        wall = float('inf')
        for _ in range(3):
            t0 = time.time()
            rc = cli_main(['-m', '-d', '-r', str(SRATE)]
                          + SCRIPT_LIST)
            w = time.time() - t0
            if rc == 0 and w > 0 and audio_s / w <= 20000.0:
                wall = min(wall, w)
        if wall == float('inf'):
            return
        rtf = audio_s / wall
        ref_rtf = audio_s / REF_WALL_SCRIPT_LIST
        with _lock:
            _state['per_config']['script_list_rtf'] = rtf
            _state['per_config']['script_list_vs_ref'] = rtf / ref_rtf
        print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
              '(20 scripts via CLI; ref binary %.1fx)'
              % ('script-list-cli', audio_s, wall, rtf, ref_rtf),
              file=sys.stderr, flush=True)

    # phase 2b: the big poly compile starts only after the corpus
    # aggregate is safely measured; it overlaps the cheap phases below
    def warm_poly():
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
        with _compile_sem:
            _force([bank.render_i16()])
        return bank

    poly_fut = ex.submit(warm_poly)

    # phase 3: wsin (latency smoke config) -- single-shot latency AND
    # sustained throughput (8 salted renders, one sync: the same
    # pipelined methodology as the corpus line; the reference binary
    # analog is running `saugns -m -d -e Wsin` 8 times)
    wsin_gen = None
    w = warm_one(WSIN)
    if w is not None:
        name, wsin_gen, wall = w
        audio_s = wsin_gen.plan.signal_end / SRATE
        if wall is not None:
            _record('wsin', audio_s / wall)
        K = 8
        swall = float('inf')
        for _ in range(3):
            t0 = time.time()
            pieces = []
            for _ in range(K):
                pieces.extend(wsin_gen.render_device())
            _force(pieces)
            ww = time.time() - t0
            if _plausible(audio_s * K, ww):
                swall = min(swall, ww)
        if swall < float('inf'):
            _record('wsin_pipelined', audio_s * K / swall)
            print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
                  '(%d renders, one sync)'
                  % ('wsin-pipelined', audio_s * K, swall,
                     audio_s * K / swall, K),
                  file=sys.stderr, flush=True)

    # phase 3b: RasG self-PM feedback -- the Pallas scalar-loop
    # kernel carries the per-sample recurrence; steady-state best of 3
    w = warm_one(RASG_FB)
    if w is not None:
        name, rg, wall = w
        audio_s = rg.plan.signal_end / SRATE
        best = wall if wall is not None else float('inf')
        for _ in range(2):
            t0 = time.time()
            _force(rg.render_device())
            ww = time.time() - t0
            if _plausible(audio_s, ww):
                best = min(best, ww)
        if best < float('inf'):
            _record('rasg_feedback', audio_s / best)
            print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
                  '(rasg self-PM scalar kernel)'
                  % (name, audio_s, best, audio_s / best),
                  file=sys.stderr, flush=True)

    # phase 4: per-config steady-state refinement (best of 3) + the
    # host-pull figure (a property of the deployment link)
    for name, g, audio_s in gens + (
            [('wsin', wsin_gen, 1.0)] if wsin_gen is not None else []):
        audio_s = g.plan.signal_end / SRATE
        wall = float('inf')
        for _ in range(3):
            t0 = time.time()
            pieces = g.render_device()
            _force(pieces)
            w = time.time() - t0
            if _plausible(audio_s, w):
                wall = min(wall, w)
        if wall == float('inf'):
            continue
        _record(name, audio_s / wall)
        t0 = time.time()
        _ = [np.asarray(x) for x in pieces]
        pull = time.time() - t0
        print('# %-22s %6.1fs audio in %6.3fs -> RTF %8.1f '
              '(host pull +%.2fs)'
              % (name, audio_s, wall, audio_s / wall, pull),
              file=sys.stderr, flush=True)

    # phase 5: bulk polyphony stress -- 1024-voice FM bank, 8 s
    try:
        bank = poly_fut.result()
        audio_s = bank._n_valid() / SRATE
        wall = float('inf')
        for _ in range(3):
            t0 = time.time()
            _force([bank.render_i16()])
            w = time.time() - t0
            if _plausible(audio_s, w):
                wall = min(wall, w)
        if wall == float('inf'):
            raise RuntimeError('all poly passes replayed')
        _record('poly1024', audio_s / wall)
        # context: the reference binary renders this script in 14.0 s
        # on this host (0.57x), i.e. 1024 voices * audio_s / wall
        # voice-seconds per second through the real engine
        print('# %-22s %6.1fs audio in %6.2fs -> RTF %8.1f '
              '(1024 voices, real engine)'
              % ('poly1024', audio_s, wall,
                 results['poly1024']), file=sys.stderr, flush=True)
    except Exception as e:
        print('# poly1024 failed: %s' % e, file=sys.stderr, flush=True)

    # phase 6: full examples corpus -- warm (budgeted, honest n/75),
    # gate the warmed device renders per feature family, THEN time
    # the pipelined corpus; finally the real-CLI script-list line
    cgens, n_total = [], 0
    try:
        cgens, n_total = corpus_full_warm()
    except Exception as e:
        print('# corpus_full warm failed: %s' % e, file=sys.stderr,
              flush=True)
    try:
        fidelity_gates(cgens)
    except Exception as e:
        print('# fidelity gates failed: %s' % e, file=sys.stderr,
              flush=True)
    try:
        corpus_full_measure(cgens, n_total)
    except Exception as e:
        print('# corpus_full measure failed: %s' % e, file=sys.stderr,
              flush=True)
    try:
        script_list_bench()
    except Exception as e:
        print('# script_list failed: %s' % e, file=sys.stderr,
              flush=True)

    _emit_json()


if __name__ == '__main__':
    main()
