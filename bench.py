"""Benchmark: end-to-end synthesis real-time factor on the current device.

Measures, with fixed decode work (static-scan acoustic decode + Griffin-Lim
template + RefineGAN_small vocoder at full default dims):

  * acoustic mel frames/sec (80-step AR scan -> 400 frames)
  * vocoder samples/sec (incl. the 4-iter GL template)
  * end-to-end RTF = synth_time / audio_duration
  * training throughput: one jitted acoustic train step (batch 16 x 400
    frames) and one jitted GAN step (batch 16 x 8192 samples, D x2 + G) at
    reference batch geometry, vs the reference's 2.36 s/batch GAN anchor
    (``retunegan/hparam.py:51``)

Prints ONE JSON line; baseline is the driver's north-star RTF <= 0.05
(>= 20x real time) per chip, so ``vs_baseline = 0.05 / rtf`` (>1 beats it).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# Persistent compilation cache: this environment compiles through a remote
# tunnel (~2 min per program), so cache XLA executables across runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


# bf16 MXU peak per chip (XLA's default matmul precision on TPU lowers f32
# matmuls to bf16 passes); table keyed on jax device_kind substrings
_PEAK_FLOPS = [('v5 lite', 197e12), ('v5e', 197e12), ('v5p', 459e12),
               # plain 'v5' LAST among the v5s: v5p chips report
               # device_kind 'TPU v5' (no p suffix), v5e reports 'TPU v5
               # lite' and matches above first
               ('v5', 459e12),
               ('v4', 275e12), ('v6', 918e12), ('v3', 123e12)]


def _peak_flops() -> float:
    kind = getattr(jax.devices()[0], 'device_kind', str(jax.devices()[0]))
    for key, peak in _PEAK_FLOPS:
        if key in kind.lower():
            return peak
    return 197e12


def _compiled_flops(jitted, *args, **kwargs):
    """FLOP count from XLA's cost model for one call (None if unavailable).
    Same shapes as the timed call, so lower() hits the jit/persistent cache."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get('flops', 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _mfu(flops, step_s):
    if not flops or not step_s:
        return None
    return round(100.0 * flops / step_s / _peak_flops(), 2)


def _bench_train_steps(cfg):
    """Steady-state train-step wall time at reference batch geometry.
    Returns (acoustic_step_s, gan_step_s, acoustic_flops, gan_flops)."""
    from transtacos_retunegan_tpu.text.symbols import get_vocab_size
    from transtacos_retunegan_tpu.train.acoustic_step import (init_state,
                                                              train_step)
    from transtacos_retunegan_tpu.train.vocoder_step import (gan_train_step,
                                                             init_gan_state)

    rng = np.random.RandomState(0)
    b, seg = cfg.vocoder.batch_size, cfg.audio.segment_size
    steps_per_epoch = 568        # reference anchor, retunegan/hparam.py:102

    vb = {
        'mel': jnp.asarray(rng.randn(b, seg // 256, 80).astype(np.float32)),
        'tmpl': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
        'wav': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
    }
    gstate = init_gan_state(cfg, jax.random.PRNGKey(0), vb, steps_per_epoch)
    gstate, m = gan_train_step(cfg, gstate, vb, jax.random.PRNGKey(1),
                               steps_per_epoch)
    float(m['loss_gen_all'])                     # compile + materialize
    for i in range(6):                           # steady-state warmup
        gstate, m = gan_train_step(cfg, gstate, vb, jax.random.PRNGKey(i),
                                   steps_per_epoch)
    float(m['loss_gen_all'])
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        gstate, m = gan_train_step(cfg, gstate, vb, jax.random.PRNGKey(i),
                                   steps_per_epoch)
    float(m['loss_gen_all'])
    gan_s = (time.perf_counter() - t0) / n
    gan_flops = _compiled_flops(gan_train_step, cfg, gstate, vb,
                                jax.random.PRNGKey(0), steps_per_epoch)
    del gstate

    n_txt, t = 32, 400   # ~reference avg utterance (307 frames) to bucket
    ab = {
        'text': jnp.asarray(np.stack(
            [rng.randint(4, get_vocab_size(), (b, n_txt)),
             rng.randint(0, 6, (b, n_txt))], -1).astype(np.int32)),
        'text_lengths': jnp.full((b,), n_txt, jnp.int32),
        'prds': jnp.asarray(rng.randint(0, 6, (b, n_txt)).astype(np.int32)),
        'spec_lengths': jnp.full((b,), t, jnp.int32),
        'mel_targets': jnp.asarray(rng.randn(b, t, 80).astype(np.float32)),
        'mag_targets': jnp.asarray(rng.randn(b, t, 1024).astype(np.float32)),
        'f0_targets': jnp.asarray(
            rng.randint(0, cfg.audio.n_f0_bins, (b, t)).astype(np.int32)),
        'c0_targets': jnp.asarray(rng.randint(0, 32, (b, t)).astype(np.int32)),
        'stop_token_targets': jnp.zeros((b, t), jnp.float32),
        'frame_loss_len': jnp.asarray(t, jnp.int32),
        'text_loss_len': jnp.asarray(n_txt, jnp.int32),
    }
    astate = init_state(cfg, jax.random.PRNGKey(5), ab)

    def _time_step(step_fn, astate):
        astate, al = step_fn(cfg, astate, ab, jax.random.PRNGKey(6))
        float(al['loss'])
        for i in range(6):                       # steady-state warmup
            astate, al = step_fn(cfg, astate, ab, jax.random.PRNGKey(i))
        float(al['loss'])
        t0 = time.perf_counter()
        for i in range(n):
            astate, al = step_fn(cfg, astate, ab, jax.random.PRNGKey(i))
        float(al['loss'])
        return (time.perf_counter() - t0) / n, astate

    # the production pre-decay step (train_acoustic switches on
    # hoist_force_eligible; same function, time-parallel prenet/head)
    from transtacos_retunegan_tpu.train.acoustic_step import (
        hoist_force_eligible, train_step_hoisted)
    assert hoist_force_eligible(cfg, 0)
    ac_hoist_s, astate = _time_step(train_step_hoisted, astate)
    ac_s, astate = _time_step(train_step, astate)
    ac_flops = _compiled_flops(train_step, cfg, astate, ab,
                               jax.random.PRNGKey(0))
    return ac_s, ac_hoist_s, gan_s, ac_flops, gan_flops


def main():
    from transtacos_retunegan_tpu.audio import dsp
    from transtacos_retunegan_tpu.config import Config
    from transtacos_retunegan_tpu.models.acoustic import Tacotron
    from transtacos_retunegan_tpu.models.generators import make_generator
    from transtacos_retunegan_tpu.text import frontend
    from transtacos_retunegan_tpu.train.acoustic_step import init_state

    cfg = Config()
    au = cfg.audio
    r = cfg.acoustic.outputs_per_step
    max_iters = 80                      # 400 frames = 4.64 s of audio
    t_frames = max_iters * r
    audio_seconds = t_frames * au.hop_length / au.sample_rate

    pinyin = ('zhe4 shi4 yi2 ge4 yong4 lai2 ce4 shi4 he2 cheng2 su4 du4 de5 '
              'chang2 ju4 zi5 ni3 hao3 shi4 jie4')
    seq = frontend.serialize_inference(pinyin)
    n_pad = 80
    text = np.zeros((1, n_pad, 2), np.int32)
    text[0, :seq.shape[0]] = seq
    text_j = jnp.asarray(text)
    lens_j = jnp.asarray([seq.shape[0]], np.int32)

    dummy = {
        'text': text_j, 'text_lengths': lens_j,
        'prds': jnp.zeros((1, n_pad), jnp.int32),
        'spec_lengths': jnp.asarray([4 * r]),
        'mel_targets': jnp.zeros((1, 4 * r, au.n_mel)),
        'f0_targets': jnp.zeros((1, 4 * r), jnp.int32),
        'c0_targets': jnp.zeros((1, 4 * r), jnp.int32),
    }
    t_init = time.time()
    ac_params = init_state(cfg, jax.random.PRNGKey(0), dummy).params
    gen = make_generator(cfg)
    gen_init = jax.jit(lambda r1, r2, m, t: gen.init(
        {'params': r1, 'noise': r2}, m, t, train=False))
    gen_params = gen_init(jax.random.PRNGKey(1), jax.random.PRNGKey(2),
                          jnp.zeros((1, t_frames, au.n_mel)),
                          jnp.zeros((1, t_frames * au.hop_length, 1)))['params']
    print(f'# init {time.time() - t_init:.1f}s', file=sys.stderr)

    # production decode-path selection shared with Synthesizer/__graft_entry__
    from transtacos_retunegan_tpu.serve.pipeline import default_fused_decoder
    use_fused = default_fused_decoder()
    if use_fused:
        from transtacos_retunegan_tpu.models.acoustic import posnet_apply
        from transtacos_retunegan_tpu.ops.fused_decoder import fused_decode_full

        @jax.jit
        def acoustic(params, text, lens):
            model = Tacotron(cfg)
            enc = model.apply({'params': params}, text, lens, train=False,
                              encoder_only=True)
            # production kernel (single-launch blocked decode), but with
            # early_exit OFF: random-init params trip the stop token at step
            # 1, so an early-exit decode would skip ~all the work and the
            # RTF would not measure fixed decode throughput.  Serving keeps
            # early_exit=True (serve/pipeline.py), which can only be FASTER
            # than this number on real checkpoints.
            out = fused_decode_full(params['decoder_cell'], cfg, enc['keys'],
                                    enc['values'], enc['mask'], max_iters)
            return posnet_apply(params, out['mel_outputs'], cfg)
    else:
        @jax.jit
        def acoustic(params, text, lens):
            model = Tacotron(cfg)
            out = model.apply({'params': params}, text, lens, train=False,
                              max_iters=max_iters)
            return out['mag_outputs']

    # production serving precision (mirrors serve/pipeline.py 'auto'):
    # bf16 vocoder conv stacks on TPU, f32 elsewhere.  Validated end to end
    # in docs/convergence/bf16/ (bf16-trained vocoder beats its GL template).
    from transtacos_retunegan_tpu.models.precision import compute_dtype
    infer_dtype = 'bfloat16' if use_fused else 'float32'

    def _make_vocode(dtype):
        @jax.jit
        def vocode(params, mag, key):
            s = dsp.spec_to_natural_scale(mag[0].T, au)
            s = dsp.fix_zero_dc(s, au)
            mel = jnp.log(jnp.clip(dsp.mag_to_mel(s, au), min=dsp.EPS_AMP))
            log_mag = jnp.log(jnp.clip(s, min=dsp.EPS_AMP))
            wavlen = au.hop_length * t_frames
            tmpl = dsp.inv_log_mag(log_mag, au, length=wavlen - 1, key=key)
            tmpl = jnp.pad(tmpl, (0, 1))
            with compute_dtype(dtype):
                wav = gen.apply({'params': params}, mel.T[None],
                                tmpl[None, :, None], train=False)
            return wav[0, :, 0].astype(jnp.float32)
        return vocode

    vocode = _make_vocode(infer_dtype)

    key = jax.random.PRNGKey(3)

    # warmup / compile; NOTE: materialize to host -- on this tunneled
    # backend block_until_ready alone does not guarantee completion
    mag = acoustic(ac_params, text_j, lens_j)
    wav = vocode(gen_params, mag, key)
    float(jnp.sum(wav))

    # (1) sustained throughput at fixed QPS (BASELINE config 5): pipeline
    # n_rep requests, materialize once -- amortizes this harness's per-call
    # RPC tunnel latency (fixed ~0.7 s service window regardless of work),
    # measuring actual device time per utterance.  Steady state = MIN over
    # consecutive trials: per-executable warmup on this backend is a 5-7x
    # slowdown whose window is NOT a fixed call count (it has outlasted a
    # 45-call warmup loop), so a single warmup-then-measure block is unsafe.
    from transtacos_retunegan_tpu.tools.bench_precision import _min_of_trials
    n_rep, n_trial = 24, 3

    def _min_trials(fn_once, tag):
        def trial():
            t0 = time.perf_counter()
            fn_once()
            return (time.perf_counter() - t0) / n_rep
        return _min_of_trials(trial, n_trial, tag)

    mags = [None] * n_rep

    def _ac_trial():
        for i in range(n_rep):
            mags[i] = acoustic(ac_params, text_j, lens_j)
        float(sum(jnp.sum(m) for m in mags))
    _ac_trial()                                 # throwaway warmup trial
    t_ac = _min_trials(_ac_trial, 'acoustic')

    def _vo_trial():
        wavs = [vocode(gen_params, mags[i], key) for i in range(n_rep)]
        float(sum(jnp.sum(w) for w in wavs))
    _vo_trial()                                 # throwaway warmup trial
    t_vo = _min_trials(_vo_trial, 'vocode')

    # f32 vocoder for comparison when production runs bf16.  This program is
    # freshly built here, so burn two full throwaway trials first: the
    # per-executable warmup window has been observed past 50 calls, and a
    # min() over still-warming trials would overstate the bf16 advantage.
    t_vo_f32 = None
    if infer_dtype != 'float32':
        vocode_f32 = _make_vocode('float32')

        def _vo32_trial():
            ws = [vocode_f32(gen_params, mags[i], key) for i in range(n_rep)]
            float(sum(jnp.sum(x) for x in ws))
        _vo32_trial(); _vo32_trial()
        t_vo_f32 = _min_trials(_vo32_trial, 'vocode_f32')
        del vocode_f32

    # (2) single-request latency: one blocking acoustic->vocode chain per
    # measurement (includes this harness's RPC tunnel round trips; on
    # directly-attached hardware this matches (1) closely).  Min over a few
    # calls -- a single sample is dominated by tunnel jitter.
    t_single = None
    for _ in range(5):
        t0 = time.perf_counter()
        w = vocode(gen_params, acoustic(ac_params, text_j, lens_j), key)
        float(jnp.sum(w))
        dt = time.perf_counter() - t0
        t_single = dt if t_single is None else min(t_single, dt)

    # (2b) concurrent-request QPS through the self-batching serving frontend
    # (serve/batcher.py): 16 independent threads hit BatchingFrontend.vocode
    # with fixed 400-frame specs; the coalescer groups them into batched
    # device programs (max_batch=8).  Contrast with the one-at-a-time
    # single_request_latency above -- the reference serves requests strictly
    # serially (app.py:61-90).
    t_conc = n_conc = None
    try:
        from concurrent.futures import ThreadPoolExecutor

        from transtacos_retunegan_tpu.serve.batcher import BatchingFrontend
        from transtacos_retunegan_tpu.serve.pipeline import Synthesizer
        synth = Synthesizer(cfg, infer_dtype=infer_dtype)
        fe = BatchingFrontend(synth, max_batch=8, window_s=0.006)
        n_conc = 16
        rng_s = np.random.RandomState(7)
        specs = [np.abs(rng_s.randn(au.n_freq, t_frames) * 0.01)
                 .astype(np.float32) for _ in range(n_conc)]

        def _conc_trial():
            with ThreadPoolExecutor(n_conc) as ex:
                t0 = time.perf_counter()
                list(ex.map(fe.vocode, specs))
                return (time.perf_counter() - t0) / n_conc
        _conc_trial()                               # compile + warmup
        t_conc = _min_of_trials(_conc_trial, n_trial, 'concurrent')

        # sustained closed-loop tail latency (p50/p95/p99): what a serving
        # SLO sees, vs the min-of-trials throughput above which buries
        # outlier trials (round-4's 1569 ms stall).  Short leg here; the
        # full 60 s study with outlier classification is
        # tools/serving_latency.py -> docs/serving_latency.json.
        from transtacos_retunegan_tpu.tools.serving_latency import (
            run_load, warm_cohort_sizes)
        # the closed loop makes ragged cohorts (padded to pow2): warm every
        # cohort-size executable first or the window measures the compiler
        warm_cohort_sizes(fe, specs)
        fns = [(lambda s=s: fe.vocode(s)) for s in specs]
        tail = run_load(fns, duration_s=20.0, warmup_s=6.0)
        conc_tail = dict(tail['steady_state'] or {})
        conc_tail['qps'] = tail['qps_steady']
        conc_tail['outliers_gt_3x_p50'] = len(
            tail.get('outliers_gt_3x_p50', []))
        if tail['errors'] or not tail['steady_state']:
            conc_tail['errors'] = tail['errors'][:3]
            conc_tail['overall'] = tail['overall']
        del synth, fe
    except Exception as e:
        conc_tail = None
        print(f'# concurrent-QPS leg skipped: {e!r}', file=sys.stderr)

    # (3) training throughput (free the inference params first; the GAN
    # step holds G+D x3 + two optimizer states)
    # inference-path FLOPs for utilization accounting
    ac_infer_flops = _compiled_flops(acoustic, ac_params, text_j, lens_j)
    vo_infer_flops = _compiled_flops(vocode, gen_params, mags[0], key)

    del mags, mag, wav, w
    t0 = time.time()
    (ac_step_s, ac_hoist_s, gan_step_s,
     ac_flops, gan_flops) = _bench_train_steps(cfg)
    print(f'# train-step bench {time.time() - t0:.1f}s', file=sys.stderr)

    # (4) peak per-chip training throughput at bs64.  Both train steps are
    # dispatch/latency bound at the reference's bs16 (the GPU-memory point,
    # retunegan/hparam.py:45-56); the production number on a TPU is the
    # largest batch that fits (docs/train_scaling.json: 2.85x acoustic
    # samples/s, 1.4x GAN at bs64).  Reuses the scaling study's helpers so
    # bench and study report the same program.
    peak = None
    if os.environ.get('BENCH_SKIP_SCALING', '') != '1':
        try:
            from transtacos_retunegan_tpu.tools.train_scaling import (
                bench_acoustic as _peak_ac, bench_gan as _peak_gan)
            t0 = time.time()
            peak = {'batch': 64,
                    'acoustic': _peak_ac(cfg, 64, 400, 32),
                    'gan': _peak_gan(cfg, 64)}
            print(f'# peak-throughput bench {time.time() - t0:.1f}s',
                  file=sys.stderr)
        except Exception as e:
            print(f'# peak-throughput leg skipped: {e!r}', file=sys.stderr)

    rtf = (t_ac + t_vo) / audio_seconds
    result = {
        'metric': 'e2e_rtf',
        'value': round(rtf, 5),
        'unit': 'synth_time/audio_time at sustained QPS (lower is better)',
        'vs_baseline': round(0.05 / rtf, 3),
        'detail': {
            'device': str(jax.devices()[0]),
            'acoustic_s': round(t_ac, 4),
            'vocoder_s': round(t_vo, 4),
            'single_request_latency_s': round(t_single, 4),
            'single_request_rtf': round(t_single / audio_seconds, 5),
            'concurrent_requests': n_conc,
            'concurrent_qps': round(1.0 / t_conc, 1) if t_conc else None,
            'concurrent_stream_ms': round(t_conc * 1000, 2) if t_conc else None,
            'concurrent_rtf': (round(t_conc / audio_seconds, 6)
                               if t_conc else None),
            # sustained-load per-request latency distribution (20 s
            # closed loop at n_conc workers; steady state = post-warmup)
            'concurrent_tail': conc_tail,
            'audio_s': round(audio_seconds, 3),
            'mel_frames_per_s': round(t_frames / t_ac, 1),
            'vocoder_samples_per_s': round(t_frames * au.hop_length / t_vo, 1),
            'fused_pallas_decoder': use_fused,
            'vocoder_infer_dtype': infer_dtype,
            'vocoder_s_f32': round(t_vo_f32, 4) if t_vo_f32 else None,
            # the production pre-decay step (hoisted prenet/head); the
            # stock scan step is what post-decay training runs
            'acoustic_step_ms': round(ac_hoist_s * 1000, 1),
            'acoustic_step_scan_ms': round(ac_step_s * 1000, 1),
            'gan_step_ms': round(gan_step_s * 1000, 1),
            'gan_step_vs_ref_2.36': round(2.36 / gan_step_s, 1),
            # largest-batch-that-fits throughput (see comment at the leg)
            'peak_bs64': peak,
            # utilization accounting (XLA cost model FLOPs / wall / peak);
            # the AR decode is latency- not FLOP-bound, so acoustic-infer
            # MFU is expected to be low -- it contextualizes, not indicts
            'mfu': {
                'peak_flops_assumed': _peak_flops(),
                'acoustic_step_pct': _mfu(ac_flops, ac_hoist_s),
                'acoustic_step_scan_pct': _mfu(ac_flops, ac_step_s),
                'gan_step_pct': _mfu(gan_flops, gan_step_s),
                'acoustic_infer_pct': _mfu(ac_infer_flops, t_ac),
                'vocoder_infer_pct': _mfu(vo_infer_flops, t_vo),
                'gan_step_gflops': round(gan_flops / 1e9, 1) if gan_flops else None,
                'acoustic_step_gflops': round(ac_flops / 1e9, 1) if ac_flops else None,
            },
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
