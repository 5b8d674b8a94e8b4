"""Per-chip batch-size scaling of both train steps (throughput study).

The reference trains at batch 16 on a single GPU and its headline anchor is
the GAN step's 2.36 s/batch at that size (``retunegan/hparam.py:45-56``).
On a TPU the interesting production question is different: what batch size
saturates one chip?  Both steps are dispatch/latency bound at bs16
(``docs/acoustic_step_trace.json``: every stage bottoms out near a ~3 ms
floor), so throughput should scale SUPER-linearly in batch until the MXU is
actually busy — larger batches amortize the same kernel-launch tail over
more samples.  This tool measures it:

for bs in {16, 32, 64}:  ms/step, samples/s, MFU (XLA cost model FLOPs /
wall / chip peak) for

  * the acoustic hoisted-force train step (production pre-decay step,
    bs x T400 x N32 geometry, same as bench.py), and
  * the vocoder GAN step (D x2 + G at segment 8192, reference recipe).

Results land in ``docs/train_scaling.json``; ``docs/PERF_NOTES.md``
carries the reading.  Budget one fresh tunnel compile (~2-5 min) per
(step, bs) pair on first run; the persistent cache makes re-runs cheap.

Usage:
  python -m transtacos_retunegan_tpu.tools.train_scaling \
      [--batches 16,32,64] [--out docs/train_scaling.json] [--tiny]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax

_CACHE = os.path.join(os.getcwd(), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ..config import Config  # noqa: E402
from .acoustic_step_ab import make_batch, time_step  # noqa: E402

# chip peak table shared with bench.py semantics (bf16 MXU peak)
_PEAK_FLOPS = [('v5 lite', 197e12), ('v5e', 197e12), ('v5p', 459e12),
               ('v5', 459e12), ('v4', 275e12), ('v6', 918e12),
               ('v3', 123e12)]


def _peak_flops() -> float:
    kind = getattr(jax.devices()[0], 'device_kind', str(jax.devices()[0]))
    for key, peak in _PEAK_FLOPS:
        if key in kind.lower():
            return peak
    return 197e12


def _compiled_flops(jitted, *args, **kwargs):
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get('flops', 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def bench_acoustic(cfg: Config, b: int, t: int, n_txt: int) -> dict:
    from ..train.acoustic_step import (hoist_force_eligible, init_state,
                                       train_step_hoisted)
    assert hoist_force_eligible(cfg, 0)
    batch = make_batch(cfg, b=b, n_txt=n_txt, t=t)
    state = init_state(cfg, jax.random.PRNGKey(5), batch)
    step_s, state = time_step(cfg, batch, step_fn=train_step_hoisted,
                              state=state)
    flops = _compiled_flops(train_step_hoisted, cfg, state, batch,
                            jax.random.PRNGKey(0))
    return {
        'step_ms': round(step_s * 1000.0, 2),
        'samples_per_s': round(b / step_s, 1),
        'frames_per_s': round(b * t / step_s, 0),
        'mfu_pct': (round(100.0 * flops / step_s / _peak_flops(), 2)
                    if flops else None),
    }


def bench_gan(cfg: Config, b: int) -> dict:
    from ..train.vocoder_step import gan_train_step, init_gan_state
    rng = np.random.RandomState(0)
    seg = cfg.audio.segment_size
    steps_per_epoch = 568                  # reference anchor for lr schedule
    vb = {
        'mel': jnp.asarray(rng.randn(b, seg // 256, 80).astype(np.float32)),
        'tmpl': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
        'wav': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
    }
    state = init_gan_state(cfg, jax.random.PRNGKey(0), vb, steps_per_epoch)

    def run(state, i):
        state, m = gan_train_step(cfg, state, vb, jax.random.PRNGKey(i),
                                  steps_per_epoch)
        return state, m

    state, m = run(state, 0)
    float(m['loss_gen_all'])               # compile + materialize
    for i in range(6):
        state, m = run(state, i)
    float(m['loss_gen_all'])
    n, best = 10, None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            state, m = run(state, i)
        float(m['loss_gen_all'])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    flops = _compiled_flops(gan_train_step, cfg, state, vb,
                            jax.random.PRNGKey(0), steps_per_epoch)
    return {
        'step_ms': round(best * 1000.0, 2),
        'samples_per_s': round(b / best, 1),
        'audio_s_per_s': round(b * seg / cfg.audio.sample_rate / best, 1),
        'mfu_pct': (round(100.0 * flops / best / _peak_flops(), 2)
                    if flops else None),
    }


def _time_fn(fn, *args, n: int = 10, trials: int = 3):
    """Steady-state seconds per call: pipeline n calls, materialize once,
    min over trials (same discipline as bench.py)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(6):
        out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def gan_stages(cfg: Config, b: int) -> dict:
    """Per-stage GAN step decomposition at batch ``b``: which stage stops
    scaling linearly explains the bs32->bs64 per-sample throughput cliff
    (``docs/train_scaling.json``: exactly-2x step time 16->32, then 1.4x
    per-sample gain at 64)."""
    from ..models import vocoder_losses as L
    from ..train.vocoder_step import (_disc_forward, apply_generator,
                                      init_gan_state)
    rng = np.random.RandomState(0)
    seg = cfg.audio.segment_size
    vb = {
        'mel': jnp.asarray(rng.randn(b, seg // 256, 80).astype(np.float32)),
        'tmpl': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
        'wav': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
    }
    state = init_gan_state(cfg, jax.random.PRNGKey(0), vb, 568)
    grng = {'noise': jax.random.PRNGKey(7)}
    y = vb['wav']

    g_fwd = jax.jit(lambda gp: apply_generator(cfg, gp, vb, grng, train=True))
    y_g = jax.block_until_ready(g_fwd(state.gen_params))
    _, specs_r, specs_g = L.multi_stft_specs_and_loss(y, y_g, cfg)

    mstft = jax.jit(lambda a, c: L.multi_stft_specs_and_loss(a, c, cfg)[0])

    d_fwd = jax.jit(lambda dp: _disc_forward(cfg, dp, y, y_g, specs_r,
                                             specs_g))

    def d_loss(dp):
        (sr, sg, _, _), (pr, pg, _, _), (tr, tg, _, _) = _disc_forward(
            cfg, dp, y, y_g, specs_r, specs_g)
        return (L.discriminator_loss(sr, sg, cfg)
                + L.discriminator_loss(pr, pg, cfg)
                + L.discriminator_loss(tr, tg, cfg))
    d_fwdbwd = jax.jit(lambda dp: jax.grad(d_loss)(dp))

    def g_loss(gp):
        y_hat = apply_generator(cfg, gp, vb, grng, train=True)
        loss_mstft, sp_r, sp_g = L.multi_stft_specs_and_loss(y, y_hat, cfg)
        (sr, sg, fsr, fsg), (pr, pg, fpr, fpg), (tr, tg, ftr, ftg) = \
            _disc_forward(cfg, state.disc_params, y, y_hat, sp_r, sp_g)
        return (L.generator_loss(sg, sr, cfg) + L.generator_loss(pg, pr, cfg)
                + L.generator_loss(tg, tr, cfg)
                + (L.feature_loss(fsr, fsg) + L.feature_loss(fpr, fpg)
                   + L.feature_loss(ftr, ftg)) * cfg.vocoder.w_loss_fm
                + loss_mstft * cfg.vocoder.w_loss_mstft)
    g_fwdbwd = jax.jit(lambda gp: jax.grad(g_loss)(gp))

    stages = {}
    for name, fn, arg in (
            ('g_fwd', g_fwd, state.gen_params),
            ('mstft', mstft, None),
            ('d_fwd', d_fwd, state.disc_params),
            ('d_fwdbwd', d_fwdbwd, state.disc_params),
            ('g_fwdbwd', g_fwdbwd, state.gen_params)):
        s = (_time_fn(fn, y, y_g) if name == 'mstft'
             else _time_fn(fn, arg))
        flops = (_compiled_flops(fn, y, y_g) if name == 'mstft'
                 else _compiled_flops(fn, arg))
        stages[name] = {
            'ms': round(s * 1000.0, 2),
            'ms_per_sample': round(s * 1000.0 / b, 3),
            'mfu_pct': (round(100.0 * flops / s / _peak_flops(), 2)
                        if flops else None),
        }
    return stages


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batches', default='16,32,64')
    p.add_argument('--out', default='docs/train_scaling.json')
    p.add_argument('--tiny', action='store_true', default=False,
                   help='tiny dims/geometry (CPU smoke of this script)')
    p.add_argument('--compute_dtype', default='float32',
                   choices=['float32', 'bfloat16'],
                   help='vocoder conv precision for the GAN legs.  bf16 was '
                        'measured 1.06x at bs16 (dispatch-bound, '
                        'docs/PERF_NOTES.md); at bs64 the step is '
                        'compute-bound, where halving MXU pass width should '
                        'actually pay')
    p.add_argument('--gan_only', action='store_true', default=False)
    p.add_argument('--stages', action='store_true', default=False,
                   help='additionally decompose the GAN step per batch size '
                        '(g_fwd / mstft / d_fwd / d_fwdbwd / g_fwdbwd as '
                        'standalone timed programs)')
    args = p.parse_args()
    batches = [int(x) for x in args.batches.split(',')]

    cfg = Config()
    if args.compute_dtype != 'float32':
        cfg = dataclasses.replace(cfg, vocoder=dataclasses.replace(
            cfg.vocoder, compute_dtype=args.compute_dtype))
    t, n_txt = 400, 32
    if args.tiny:
        cfg = dataclasses.replace(
            cfg,
            acoustic=dataclasses.replace(
                cfg.acoustic, embed_depth=32, encoder_depth=32,
                decoder_depth=64, attention_depth=16, prenet_depths=(32,),
                posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
                prdsnet_depth=16, posenc_depth=8),
            vocoder=dataclasses.replace(
                cfg.vocoder, upsample_initial_channel=32,
                multi_stft_params=((512, 256, 60),)),
        )
        t, n_txt, batches = 20, 12, batches[:2]

    result = {'device': str(jax.devices()[0]),
              'acoustic_geometry': f'T{t} x N{n_txt} (hoisted-force step)',
              'gan_geometry': f'segment {cfg.audio.segment_size}, '
                              'D x2 + G reference recipe',
              'gan_compute_dtype': cfg.vocoder.compute_dtype,
              'acoustic': {}, 'gan': {}}
    if not args.gan_only:
        for b in batches:
            result['acoustic'][str(b)] = r = bench_acoustic(cfg, b, t, n_txt)
            print(f'# acoustic bs{b}: {r}', flush=True)
    for b in batches:
        result['gan'][str(b)] = r = bench_gan(cfg, b)
        print(f'# gan bs{b}: {r}', flush=True)
    if args.stages:
        result['gan_stages'] = {}
        for b in batches:
            result['gan_stages'][str(b)] = r = gan_stages(cfg, b)
            print(f'# gan stages bs{b}: {r}', flush=True)

    base_g = result['gan'][str(batches[0])]['samples_per_s']
    result['derived'] = {
        'gan_speedup_vs_bs16_per_sample': {
            str(b): round(result['gan'][str(b)]['samples_per_s'] / base_g, 2)
            for b in batches},
    }
    if not args.gan_only:
        base_a = result['acoustic'][str(batches[0])]['samples_per_s']
        result['derived']['acoustic_speedup_vs_bs16_per_sample'] = {
            str(b): round(result['acoustic'][str(b)]['samples_per_s'] / base_a,
                          2) for b in batches}
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
