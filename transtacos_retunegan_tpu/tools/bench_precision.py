"""A/B benchmark: f32 vs bf16 mixed-precision vocoder compute.

Measures, at reference batch geometry (B=16, 8192-sample segments,
``retunegan/hparam.py:100-104``), steady-state wall time of

  * the full GAN train step (D x2 + G, ``train/vocoder_step.py``)
  * the batch-1 generator forward at serving length (RefineGAN_small)

for ``compute_dtype`` in {float32, bfloat16}, plus the bf16-vs-f32 output
deviation of the generator forward (same params, same inputs) so the speed
number is never quoted without its numeric cost.

Methodology: persistent compilation cache; per variant, K consecutive
trials of N pipelined calls materialized once, reporting the MIN trial
(robust to the tunnel backend's long per-executable warmup window -- see
``_min_of_trials``).

Usage::

    python -m transtacos_retunegan_tpu.tools.bench_precision [--steps 40]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _min_of_trials(run_trial, trials: int, tag: str,
                   max_trials: int = 10, rel_tol: float = 0.05) -> float:
    """Steady-state = MIN over consecutive pipelined trials, extended
    until the sequence CONVERGES.

    Per-executable warmup on this tunneled backend is NOT a fixed call
    count: a freshly-(cache-)loaded program runs 5-7x slow for a window
    that has been observed to outlast 45 warmup calls in one process while
    ending after 31 in another.  ``trials`` is therefore a minimum: if the
    last trial is still the running min (or within ``rel_tol`` of it while
    an earlier trial was far above -- i.e. the sequence was still
    descending), extra trials run up to ``max_trials``.  The per-trial
    sequence is printed to stderr so a measurement that never converged is
    visible rather than silently wrong.
    """
    times = [run_trial() for _ in range(trials)]
    # keep going while the minimum is still being set by the LAST trial --
    # a descending tail means the warmup window hasn't closed yet
    while len(times) < max_trials and (
            min(times) == times[-1]
            or min(times[:-1]) > min(times) * (1 + rel_tol)):
        times.append(run_trial())
    print(f'# {tag} trials ms: ' + ' '.join(f'{t * 1000:.2f}' for t in times),
          file=sys.stderr)
    return min(times)


def _bench_gan(cfg, steps: int, trials: int, tag: str) -> float:
    from ..train.vocoder_step import gan_train_step, init_gan_state
    rng = np.random.RandomState(0)
    b, seg = cfg.vocoder.batch_size, cfg.audio.segment_size
    batch = {
        'mel': jnp.asarray(rng.randn(b, seg // 256, 80).astype(np.float32)),
        'tmpl': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
        'wav': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
    }
    state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, 568)
    holder = [state]

    def trial():
        state = holder[0]
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = gan_train_step(cfg, state, batch,
                                      jax.random.PRNGKey(i), 568)
        float(m['loss_gen_all'])
        dt = (time.perf_counter() - t0) / steps
        holder[0] = state
        return dt

    trial()                                  # compile + first warmup window
    return _min_of_trials(trial, trials, tag)


def _bench_forward(cfg, steps: int, trials: int, tag: str):
    """Batch-1 serving-length forward; returns (seconds, wav) for deviation."""
    from ..train.vocoder_step import apply_generator
    rng = np.random.RandomState(1)
    t_frames = 400                     # bench.py's serving length (4.64 s)
    seg = t_frames * cfg.audio.hop_length
    batch = {
        'mel': jnp.asarray(rng.randn(1, t_frames, 80).astype(np.float32)),
        'tmpl': jnp.asarray((rng.randn(1, seg) * 0.1).astype(np.float32)),
    }
    from ..models.generators import make_generator
    gen = make_generator(cfg)
    params = jax.jit(lambda r: gen.init(
        {'params': r, 'noise': jax.random.fold_in(r, 7)},
        batch['mel'], batch['tmpl'][..., None], train=False))(
            jax.random.PRNGKey(0))['params']
    fwd = jax.jit(lambda p, b: apply_generator(cfg, p, b, {}, train=False))
    wav = fwd(params, batch)
    float(jnp.sum(wav))

    def trial():
        t0 = time.perf_counter()
        outs = [fwd(params, batch) for _ in range(steps)]
        float(sum(jnp.sum(w) for w in outs))
        return (time.perf_counter() - t0) / steps

    return _min_of_trials(trial, trials, tag), np.asarray(wav)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=30,
                   help='pipelined calls per trial')
    p.add_argument('--trials', type=int, default=5,
                   help='consecutive trials; min is reported (warmup-robust)')
    p.add_argument('--skip_gan', action='store_true')
    p.add_argument('--skip_forward', action='store_true')
    p.add_argument('--only', default=None, choices=['float32', 'bfloat16'],
                   help='bench a single variant (split long compiles across '
                        'runs; the persistent cache joins them up)')
    args = p.parse_args()

    from ..config import Config
    out = {'device': str(jax.devices()[0])}
    wavs = {}
    variants = (args.only,) if args.only else ('float32', 'bfloat16')
    for name in variants:
        cfg = Config()
        cfg = dataclasses.replace(cfg, vocoder=dataclasses.replace(
            cfg.vocoder, compute_dtype=name))
        if not args.skip_forward:
            fwd_s, wavs[name] = _bench_forward(cfg, args.steps, args.trials,
                                               f'forward[{name}]')
            out[f'forward_ms_{name}'] = round(fwd_s * 1000, 2)
        if not args.skip_gan:
            t0 = time.time()
            gan_s = _bench_gan(cfg, args.steps, args.trials, f'gan[{name}]')
            print(f'# gan[{name}] bench {time.time() - t0:.0f}s',
                  file=sys.stderr)
            out[f'gan_step_ms_{name}'] = round(gan_s * 1000, 2)

    if len(wavs) == 2:
        d = wavs['bfloat16'] - wavs['float32']
        out['forward_dev_max'] = round(float(np.abs(d).max()), 5)
        out['forward_dev_mean'] = round(float(np.abs(d).mean()), 6)
        out['forward_speedup'] = round(
            out['forward_ms_float32'] / out['forward_ms_bfloat16'], 3)
    if 'gan_step_ms_float32' in out and 'gan_step_ms_bfloat16' in out:
        out['gan_speedup'] = round(
            out['gan_step_ms_float32'] / out['gan_step_ms_bfloat16'], 3)
    print(json.dumps(out))


if __name__ == '__main__':
    sys.exit(main())
