"""A/B the acoustic TRAIN step's decode-scan unroll factor on-device.

Round-3 verdict weak item 3: the training decode is a flax ``nn.scan`` of
~30 small kernels per step (80 steps at bs16/T400), 8.2 ms/step at 1.84%
MFU -- launch/HBM-latency-bound exactly like the old inference path was
(``ops/fused_decoder.py:3-13``).  The cheapest structural lever XLA offers
is ``lax.scan``'s ``unroll``: emitting k steps per loop iteration lets the
compiler fuse across step boundaries and amortize loop overhead.  The knob
exists as ``cfg.acoustic.scan_unroll``; this script measures it.

For each unroll factor: jitted ``train_step`` at reference batch geometry
(bs16, T400, N32 -- same as ``bench.py::_bench_train_steps``), warmup, then
min-of-trials steady-state ms/step.  Also splits forward-only vs full step
at the baseline so the writeup can say where the time goes.

Usage (TPU; one fresh compile per factor, budget ~5 min each cold):
  python -m transtacos_retunegan_tpu.tools.acoustic_step_ab \
      [--unrolls 1,5,10,20] [--out docs/acoustic_step_ab.json]
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
from ..text.symbols import get_vocab_size  # noqa: E402


def make_batch(cfg, b=16, n_txt=32, t=400):
    rng = np.random.RandomState(0)
    return {
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


def time_step(cfg, batch, n_warm=7, n=10, n_trial=3, step_fn=None,
              state=None):
    from ..train.acoustic_step import init_state, train_step
    train_step = step_fn or train_step
    if state is None:
        state = init_state(cfg, jax.random.PRNGKey(5), batch)
    state, losses = train_step(cfg, state, batch, jax.random.PRNGKey(0))
    float(losses['loss'])                       # compile + materialize
    for i in range(n_warm):
        state, losses = train_step(cfg, state, batch, jax.random.PRNGKey(i))
    float(losses['loss'])
    best = None
    for _ in range(n_trial):
        t0 = time.perf_counter()
        for i in range(n):
            state, losses = train_step(cfg, state, batch,
                                       jax.random.PRNGKey(i))
        float(losses['loss'])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best, state


def time_forward(cfg, batch, state, n_warm=7, n=10, n_trial=3):
    """Teacher-forced forward + loss only (no grad): fwd/bwd split."""
    import functools

    from ..models.acoustic import Tacotron, compute_losses

    mutable = list(state.extra_vars.keys())

    @functools.partial(jax.jit, static_argnums=())
    def fwd(params, extra_vars, batch, rng):
        model = Tacotron(cfg)
        rngs = {'noise': jax.random.fold_in(rng, 1),
                'dropout': jax.random.fold_in(rng, 2),
                'tf': jax.random.fold_in(rng, 3)}
        out = model.apply({'params': params, **extra_vars},
                          batch['text'], batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'],
                          jnp.asarray(1.0), train=True, rngs=rngs,
                          mutable=mutable if mutable else False)
        if mutable:
            out, _ = out
        return compute_losses(out, batch, cfg, params)['loss']

    float(fwd(state.params, state.extra_vars, batch, jax.random.PRNGKey(0)))
    for i in range(n_warm):
        l = fwd(state.params, state.extra_vars, batch, jax.random.PRNGKey(i))
    float(l)
    best = None
    for _ in range(n_trial):
        t0 = time.perf_counter()
        for i in range(n):
            l = fwd(state.params, state.extra_vars, batch,
                    jax.random.PRNGKey(i))
        float(l)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--unrolls', default='1,5,10')
    p.add_argument('--out', default='docs/acoustic_step_ab.json')
    p.add_argument('--tiny', action='store_true', default=False,
                   help='tiny dims/geometry (CPU smoke of this script)')
    args = p.parse_args()

    base = Config()
    if args.tiny:
        base = dataclasses.replace(
            base, acoustic=dataclasses.replace(
                base.acoustic, embed_depth=32, encoder_depth=32,
                decoder_depth=64, attention_depth=16, prenet_depths=(32,),
                posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
                prdsnet_depth=16, posenc_depth=8))
    batch = make_batch(base, b=2, n_txt=12, t=20) if args.tiny \
        else make_batch(base)
    rows = {}
    fwd_ms = None
    for k in [int(x) for x in args.unrolls.split(',')]:
        cfg = dataclasses.replace(
            base, acoustic=dataclasses.replace(base.acoustic, scan_unroll=k))
        step_s, state = time_step(cfg, batch)
        rows[str(k)] = {'step_ms': round(step_s * 1000, 2)}
        print(f'# unroll={k}: {step_s * 1000:.2f} ms/step', flush=True)
        if k == 1:
            fwd_s = time_forward(cfg, batch, state)
            fwd_ms = round(fwd_s * 1000, 2)
            print(f'# unroll=1 forward-only: {fwd_ms} ms', flush=True)
        del state

    b_, t_ = batch['prds'].shape[0], batch['mel_targets'].shape[1]
    result = {'device': str(jax.devices()[0]),
              'geometry': f"bs{b_} x T{t_} x N{batch['prds'].shape[1]}"
                          + (' (tiny smoke)' if args.tiny
                             else ' (bench geometry)'),
              'forward_only_ms_at_unroll1': fwd_ms,
              'by_unroll': rows}
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
