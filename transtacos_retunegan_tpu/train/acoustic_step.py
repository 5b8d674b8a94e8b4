"""Jitted train/eval steps for the acoustic model.

One optimizer step = forward (teacher-forced scan) -> loss sum -> Adam with
Noam LR and global-norm clip 1.0 (reference ``tacotron.py:247-266``).  The
step is written against replicated params + batch-sharded data; under a
``jax.sharding.Mesh`` the gradient all-reduce is inserted by the compiler.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.acoustic import Tacotron, compute_losses
from .schedules import noam_lr, teacher_forcing_ratio


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    extra_vars: Any = {}       # non-param collections (CBHG batch_stats)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    hp = cfg.acoustic
    return optax.chain(
        optax.clip_by_global_norm(hp.grad_clip_norm),
        optax.scale_by_adam(b1=hp.adam_beta1, b2=hp.adam_beta2, eps=hp.adam_eps),
        optax.scale_by_learning_rate(lambda step: noam_lr(step, hp)),
    )


def _upcast_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Restore float32 for features that crossed host->device in a 16-bit
    wire dtype (``data/feeder.py::DevicePrefetcher``).  Inside jit the cast
    fuses into the first consumer, so loss math stays float32 at zero cost;
    full-precision batches pass through untouched."""
    return {k: v.astype(jnp.float32)
            if getattr(v, 'dtype', None) in (jnp.float16, jnp.bfloat16)
            else v for k, v in batch.items()}


def init_state(cfg: Config, rng: jax.Array, batch: Dict[str, Any]) -> TrainState:
    model = Tacotron(cfg)

    # jit the init: eager init dispatches thousands of individual ops, which
    # is pathological over a remote-dispatch TPU tunnel
    @jax.jit
    def _init(rng, text, text_lengths, prds, spec_lengths, mel, f0, c0):
        variables = model.init(
            {'params': rng, 'noise': jax.random.fold_in(rng, 1),
             'dropout': jax.random.fold_in(rng, 2),
             'tf': jax.random.fold_in(rng, 3)},
            text, text_lengths, prds, spec_lengths, mel, f0, c0,
            jnp.asarray(1.0), train=True)
        params = variables.pop('params')
        return params, make_optimizer(cfg).init(params), dict(variables)

    params, opt_state, extra = _init(rng, batch['text'], batch['text_lengths'],
                                     batch['prds'], batch['spec_lengths'],
                                     batch['mel_targets'], batch['f0_targets'],
                                     batch['c0_targets'])
    return TrainState(jnp.asarray(0, jnp.int32), params, opt_state, extra)


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step(cfg: Config, state: TrainState, batch: Dict[str, Any],
               rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    batch = _upcast_batch(batch)
    model = Tacotron(cfg)
    tfr = teacher_forcing_ratio(state.step, cfg.acoustic)
    rngs = {'noise': jax.random.fold_in(rng, 1),
            'dropout': jax.random.fold_in(rng, 2),
            'tf': jax.random.fold_in(rng, 3)}

    mutable = list(state.extra_vars.keys())

    def loss_fn(params):
        out = model.apply({'params': params, **state.extra_vars},
                          batch['text'],
                          batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'], tfr,
                          train=True, rngs=rngs,
                          mutable=mutable if mutable else False)
        if mutable:
            out, new_extra = out
        else:
            new_extra = state.extra_vars
        losses = compute_losses(out, batch, cfg, params)
        return losses['loss'], (losses, new_extra)

    grads, (losses, new_extra) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = make_optimizer(cfg).update(grads, state.opt_state,
                                                    state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    losses = dict(losses, grad_norm=gnorm, tfr=tfr,
                  learning_rate=noam_lr(state.step, cfg.acoustic))
    return TrainState(state.step + 1, params, opt_state, new_extra), losses


def hoist_force_eligible(cfg: Config, step: int) -> bool:
    """True while the hoisted-force train step computes the SAME function as
    the standard one: decoder inputs are pure ground truth.  ``force`` always
    is; ``mix``/``random`` are while the cosine TF decay has not engaged
    (tf_ratio == 1.0: mix blends with weight 0, random's coin < 1.0 always).
    The sew layer is the one decoder-adjacent module the hoisted path does
    not implement.
    """
    hp = cfg.acoustic
    if hp.decoder_sew_layer:
        return False
    if hp.tf_method == 'force':
        return True
    return hp.tf_init >= 1.0 and step < hp.tf_start_decay


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step_hoisted(cfg: Config, state: TrainState, batch: Dict[str, Any],
                       rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """``train_step`` with the decode's time-parallel work hoisted out of the
    scan (``models/decoder_fast.py::hoisted_force_decode``).  Same function
    as ``train_step`` whenever ``hoist_force_eligible`` — the train CLI
    switches at the decay boundary (dropout masks come from a different rng
    stream; distribution-identical).
    """
    from ..models.acoustic import posnet_apply
    from ..models.decoder_fast import hoisted_force_decode
    batch = _upcast_batch(batch)
    model = Tacotron(cfg)
    rngs = {'noise': jax.random.fold_in(rng, 1),
            'dropout': jax.random.fold_in(rng, 2),
            'tf': jax.random.fold_in(rng, 3)}
    dec_rng = jax.random.fold_in(rng, 4)

    mutable = list(state.extra_vars.keys())

    def loss_fn(params):
        enc = model.apply({'params': params, **state.extra_vars},
                          batch['text'],
                          batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'],
                          jnp.asarray(1.0), train=True, encoder_only=True,
                          rngs=rngs, mutable=mutable if mutable else False)
        if mutable:
            enc, new_extra = enc
        else:
            new_extra = state.extra_vars
        mel_out, stop_out, alignments = hoisted_force_decode(
            params['decoder_cell'], cfg, batch['mel_targets'],
            enc['keys'], enc['values'], enc['mask'], dropout_rng=dec_rng)
        out = dict(enc, mel_outputs=mel_out, stop_token_outputs=stop_out,
                   mag_outputs=posnet_apply(params, mel_out, cfg),
                   alignments=alignments)
        losses = compute_losses(out, batch, cfg, params)
        return losses['loss'], (losses, new_extra)

    grads, (losses, new_extra) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = make_optimizer(cfg).update(grads, state.opt_state,
                                                    state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    losses = dict(losses, grad_norm=gnorm, tfr=jnp.asarray(1.0),
                  learning_rate=noam_lr(state.step, cfg.acoustic))
    return TrainState(state.step + 1, params, opt_state, new_extra), losses


@functools.partial(jax.jit, static_argnums=(0,))
def summary_stats(cfg: Config, state: TrainState, batch: Dict[str, Any],
                  rng: jax.Array) -> Dict[str, Any]:
    """Histogram payloads for TensorBoard (capability parity with the
    reference's ``tf.summary.histogram`` stats, ``tacotron.py:272-294``):
    the teacher-forced mel/mag outputs, per-parameter gradient L2 norms
    (a pytree of scalars), and predicted prosody marks.

    A separate jitted program (NOT folded into ``train_step``) so the hot
    path pays nothing: this runs only at ``--summary_interval``.
    """
    batch = _upcast_batch(batch)
    model = Tacotron(cfg)
    tfr = teacher_forcing_ratio(state.step, cfg.acoustic)
    rngs = {'noise': jax.random.fold_in(rng, 1),
            'dropout': jax.random.fold_in(rng, 2),
            'tf': jax.random.fold_in(rng, 3)}
    mutable = list(state.extra_vars.keys())

    def loss_fn(params):
        out = model.apply({'params': params, **state.extra_vars},
                          batch['text'],
                          batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'], tfr,
                          train=True, rngs=rngs,
                          mutable=mutable if mutable else False)
        if mutable:
            out, _ = out
        return compute_losses(out, batch, cfg, params)['loss'], out

    grads, out = jax.grad(loss_fn, has_aux=True)(state.params)
    norms = jax.tree.map(jnp.linalg.norm, grads)
    return {'mel_outputs': out['mel_outputs'],
            'mag_outputs': out['mag_outputs'],
            'prds_out': out['prds_out'],
            'grad_norms': norms}


@functools.partial(jax.jit, static_argnums=(0, 3))
def infer_step(cfg: Config, params, batch: Dict[str, Any],
               max_iters: int, extra_vars=None) -> Dict[str, jnp.ndarray]:
    model = Tacotron(cfg)
    return model.apply({'params': params, **(extra_vars or {})}, batch['text'],
                       batch['text_lengths'], train=False, max_iters=max_iters)
