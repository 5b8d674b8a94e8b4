"""Jitted GAN train/eval steps for the vocoder.

Reproduces the reference loop structure (``retunegan/train.py:106-193``):
one generator forward; the discriminators (MSD+MPD+MTD) take ``d_train_times``
optimizer steps on the stop-gradiented fake; then one generator step against
the freshly-updated discriminators with mstft/env/dyn/sm + feature-matching
+ LSGAN adversarial losses.  AdamW(b1=.8, b2=.99) with per-epoch exponential
LR decay (0.999) expressed as a step schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.discriminators import (MultiPeriodDiscriminator,
                                     MultiScaleDiscriminator,
                                     MultiStftDiscriminator)
from ..models.generators import make_generator
from ..models.precision import compute_dtype
from ..models import vocoder_losses as L


class GANState(NamedTuple):
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    disc_params: Any       # {'msd': ..., 'mpd': ..., 'mtd': ...}
    disc_opt: Any


def _lr_schedule(base: float, decay: float, steps_per_epoch: int):
    def sched(step):
        epoch = step // steps_per_epoch
        return base * decay ** epoch.astype(jnp.float32)
    return sched


def make_optimizers(cfg: Config, steps_per_epoch: int
                    ) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    hv = cfg.vocoder
    # optional global-norm clip (off by default = reference semantics; a
    # stability guard for adversarial corpora where the Ds saturate)
    clip = ([optax.clip_by_global_norm(hv.grad_clip_norm)]
            if hv.grad_clip_norm > 0 else [])
    g = optax.chain(*clip, optax.adamw(
        _lr_schedule(hv.learning_rate_g, hv.lr_decay, steps_per_epoch),
        b1=hv.adam_b1, b2=hv.adam_b2, weight_decay=0.01))
    # D takes d_train_times optimizer updates per train step; its schedule
    # counts updates, so scale the epoch length to keep the reference's
    # one-decay-per-epoch semantics (ExponentialLR stepped per epoch)
    d = optax.chain(*clip, optax.adamw(
        _lr_schedule(hv.learning_rate_d, hv.lr_decay,
                     steps_per_epoch * hv.d_train_times),
        b1=hv.adam_b1, b2=hv.adam_b2, weight_decay=0.01))
    return g, d


def apply_generator(cfg: Config, params, batch: Dict[str, Any], rngs,
                    train: bool) -> jnp.ndarray:
    """Run the configured generator; returns f32 wav [B, S].

    Under ``compute_dtype='bfloat16'`` the conv stacks run in bf16 (ambient
    policy, ``models/precision.py``); the waveform is cast back to f32 here
    so every loss sees full precision.
    """
    gen = make_generator(cfg)
    with compute_dtype(cfg.vocoder.compute_dtype):
        if cfg.vocoder.split_cv:
            out = gen.apply({'params': params}, batch['mel_c'], batch['mel_v'],
                            batch['tmpl_c'][..., None], batch['tmpl_v'][..., None],
                            batch['uv'][..., None], train=train, rngs=rngs)
        else:
            out = gen.apply({'params': params}, batch['mel'],
                            batch['tmpl'][..., None], train=train, rngs=rngs)
    return out[..., 0].astype(jnp.float32)


def _disc_forward(cfg: Config, dparams, y, y_hat, specs_r, specs_g):
    """y_hat/specs_g may be None: real branch only (R1 penalty path)."""
    msd = MultiScaleDiscriminator(cfg)
    mpd = MultiPeriodDiscriminator(cfg)
    mtd = MultiStftDiscriminator(cfg)
    yh = None if y_hat is None else y_hat[..., None]
    with compute_dtype(cfg.vocoder.compute_dtype):
        s = msd.apply({'params': dparams['msd']}, y[..., None], yh)
        p = mpd.apply({'params': dparams['mpd']}, y[..., None], yh)
        t = mtd.apply({'params': dparams['mtd']}, specs_r, specs_g)
    # scores and feature maps feed f32 LSGAN/FM losses; XLA fuses the
    # upcasts into the consuming reductions
    f32 = functools.partial(jax.tree.map, lambda a: a.astype(jnp.float32))
    return f32(s), f32(p), f32(t)


def init_gan_state(cfg: Config, rng: jax.Array, batch: Dict[str, Any],
                   steps_per_epoch: int = 568) -> GANState:
    gen = make_generator(cfg)
    gopt, dopt = make_optimizers(cfg, steps_per_epoch)

    # jitted init: eager init is pathological over a remote-dispatch tunnel
    @jax.jit
    def _init(rng, batch):
        rngs = {'params': rng, 'noise': jax.random.fold_in(rng, 7)}
        if cfg.vocoder.split_cv:
            gvars = gen.init(rngs, batch['mel_c'], batch['mel_v'],
                             batch['tmpl_c'][..., None],
                             batch['tmpl_v'][..., None],
                             batch['uv'][..., None], train=True)
        else:
            gvars = gen.init(rngs, batch['mel'], batch['tmpl'][..., None],
                             train=True)
        gen_params = gvars['params']
        y = batch['wav']
        _, specs_r, specs_g = L.multi_stft_specs_and_loss(y, y, cfg)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 11), 3)
        disc_params = {
            'msd': MultiScaleDiscriminator(cfg).init(
                k1, y[..., None], y[..., None])['params'],
            'mpd': MultiPeriodDiscriminator(cfg).init(
                k2, y[..., None], y[..., None])['params'],
            'mtd': MultiStftDiscriminator(cfg).init(k3, specs_r, specs_g)['params'],
        }
        return gen_params, gopt.init(gen_params), disc_params, dopt.init(disc_params)

    gen_params, gen_opt, disc_params, disc_opt = _init(rng, batch)
    return GANState(jnp.asarray(0, jnp.int32), gen_params, gen_opt,
                    disc_params, disc_opt)


@functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=(1,))
def gan_train_step(cfg: Config, state: GANState, batch: Dict[str, Any],
                   rng: jax.Array, steps_per_epoch: int = 568
                   ) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
    hv = cfg.vocoder
    gopt, dopt = make_optimizers(cfg, steps_per_epoch)
    grng = {'noise': jax.random.fold_in(rng, 7)}
    y = batch['wav']                                        # [B, S]

    # one generator forward; D trains on the detached fake
    y_g = apply_generator(cfg, state.gen_params, batch, grng, train=True)
    y_g_det = jax.lax.stop_gradient(y_g)
    _, specs_r, specs_g_det = L.multi_stft_specs_and_loss(y, y_g_det, cfg)

    # ---- discriminator phase (d_train_times optimizer steps) -------------
    def d_loss_fn(dparams):
        (sr, sg, _, _), (pr, pg, _, _), (tr, tg, _, _) = _disc_forward(
            cfg, dparams, y, y_g_det, specs_r, specs_g_det)
        ls = L.discriminator_loss(sr, sg, cfg)
        lp = L.discriminator_loss(pr, pg, cfg)
        lt = L.discriminator_loss(tr, tg, cfg)
        total = ls + lp + lt
        # optional R1 gradient penalty on real data (off by default =
        # reference semantics).  The principled regularizer for corpora
        # where the Ds separate real/fake early and derail the generator:
        # gamma/2 * E_x ||grad_x sum(D(x))||^2, double-backward through the
        # conv stacks.  Mescheder et al. 2018, "Which GAN training methods
        # actually converge?".
        r1 = jnp.asarray(0.0)
        if hv.r1_gamma > 0.0:
            def real_score(yy):
                # real branch only: one STFT per resolution, one pass per
                # tower (the fake branch would be dead weight inside this
                # double-backward, executed d_train_times per step)
                sp = L.multi_stft_specs(yy, cfg)
                (rs, _, _, _), (rp, _, _, _), (rt, _, _, _) = _disc_forward(
                    cfg, dparams, yy, None, sp, None)
                return sum(jnp.sum(x) for x in rs + rp + rt)
            gy = jax.grad(real_score)(y)
            r1 = jnp.sum(jnp.square(gy)) / y.shape[0]
            total = total + 0.5 * hv.r1_gamma * r1
        aux = {
            'loss_disc_s': ls, 'loss_disc_p': lp, 'loss_disc_t': lt,
            'loss_r1': r1,
            'sc_s_r': sum(jnp.mean(d) for d in sr) / len(sr),
            'sc_s_g': sum(jnp.mean(d) for d in sg) / len(sg),
            'sc_p_r': sum(jnp.mean(d) for d in pr) / len(pr),
            'sc_p_g': sum(jnp.mean(d) for d in pg) / len(pg),
            'sc_t_r': sum(jnp.mean(d) for d in tr) / len(tr),
            'sc_t_g': sum(jnp.mean(d) for d in tg) / len(tg),
        }
        return total, aux

    disc_params, disc_opt = state.disc_params, state.disc_opt
    d_aux = None
    for _ in range(hv.d_train_times):
        (d_total, d_aux), dgrads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            disc_params)
        # NaN guard (reference ``train.py:158``): skip the update when the
        # loss OR any gradient is non-finite -- a finite loss with NaN/inf
        # grads (e.g. through saturated-D backward paths) would otherwise
        # poison the params in one step
        ok = jnp.isfinite(d_total) & jnp.isfinite(optax.global_norm(dgrads))
        dgrads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), dgrads)
        updates, disc_opt = dopt.update(dgrads, disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, updates)

    # ---- generator phase --------------------------------------------------
    def g_loss_fn(gparams):
        y_hat = apply_generator(cfg, gparams, batch, grng, train=True)
        loss_mstft, sp_r, sp_g = L.multi_stft_specs_and_loss(y, y_hat, cfg)
        loss_env = L.envelope_loss(y, y_hat, cfg) if hv.envelope_loss else 0.0
        loss_dyn = L.dynamic_loss(y, y_hat, cfg) if hv.dynamic_loss else 0.0
        loss_sm = L.strip_mirror_loss(y_hat) if hv.strip_mirror_loss else 0.0

        (sr, sg, fsr, fsg), (pr, pg, fpr, fpg), (tr, tg, ftr, ftg) = \
            _disc_forward(cfg, disc_params, y, y_hat, sp_r, sp_g)
        loss_fm_s = L.feature_loss(fsr, fsg)
        loss_fm_p = L.feature_loss(fpr, fpg)
        loss_fm_t = L.feature_loss(ftr, ftg)
        loss_gen_s = L.generator_loss(sg, sr, cfg)
        loss_gen_p = L.generator_loss(pg, pr, cfg)
        loss_gen_t = L.generator_loss(tg, tr, cfg)

        total = (loss_gen_s + loss_gen_p + loss_gen_t
                 + (loss_fm_s + loss_fm_p + loss_fm_t) * hv.w_loss_fm
                 + loss_mstft * hv.w_loss_mstft
                 + loss_env * hv.w_loss_env
                 + loss_dyn * hv.w_loss_dyn
                 + loss_sm * hv.w_loss_sm)
        aux = {'loss_gen_all': total, 'loss_gen_s': loss_gen_s,
               'loss_gen_p': loss_gen_p, 'loss_gen_t': loss_gen_t,
               'loss_fm_s': loss_fm_s, 'loss_fm_p': loss_fm_p,
               'loss_fm_t': loss_fm_t, 'loss_mstft': loss_mstft,
               'loss_env': loss_env, 'loss_dyn': loss_dyn, 'loss_sm': loss_sm}
        return total, aux

    (g_total, g_aux), ggrads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.gen_params)
    ok = jnp.isfinite(g_total) & jnp.isfinite(optax.global_norm(ggrads))
    ggrads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), ggrads)
    gupd, gen_opt = gopt.update(ggrads, state.gen_opt, state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, gupd)

    metrics = dict(d_aux, **g_aux,
                   loss_disc_all=d_aux['loss_disc_s'] + d_aux['loss_disc_p']
                   + d_aux['loss_disc_t'])
    return GANState(state.step + 1, gen_params, gen_opt, disc_params, disc_opt), metrics


@functools.partial(jax.jit, static_argnums=(0,))
def gan_eval_step(cfg: Config, gen_params, batch: Dict[str, Any]
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Validation metrics on held-out data (reference ``train.py:275-322``)."""
    hv = cfg.vocoder
    y = batch['wav']
    y_g = apply_generator(cfg, gen_params, batch, {}, train=False)
    loss_mstft, _, _ = L.multi_stft_specs_and_loss(y, y_g, cfg)
    return y_g, {
        'loss_mstft': loss_mstft,
        'loss_env': L.envelope_loss(y, y_g, cfg),
        'loss_dyn': L.dynamic_loss(y, y_g, cfg),
        'loss_sm': L.strip_mirror_loss(y_g),
    }
