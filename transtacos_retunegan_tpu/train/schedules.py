"""LR and teacher-forcing schedules.

* Noam decay with 4k warmup (reference ``tacotron.py:320-324``).
* Narrow cosine teacher-forcing decay: hold 1.0 until ``tf_start_decay``,
  cosine to 0 over ``tf_decay`` steps (reference ``custom_decoder.py:124-151``).
* Per-epoch exponential LR decay for the GAN (reference ``retunegan/train.py:87-88``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AcousticConfig, VocoderConfig


def noam_lr(step: jnp.ndarray, cfg: AcousticConfig) -> jnp.ndarray:
    if not cfg.decay_learning_rate:
        return jnp.asarray(cfg.initial_learning_rate)
    w = float(cfg.warmup_steps)
    s = (step + 1).astype(jnp.float32)
    return cfg.initial_learning_rate * w ** 0.5 * jnp.minimum(s * w ** -1.5, s ** -0.5)


def teacher_forcing_ratio(step: jnp.ndarray, cfg: AcousticConfig) -> jnp.ndarray:
    t = jnp.clip((step - cfg.tf_start_decay).astype(jnp.float32), 0.0,
                 float(cfg.tf_decay))
    cos = cfg.tf_init * 0.5 * (1.0 + jnp.cos(jnp.pi * t / float(cfg.tf_decay)))
    return jnp.where(step < cfg.tf_start_decay, jnp.asarray(cfg.tf_init), cos)


def gan_lr(base_lr: float, epoch: jnp.ndarray, cfg: VocoderConfig) -> jnp.ndarray:
    return base_lr * cfg.lr_decay ** epoch.astype(jnp.float32)
