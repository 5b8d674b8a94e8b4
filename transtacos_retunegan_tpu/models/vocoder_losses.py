"""RetuneGAN losses: multi-resolution STFT, envelope/dynamic/strip-mirror,
LSGAN adversarial and feature-matching.

TPU-native rebuild of ``retunegan/models/loss.py``; the multi-STFT transform
runs through the DFT-matmul STFT in ``audio.dsp`` so it is differentiable and
fuses into the training step.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..audio import dsp
from ..config import Config

PI = 3.14159265358979


def multi_stft_specs_and_loss(y: jnp.ndarray, y_g: jnp.ndarray, cfg: Config
                              ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """For each STFT resolution: loss L1(mel) + L1(log mel); also build the
    MTD 2-channel inputs stack([log_mag, phase/pi]) (reference
    ``loss.py:22-62``).  ``phd_input='phase'`` pairs the real magnitude with
    the fake phase.  y, y_g: [B, S] waveforms.
    """
    hv = cfg.vocoder
    loss = 0.0
    specs_r, specs_g = [], []
    for n_fft, win_length, hop_length in hv.multi_stft_params:
        s_r, m_r, p_r = dsp.stft_mag_mel_phase(y, cfg.audio, n_fft, win_length,
                                               hop_length)
        s_g, m_g, p_g = dsp.stft_mag_mel_phase(y_g, cfg.audio, n_fft, win_length,
                                               hop_length)
        # the reference takes raw logs ("no floor", audio.py:151); the 1e-12
        # floor only guards against empty mel filters at tiny n_fft and is
        # inactive in the reference's resolution set
        log_m_r, log_m_g = jnp.log(jnp.maximum(m_r, 1e-12)), jnp.log(jnp.maximum(m_g, 1e-12))
        log_s_r, log_s_g = jnp.log(jnp.maximum(s_r, 1e-12)), jnp.log(jnp.maximum(s_g, 1e-12))
        if hv.phd_input == 'stft':
            specs_r.append(jnp.stack([log_s_r, p_r / PI], axis=-1))
            specs_g.append(jnp.stack([log_s_g, p_g / PI], axis=-1))
        elif hv.phd_input == 'phase':
            specs_r.append(jnp.stack([log_s_r, p_r / PI], axis=-1))
            specs_g.append(jnp.stack([log_s_r, p_g / PI], axis=-1))
        else:
            raise ValueError(hv.phd_input)
        loss = loss + jnp.mean(jnp.abs(m_r - m_g))
        loss = loss + jnp.mean(jnp.abs(log_m_r - log_m_g))
    return loss / len(hv.multi_stft_params), specs_r, specs_g


def multi_stft_specs(y: jnp.ndarray, cfg: Config) -> List[jnp.ndarray]:
    """MTD 2-channel inputs for a single waveform: one STFT per resolution
    (half the work of ``multi_stft_specs_and_loss(y, y, ...)`` and no
    discarded loss) -- the R1-penalty real-branch path."""
    specs = []
    for n_fft, win_length, hop_length in cfg.vocoder.multi_stft_params:
        s, _, p = dsp.stft_mag_mel_phase(y, cfg.audio, n_fft, win_length,
                                         hop_length)
        specs.append(jnp.stack([jnp.log(jnp.maximum(s, 1e-12)), p / PI],
                               axis=-1))
    return specs


def _max_pool(y: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch MaxPool1d(k) default stride=k, VALID; y: [B, S].

    Non-overlapping windows, so trim+reshape+max is exact -- and unlike
    reduce_window-max its gradient lowers on TPU (select-and-scatter over the
    minor-most dim is unimplemented there).
    """
    n = y.shape[-1] // k
    return jnp.max(y[..., :n * k].reshape(y.shape[:-1] + (n, k)), axis=-1)


def envelope_loss(y: jnp.ndarray, y_g: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Absolute dynamic-envelope L1 (reference ``loss.py:66-72``)."""
    k = cfg.vocoder.envelope_pool_k
    return (jnp.mean(jnp.abs(_max_pool(y, k) - _max_pool(y_g, k)))
            + jnp.mean(jnp.abs(_max_pool(-y, k) - _max_pool(-y_g, k))))


def dynamic_loss(y: jnp.ndarray, y_g: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Relative dynamic-width L1 (reference ``loss.py:76-82``)."""
    k = cfg.vocoder.envelope_pool_k
    dyn_r = jnp.abs(_max_pool(y, k) + _max_pool(-y, k))
    dyn_g = jnp.abs(_max_pool(y_g, k) + _max_pool(-y_g, k))
    return jnp.mean(jnp.abs(dyn_r - dyn_g))


def strip_mirror_loss(y: jnp.ndarray) -> jnp.ndarray:
    """Maximize de-meaned even/odd stripe difference (reference
    ``loss.py:86-98``)."""
    if y.shape[-1] % 2 != 0:
        y = y[..., :-1]
    even, odd = y[..., ::2], y[..., 1::2]
    even = even - even.mean()
    odd = odd - odd.mean()
    return jnp.mean(-jnp.log(jnp.clip(jnp.abs(even - odd) + 1e-9, max=1.0)))


def discriminator_loss(disc_r: Sequence[jnp.ndarray], disc_g: Sequence[jnp.ndarray],
                       cfg: Config) -> jnp.ndarray:
    """LSGAN (or relativistic) D loss summed over sub-discriminators
    (reference ``loss.py:102-125``).  ``disc_g`` must already be detached
    (computed from a stop-gradiented fake)."""
    loss = 0.0
    for dr, dg in zip(disc_r, disc_g):
        if cfg.vocoder.relative_gan_loss:
            r_loss = jnp.mean(jnp.mean((1.0 - (dr - jax.lax.stop_gradient(dg))) ** 2,
                                       axis=-1))
            g_loss = jnp.mean(jnp.mean((0.0 - dg) ** 2, axis=-1))
        else:
            r_loss = jnp.mean(jnp.mean((1.0 - dr) ** 2, axis=-1))
            g_loss = jnp.mean(jnp.mean((0.0 - dg) ** 2, axis=-1))
        loss = loss + r_loss + g_loss
    return loss


def generator_loss(disc_g: Sequence[jnp.ndarray], disc_r: Sequence[jnp.ndarray],
                   cfg: Config) -> jnp.ndarray:
    """LSGAN (or relativistic) G adversarial loss (reference ``loss.py:129-145``)."""
    loss = 0.0
    for dg, dr in zip(disc_g, disc_r):
        if cfg.vocoder.relative_gan_loss:
            g = jnp.mean(jnp.mean((dg - jax.lax.stop_gradient(dr)) ** 2, axis=-1))
        else:
            g = jnp.mean(jnp.mean((1.0 - dg) ** 2, axis=-1))
        loss = loss + g
    return loss


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """L1 over all feature-map pairs (reference ``loss.py:149-156``)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for r, g in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(r - g))
    return loss
