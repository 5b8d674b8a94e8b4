"""RetuneGAN discriminators: multi-scale (MSD), multi-period (MPD),
multi-STFT (MTD/PHD).

TPU-native rebuild of ``retunegan/models/discrminator.py``.  Layout is
activations-last; waveforms enter as ``[B, S, 1]``, STFT images as
``[B, F, T, 2]`` (log-magnitude, phase/pi channels).
Each discriminator returns (score [B, K], feature maps list).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from .vocoder_layers import WNConv, WNConv2d, lrelu


def _scale_ch(ch: int, mult: float, groups: int = 1) -> Tuple[int, int]:
    """Scale (features, groups) by a width multiplier, keeping features a
    multiple of groups.  mult=1.0 is the identity (reference widths); small
    power-of-two fractions are the intended dry-run/CI values.  Widening
    (mult > 1.0) scales features only -- more groups would change the
    reference's grouped-conv topology, not just its width."""
    if mult == 1.0:
        return ch, groups
    if mult > 1.0:
        f = int(round(ch * mult))
        return -(-f // max(groups, 1)) * max(groups, 1), groups
    g = max(1, int(round(groups * mult)))
    f = max(g, int(round(ch * mult)))
    f = -(-f // g) * g
    return f, g


class DiscriminatorS(nn.Module):
    """MelGAN_small-flavor grouped-conv scale discriminator
    (reference ``discrminator.py:17-101``)."""
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        specs = [
            dict(features=32, kernel=15, stride=1, padding=7, groups=1),
            dict(features=64, kernel=41, stride=2, padding=20, groups=4),
            dict(features=128, kernel=41, stride=2, padding=20, groups=8),
            dict(features=512, kernel=41, stride=4, padding=20, groups=32),
            dict(features=512, kernel=41, stride=4, padding=20, groups=64),
            dict(features=512, kernel=5, stride=1, padding=2, groups=1),
        ]
        for i, sp in enumerate(specs):
            sp['features'], sp['groups'] = _scale_ch(
                sp['features'], self.width_mult, sp['groups'])
            x = WNConv(**sp, name=f'conv_{i}')(x)
            fmap.append(x)
            x = lrelu(x)
        x = WNConv(1, 3, padding=1, name='conv_post')(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scales with AvgPool1d(k=4, s=2, pad=1) between (deliberately average
    pooling, not resampling -- reference ``discrminator.py:104-129``)."""
    cfg: Config

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray = None):
        """y_hat=None runs the real branch only (R1 penalty path)."""
        hv = self.cfg.vocoder
        rs, gs, fr, fg = [], [], [], []
        for i in range(hv.msd_layers):
            d = DiscriminatorS(hv.disc_width_mult, name=f'disc_{i}')
            sr, fmr = d(y)
            rs.append(sr); fr.append(fmr)
            if y_hat is not None:
                sg, fmg = d(y_hat)
                gs.append(sg); fg.append(fmg)
            if i != hv.msd_layers - 1:
                y = _avg_pool1d(y, hv.downsample_pool_k, 2, 1)
                if y_hat is not None:
                    y_hat = _avg_pool1d(y_hat, hv.downsample_pool_k, 2, 1)
        return rs, gs, fr, fg


def _avg_pool1d(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """torch AvgPool1d semantics (count includes zero padding): [B, T, C]."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, 1), (1, stride, 1),
                              ((0, 0), (pad, pad), (0, 0)))
    return s / k


def _max_pool1d(x: jnp.ndarray, k: int, stride: int) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, 1),
                                 (1, stride, 1), 'VALID')


class DiscriminatorP(nn.Module):
    """Period-folded 2D discriminator, HiFiGAN_small widths
    (reference ``discrminator.py:132-222``)."""
    period: int
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        b, t, c = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode='reflect')
            t = t + n_pad
        x = x.reshape(b, t // p, p, c)          # [B, T', P, C]

        fmap = []
        for i, ch in enumerate((32, 128, 256, 512)):
            ch, _ = _scale_ch(ch, self.width_mult)
            x = WNConv2d(ch, (5, 1), (3, 1), (2, 0), name=f'conv_{i}')(x)
            fmap.append(x)
            x = lrelu(x)
        x = WNConv2d(_scale_ch(512, self.width_mult)[0], (5, 1), (1, 1), (2, 0),
                     name='conv_4')(x)
        fmap.append(x)
        x = lrelu(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), name='conv_post')(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods 3/5/7/11 (reference ``discrminator.py:225-244``)."""
    cfg: Config

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray = None):
        """y_hat=None runs the real branch only (R1 penalty path)."""
        rs, gs, fr, fg = [], [], [], []
        for p in self.cfg.vocoder.mpd_periods:
            d = DiscriminatorP(p, self.cfg.vocoder.disc_width_mult,
                               name=f'disc_p{p}')
            sr, fmr = d(y)
            rs.append(sr); fr.append(fmr)
            if y_hat is not None:
                sg, fmg = d(y_hat)
                gs.append(sg); fg.append(fmg)
        return rs, gs, fr, fg


class StftDiscriminator(nn.Module):
    """2-channel (log-mag, phase/pi) spectrogram discriminator
    (reference ``discrminator.py:247-308``)."""
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: [B, F, T, 2]
        fmap = []
        specs = [
            dict(features=32, kernel=(3, 3), stride=(2, 1), padding=(1, 1)),
            dict(features=64, kernel=(3, 3), stride=(2, 2), padding=(1, 1)),
            dict(features=256, kernel=(5, 3), stride=(3, 2), padding=(2, 1)),
            dict(features=512, kernel=(5, 3), stride=(3, 2), padding=(2, 1)),
            dict(features=512, kernel=(3, 3), stride=(1, 1), padding=(1, 1)),
        ]
        for i, sp in enumerate(specs):
            sp['features'], _ = _scale_ch(sp['features'], self.width_mult)
            x = WNConv2d(**sp, name=f'conv_{i}')(x)
            fmap.append(x)
            x = lrelu(x)
        x = WNConv2d(1, (3, 3), (1, 1), (1, 1), name='conv_post')(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiStftDiscriminator(nn.Module):
    """One StftDiscriminator per STFT resolution (UnivNet-style MTD;
    reference ``discrminator.py:311-330``)."""
    cfg: Config

    @nn.compact
    def __call__(self, specs_r: Sequence[jnp.ndarray],
                 specs_g: Sequence[jnp.ndarray] = None):
        """specs_g=None runs the real branch only (R1 penalty path)."""
        rs, gs, fr, fg = [], [], [], []
        for i, sr_in in enumerate(specs_r):
            d = StftDiscriminator(self.cfg.vocoder.disc_width_mult,
                                  name=f'disc_{i}')
            sr, fmr = d(sr_in)
            rs.append(sr); fr.append(fmr)
            if specs_g is not None:
                sg, fmg = d(specs_g[i])
                gs.append(sg); fg.append(fmg)
        return rs, gs, fr, fg
