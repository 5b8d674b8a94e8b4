"""RetuneGAN generator family: 9 variants, registry-selected by name.

TPU-native rebuild of ``retunegan/models/generator.py:190-942``.  All
generators take ``(mel [B, T, n_mel], tmpl [B, S, 1])`` in activations-last
layout (S = T * hop) and return a waveform ``[B, S, 1]`` in (-1, 1).  The
reference's channel counts, kernel geometry and fusion topology are kept;
torch-specific mechanics (weight norm, ConvTranspose padding) live in
``vocoder_layers``.

Split variants additionally take ``(mel_c, mel_v, tmpl_c, tmpl_v, uv [B,S,1])``.
"""

from __future__ import annotations

from typing import Dict, Type

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from .vocoder_layers import (LearnedGaussianNoise, ResBlock2, ResBlock3,
                             ResBlockFull, ResidualBlock, ResidualStack,
                             WNConv, WNConvTranspose, lrelu)


class GeneratorRetuneCNN(nn.Module):
    """Pure wave-to-wave CNN on the Griffin-Lim template; ignores mel
    (reference ``generator.py:193-229``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl, train: bool = True):
        y = WNConv(32, 15)(tmpl)
        for ch in (128, 128, 128, 128, 128, 32):
            y = jnp.tanh(y)
            y = WNConv(ch, 41)(y)
        y = jnp.tanh(y)
        y = WNConv(1, 7)(y)
        return jnp.tanh(y)


class GeneratorMelGAN(nn.Module):
    """Classic MelGAN 512->...->1 transposed-conv stack
    (reference ``generator.py:232-259``)."""
    cfg: Config
    use_post: bool = True

    @nn.compact
    def __call__(self, mel, tmpl=None, train: bool = True):
        x = WNConv(512, 7)(mel)
        for out_ch, k, s in ((256, 16, 8), (128, 16, 8), (64, 4, 2), (32, 4, 2)):
            x = ResidualBlock(out_ch, k, s)(x)
        if self.use_post:
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = WNConv(1, 7)(x)
            x = jnp.tanh(x)
        return x


class GeneratorMelGANRetune(nn.Module):
    """Dual branch: mel upsampled 2x stages, template downsampled 2x stages,
    concat with learnable scale alpha=4, joint decode
    (reference ``generator.py:262-340``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl, train: bool = True):
        x = WNConv(256, 7)(mel)
        x = ResidualBlock(128, 16, 8)(x)
        x = ResidualBlock(64, 16, 8)(x)

        y = WNConv(16, 7)(tmpl)
        y = ResidualBlock(32, 4, 2, resize='d')(y)
        y = ResidualBlock(64, 4, 2, resize='d')(y)

        alpha = self.param('alpha', nn.initializers.constant(4.0), (1,))
        z = jnp.concatenate([x, y * alpha], axis=-1)

        z = ResidualBlock(64, 4, 2)(z)
        z = ResidualBlock(32, 4, 2)(z)
        z = lrelu(z)
        z = WNConv(1, 7)(z)
        return jnp.tanh(z)


class GeneratorMelGANSplit(nn.Module):
    """Two MelGANs for consonant/vowel bands, masked-summed by the u/v mask,
    conjunction refine stack (reference ``generator.py:343-386``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel_c, mel_v, tmpl_c, tmpl_v, uv, train: bool = True):
        e_c = GeneratorMelGAN(self.cfg, use_post=False, name='g_c')(mel_c, None, train)
        e_v = GeneratorMelGAN(self.cfg, use_post=False, name='g_v')(mel_v, None, train)
        z = e_c * uv + e_v * (1.0 - uv)
        z = WNConv(32, 7)(z)
        z = ResidualStack(32)(z)
        z = lrelu(z)
        z = WNConv(1, 7)(z)
        return jnp.tanh(z)


class GeneratorHiFiGAN(nn.Module):
    """Standard HiFiGAN MRF generator (reference ``generator.py:389-434``)."""
    cfg: Config
    use_post: bool = True

    @nn.compact
    def __call__(self, mel, tmpl=None, train: bool = True):
        hv = self.cfg.vocoder
        n_k = len(hv.resblock_kernel_sizes)
        x = WNConv(hv.upsample_initial_channel, 7)(mel)
        for i, (u, k) in enumerate(zip(hv.upsample_rates, hv.upsample_kernel_sizes)):
            x = lrelu(x)
            ch = hv.upsample_initial_channel // (2 ** (i + 1))
            x = WNConvTranspose(ch, k, u)(x)
            xs = 0
            for j, (rk, rd) in enumerate(zip(hv.resblock_kernel_sizes,
                                             hv.resblock_dilation_sizes)):
                xs = xs + ResBlock2(ch, rk, rd, name=f'resblock_{i}_{j}')(x)
            x = xs / n_k
        if self.use_post:
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = WNConv(1, 7)(x)
            x = jnp.tanh(x)
        return x


class GeneratorHiFiGANMini(nn.Module):
    """HiFiGAN with a single ResBlockFull per stage
    (reference ``generator.py:437-477``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl=None, train: bool = True):
        hv = self.cfg.vocoder
        x = WNConv(hv.upsample_initial_channel, 7)(mel)
        for i, (u, k) in enumerate(zip(hv.upsample_rates, hv.upsample_kernel_sizes)):
            x = lrelu(x)
            ch = hv.upsample_initial_channel // (2 ** (i + 1))
            x = WNConvTranspose(ch, k, u)(x)
            x = ResBlockFull(ch, 3, (1, 3, 9))(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = WNConv(1, 7)(x)
        return jnp.tanh(x)


class GeneratorHiFiGANMicro(nn.Module):
    """HiFiGAN with one plain conv per stage (reference ``generator.py:480-520``).
    NOTE the reference leaves this conv un-weight-normed; we weight-norm it
    uniformly (capability-identical, simpler layer set)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl=None, train: bool = True):
        hv = self.cfg.vocoder
        x = WNConv(hv.upsample_initial_channel, 7)(mel)
        for i, (u, k) in enumerate(zip(hv.upsample_rates, hv.upsample_kernel_sizes)):
            x = lrelu(x)
            ch = hv.upsample_initial_channel // (2 ** (i + 1))
            x = WNConvTranspose(ch, k, u)(x)
            x = WNConv(ch, 41)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = WNConv(1, 7)(x)
        return jnp.tanh(x)


class GeneratorHiFiGANMu(nn.Module):
    """Upsample-only ablation, no resblocks (reference ``generator.py:523-557``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl=None, train: bool = True):
        hv = self.cfg.vocoder
        x = WNConv(hv.upsample_initial_channel, 7)(mel)
        for i, (u, k) in enumerate(zip(hv.upsample_rates, hv.upsample_kernel_sizes)):
            x = lrelu(x)
            ch = hv.upsample_initial_channel // (2 ** (i + 1))
            x = WNConvTranspose(ch, k, u)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = WNConv(1, 7)(x)
        return jnp.tanh(x)


class GeneratorRefineGAN(nn.Module):
    """RefineGAN UNet as in the paper (~7M params; reference
    ``generator.py:560-667``): template encoder ch 32->256 with ResBlock2,
    mel branch concat at the bottleneck, transposed-conv decoder with
    skip-concat merges and 3-kernel MRF + learnable-noise injections."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl, train: bool = True):
        hv = self.cfg.vocoder
        n_k = len(hv.resblock_kernel_sizes)
        ch = 32
        noise = LearnedGaussianNoise(name='noise')

        # template encoder (downsample by the reversed upsample rates)
        y = WNConv(ch, 7)(tmpl)
        skips = []
        down_specs = list(zip(hv.upsample_rates[::-1], hv.upsample_kernel_sizes[::-1]))
        for i, (u, k) in enumerate(down_specs):
            y = lrelu(y)
            skips.append(y)
            y = WNConv(ch * 2 ** (i + 1), k, stride=u, padding=k // 2)(y)
            y = ResBlock2(ch * 2 ** (i + 1), 5, (1, 3), name=f'enc_rb_{i}')(y)

        # bottleneck fuse: mel prenet runs at frame rate
        x = WNConv(hv.upsample_initial_channel, 7)(mel)
        z = jnp.concatenate([x, y], axis=-1)

        # decoder with skip merges
        n_layer = len(hv.upsample_rates)
        for i, (u, k) in enumerate(zip(hv.upsample_rates, hv.upsample_kernel_sizes)):
            z = lrelu(z)
            cout = hv.upsample_initial_channel // (2 ** (i + 1)) * 2
            z = WNConvTranspose(cout, k, u)(z)
            fm = skips[n_layer - i - 1]
            z = jnp.concatenate([z, fm], axis=-1)
            z = WNConv((256, 128, 64)[i], 7, name=f'merge_{i}')(z)
            zs = 0
            z = noise(z, train)
            for j, (rk, rd) in enumerate(zip(hv.resblock_kernel_sizes,
                                             hv.resblock_dilation_sizes)):
                zs = zs + ResBlock2(z.shape[-1], rk, rd, name=f'dec_rb_{i}_{j}')(z)
            z = zs / n_k
            z = noise(z, train)

        z = lrelu(z)
        z = WNConv(1, 7)(z)
        return jnp.tanh(z)


class GeneratorRefineGANSmall(nn.Module):
    """Default generator (~2.7M params; reference ``generator.py:670-796``):
    half-width template encoder with MelGAN ResidualStacks, conv_fuse
    bottleneck [n_mel + 128 -> 256], ResBlock3 MRF with dilations 9-3-1
    (noted faster-converging than 1-3-9 at ``generator.py:707``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl, train: bool = True):
        hv = self.cfg.vocoder
        n_k = len(hv.resblock_kernel_sizes)
        ch = 32
        noise = LearnedGaussianNoise(name='noise')

        # template encoder: D = 16 -> 32 -> 64 -> 128
        y = WNConv(ch // 2, 7)(tmpl)
        skips = []
        down_specs = list(zip(hv.upsample_rates[::-1], hv.upsample_kernel_sizes[::-1]))
        for i, (u, k) in enumerate(down_specs):
            y = lrelu(y)
            skips.append(y)
            y = WNConv(ch * 2 ** (i + 1) // 2, k, stride=u, padding=k // 2)(y)
            y = ResidualStack(ch * 2 ** (i + 1) // 2, name=f'enc_rs_{i}')(y)

        # fuse: [mel(80) | y(128)] -> 256
        y = lrelu(y)
        z = jnp.concatenate([mel, y], axis=-1)
        z = WNConv(hv.upsample_initial_channel, 7, name='conv_fuse')(z)

        # decoder: 256 -> 128 -> 64 -> 32 with skip merges + 9-3-1 MRF
        n_layer = len(hv.upsample_rates)
        merge_ch = (128, 64, 32)
        for i, (u, k) in enumerate(zip(hv.upsample_rates, hv.upsample_kernel_sizes)):
            z = lrelu(z)
            cout = hv.upsample_initial_channel // (2 ** (i + 1))
            z = WNConvTranspose(cout, k, u)(z)
            fm = skips[n_layer - i - 1]
            z = jnp.concatenate([z, fm], axis=-1)
            z = WNConv(merge_ch[i], 7, name=f'merge_{i}')(z)
            zs = 0
            z = noise(z, train)
            for j, rk in enumerate(hv.resblock_kernel_sizes):
                zs = zs + ResBlock3(merge_ch[i], rk, (9, 3, 1),
                                    name=f'dec_rb_{i}_{j}')(z)
            z = zs / n_k
            z = noise(z, train)

        z = lrelu(z)
        z = WNConv(1, 7)(z)
        return jnp.tanh(z)


class GeneratorHiFiGANRetune(nn.Module):
    """HiFiGAN fusing the template halfway (reference ``generator.py:799-898``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel, tmpl, train: bool = True):
        hv = self.cfg.vocoder
        rks = hv.resblock_kernel_sizes
        rds = hv.resblock_dilation_sizes
        n_k = len(rks)

        x = WNConv(256, 7)(mel)
        for i, ch in enumerate((128, 64)):
            x = lrelu(x)
            x = WNConvTranspose(ch, 16, 8, padding=4, output_padding=0)(x)
            xs = 0
            for j, (rk, rd) in enumerate(zip(rks, rds)):
                xs = xs + ResBlock2(ch, rk, rd, name=f'x_rb_{i}_{j}')(x)
            x = xs / n_k

        y = WNConv(16, 7)(tmpl)
        for i, ch in enumerate((32, 64)):
            y = lrelu(y)
            y = WNConv(ch, 4, stride=2, padding=1)(y)
            y = ResBlockFull(ch, 3, (1, 3, 9), name=f'y_rb_{i}')(y)

        alpha = self.param('alpha', nn.initializers.constant(4.0), (1,))
        z = jnp.concatenate([x, y * alpha], axis=-1)

        for i, ch in enumerate((64, 32)):
            z = lrelu(z)
            z = WNConvTranspose(ch, 4, 2, padding=1, output_padding=0)(z)
            zs = 0
            for j, (rk, rd) in enumerate(zip(rks, rds)):
                zs = zs + ResBlock2(ch, rk, rd, name=f'z_rb_{i}_{j}')(z)
            z = zs / n_k

        z = nn.leaky_relu(z, negative_slope=0.01)
        z = WNConv(1, 7)(z)
        return jnp.tanh(z)


class GeneratorHiFiGANSplit(nn.Module):
    """Two post-less HiFiGANs masked-summed by u/v + refine conv
    (reference ``generator.py:901-942``)."""
    cfg: Config

    @nn.compact
    def __call__(self, mel_c, mel_v, tmpl_c, tmpl_v, uv, train: bool = True):
        e_c = GeneratorHiFiGAN(self.cfg, use_post=False, name='g_c')(mel_c, None, train)
        e_v = GeneratorHiFiGAN(self.cfg, use_post=False, name='g_v')(mel_v, None, train)
        z = e_c * uv + e_v * (1.0 - uv)
        z = WNConv(32, 7)(z)
        z = lrelu(z)
        z = WNConv(1, 15)(z)
        return jnp.tanh(z)


GENERATORS: Dict[str, Type[nn.Module]] = {
    'RetuneCNN': GeneratorRetuneCNN,
    'MelGAN': GeneratorMelGAN,
    'MelGANRetune': GeneratorMelGANRetune,
    'MelGANSplit': GeneratorMelGANSplit,
    'HiFiGAN': GeneratorHiFiGAN,
    'HiFiGAN_mini': GeneratorHiFiGANMini,
    'HiFiGAN_micro': GeneratorHiFiGANMicro,
    'HiFiGAN_mu': GeneratorHiFiGANMu,
    'RefineGAN': GeneratorRefineGAN,
    'RefineGAN_small': GeneratorRefineGANSmall,
    'HiFiGANRetune': GeneratorHiFiGANRetune,
    'HiFiGANSplit': GeneratorHiFiGANSplit,
}


def make_generator(cfg: Config) -> nn.Module:
    """Registry lookup (reference ``retunegan/train.py:48``:
    ``globals().get(f'Generator_{ver}')``)."""
    return GENERATORS[cfg.vocoder.generator_ver](cfg)
