"""Acoustic-model encoders: self-attention ('sa') and CBHG ('cb').

Reference: ``transtacos/models/modules.py:182-240`` (encoder_sa with fusenet)
and ``modules.py:52-90`` (cbhg).  The 'sa' encoder is the default: 2 layers x
2 heads of masked dot attention with GFFW residuals, plus a *fusenet* that
cross-attends text against quantized f0/c0 embeddings at train time and
substitutes conv prednet outputs at inference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import AcousticConfig
from .layers import (GFFW, ConvBN, ConvStack, DotAttn, Highway, attn_mask,
                     sequence_mask)


class EncoderSA(nn.Module):
    """Self-attention encoder + f0/c0 fusenet (reference ``modules.py:182-240``)."""
    cfg: AcousticConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_len: jnp.ndarray,
                 f0: Optional[jnp.ndarray], c0: Optional[jnp.ndarray],
                 y_len: Optional[jnp.ndarray], train: bool):
        hp = self.cfg
        depth = hp.encoder_depth

        if hp.txt_use_posenc:
            x = nn.Dense(depth, name='prenet')(x)
            if hp.encoder_dropout and train:
                x = nn.Dropout(0.2, deterministic=False)(x)

        # multi-head self-attention stack
        slf_attns = []
        max_xlen = x.shape[-2]
        slf_mask = attn_mask(x_len, max_xlen)
        for i in range(hp.encoder_attn_layers):
            rs, attns = [], []
            for h in range(hp.encoder_attn_nhead):
                r, sc = DotAttn(depth // hp.encoder_attn_nhead, depth,
                                name=f'sa_{i}_{h}')(x, x, slf_mask)
                rs.append(r)
                attns.append(sc)
            slf_attns.append(attns)
            sa = nn.Dense(depth, name=f'proj_sa_{i}')(jnp.concatenate(rs, -1))
            if hp.encoder_dropout and train:
                sa = nn.Dropout(0.2, deterministic=False)(sa)
            x = x + GFFW(depth, hp.gffw_conv_k, name=f'gffw_sa_{i}')(x + sa)

        # fusenet: inject prosodic f0/c0 information
        crx_attns = []
        f0_r = c0_r = f0_r_pred = c0_r_pred = jnp.zeros(())
        if hp.encoder_fusenet:
            f0_r_pred = ConvStack(2, hp.var_prednet_conv_k, hp.var_prednet_depth,
                                  hp.var_prednet_depth, activation=nn.leaky_relu,
                                  name='ca_f0_prednet')(x)
            c0_r_pred = ConvStack(2, hp.var_prednet_conv_k, hp.var_prednet_depth,
                                  hp.var_prednet_depth, activation=nn.leaky_relu,
                                  name='ca_c0_prednet')(x)
            if train:
                assert f0 is not None and c0 is not None and y_len is not None
                max_ylen = f0.shape[-2]
                crx_mask = attn_mask(x_len, max_xlen, y_len, max_ylen)
                f0_r, sc = DotAttn(hp.var_prednet_depth, depth,
                                   name='ca_f0')(x, f0, crx_mask)
                crx_attns.append(sc)
                c0_r, sc = DotAttn(hp.var_prednet_depth, depth,
                                   name='ca_c0')(x, c0, crx_mask)
                crx_attns.append(sc)
                f = nn.Dense(depth, name='proj_ca')(jnp.concatenate([f0_r, c0_r], -1))
            else:
                f = nn.Dense(depth, name='proj_ca')(
                    jnp.concatenate([f0_r_pred, c0_r_pred], -1))
            if hp.encoder_dropout and train:
                f = nn.Dropout(0.2, deterministic=False)(f)
            x = x + GFFW(depth, hp.gffw_conv_k, name='gffw_ca')(
                jnp.concatenate([x, f], -1))

        return x, (slf_attns, crx_attns), ((f0_r, f0_r_pred), (c0_r, c0_r_pred))


class CBHG(nn.Module):
    """Tacotron-1 CBHG encoder (reference ``modules.py:52-90``): conv bank
    K=16, maxpool, 2 projections, residual, highway x4, bi-GRU."""
    cfg: AcousticConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_len: jnp.ndarray, train: bool):
        hp = self.cfg
        depth = hp.encoder_depth
        proj_dims = (depth // 2, depth)
        K = hp.encoder_conv_K

        conv = jnp.concatenate(
            [ConvBN(depth // 2, k + 1, nn.relu, name=f'conv1d_{k + 1}')(x, train)
             for k in range(K)], axis=-1)
        # maxpool width 2, stride 1, same
        pooled = jax.lax.reduce_window(
            conv, -jnp.inf, jax.lax.max,
            (1, 2, 1), (1, 1, 1), ((0, 0), (0, 1), (0, 0)))
        proj = ConvBN(proj_dims[0], 3, nn.relu, name='proj_1')(pooled, train)
        proj = ConvBN(proj_dims[1], 3, lambda v: v, name='proj_2')(proj, train)

        highway = x + proj
        if highway.shape[-1] != depth:
            highway = nn.Dense(depth)(highway)
        for i in range(hp.highway_layers):
            highway = Highway(depth, name=f'highway_{i + 1}')(highway)

        # bidirectional GRU, masked beyond sequence length
        mask = sequence_mask(x_len, highway.shape[-2])[..., None]
        fwd = nn.RNN(nn.GRUCell(depth // 2), name='gru_fwd')(highway)
        bwd = nn.RNN(nn.GRUCell(depth // 2), name='gru_bwd', reverse=True,
                     keep_order=True)(highway)
        out = jnp.concatenate([fwd, bwd], axis=-1) * mask
        return out
