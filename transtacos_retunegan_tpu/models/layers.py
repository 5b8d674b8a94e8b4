"""Shared flax building blocks for the acoustic model.

Rebuilt TPU-first from the reference's TF1 modules
(``transtacos/models/modules.py``): same math, expressed as flax linen
modules with static shapes so the whole model jits once per shape bucket.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoidal position-encoding table ``[n_position, d_hid]``
    (reference ``modules.py:154-171``)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def sequence_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """``[B] -> [B, maxlen]`` float 0/1 mask."""
    return (jnp.arange(maxlen)[None, :] < lengths[:, None]).astype(jnp.float32)


def attn_mask(xlen: jnp.ndarray, max_xlen: int, ylen: Optional[jnp.ndarray] = None,
              max_ylen: Optional[int] = None) -> jnp.ndarray:
    """Outer-product ``[B, N, T]`` mask (reference ``modules.py:174-179``)."""
    if ylen is None:
        ylen, max_ylen = xlen, max_xlen
    return jnp.einsum('bn,bt->bnt', sequence_mask(xlen, max_xlen),
                      sequence_mask(ylen, max_ylen))


class GaussianNoise(nn.Module):
    """Train-only additive N(0, std) regularizer (reference ``modules.py:95-98``)."""
    std: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train or not self.std:
            return x
        noise = self.std * jax.random.normal(self.make_rng('noise'), x.shape, x.dtype)
        return x + noise


class Prenet(nn.Module):
    """Dense+ReLU+dropout chain; dropout active only in training
    (reference ``modules.py:13-21``)."""
    layer_sizes: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i, size in enumerate(self.layer_sizes):
            x = nn.relu(nn.Dense(size, name=f'dense_{i + 1}')(x))
            if train:
                x = nn.Dropout(0.5, deterministic=False, name=f'dropout_{i + 1}')(x)
        return x


class ConvStack(nn.Module):
    """n-1 conv+act layers at d_in then a linear conv to d_out
    (reference ``modules.py:101-107``)."""
    n_layers: int
    kernel: int
    d_in: int
    d_out: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_layers - 1):
            x = nn.Conv(self.d_in, (self.kernel,), padding='SAME', name=f'conv{i + 1}')(x)
            x = self.activation(x)
        return nn.Conv(self.d_out, (self.kernel,), padding='SAME',
                       name=f'conv{self.n_layers}')(x)


class DotAttn(nn.Module):
    """Masked scaled dot-product attention returning (values, scores).

    Quirk preserved from the reference (``modules.py:110-127``): the energy is
    masked with -1e8 *before* the 1/sqrt(depth) scaling, and the scale uses
    the encoder depth, not the head dim.
    """
    attn_dim: int
    scale_depth: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray):
        q = nn.Dense(self.attn_dim, name='q')(x)          # [B, N, A]
        k = nn.Dense(self.attn_dim, name='k')(y)          # [B, T, A]
        v = nn.Dense(self.attn_dim, name='v')(y)          # [B, T, A]
        e = jnp.einsum('bna,bta->bnt', q, k)
        e = e * mask + (1.0 - mask) * -1e8
        e = e / jnp.sqrt(jnp.asarray(self.scale_depth, e.dtype))
        sc = jax.nn.softmax(e, axis=-1)
        r = jnp.einsum('bnt,bta->bna', sc, v)
        return r, sc


class GLU(nn.Module):
    """Gated conv unit (reference ``modules.py:130-144``)."""
    depth: int
    kernel: int = 7
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = nn.Conv(self.depth * 2, (self.kernel,), padding='SAME', name='conv')(x)
        if self.activation is not None:
            conv = self.activation(conv)
        h, gate = jnp.split(conv, 2, axis=-1)
        if self.activation is not None:
            h = self.activation(h)
        return h * jax.nn.sigmoid(gate)


class GFFW(nn.Module):
    """Gated feed-forward: GLU(k, leaky_relu) + pointwise conv
    (reference ``modules.py:147-151``)."""
    depth: int
    kernel: int = 9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        o = GLU(self.depth, self.kernel, activation=nn.leaky_relu, name='GLU')(x)
        return nn.Conv(self.depth, (1,), padding='SAME', name='conv_pointwise')(o)


class Highway(nn.Module):
    """Highway layer, transform-gate bias init -1 (reference ``modules.py:36-49``)."""
    depth: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.depth, name='H')(x)
        h = nn.relu(h)
        t = nn.Dense(self.depth, name='T',
                     bias_init=nn.initializers.constant(-1.0))(x)
        t = jax.nn.sigmoid(t)
        return h * t + x * (1.0 - t)


class ConvBN(nn.Module):
    """conv1d + batch-norm + activation (reference ``modules.py:24-33``)."""
    filters: int
    kernel: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.filters, (self.kernel,), padding='SAME')(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return self.activation(x)


def embedding_init(stddev: float = 0.5):
    """Truncated-normal embedding init (reference ``tacotron.py:50,57-59``)."""
    return nn.initializers.truncated_normal(stddev=stddev)


def cosine_similarity_matrix(e: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine similarity of embedding rows
    (reference ``tacotron.py:178-183``)."""
    dot = e @ e.T
    n = jnp.linalg.norm(e, axis=-1, keepdims=True)
    return dot / (n @ n.T + 1e-8)
