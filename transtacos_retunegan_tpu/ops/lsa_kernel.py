"""Pallas TPU kernel: fused location-sensitive-attention step.

One decode step of the LSA (reference ``transtacos/models/attention.py``)
costs several HBM round trips when expressed as separate XLA ops (location
conv, location dense, energy sum, mask, softmax, context matmul).  This
kernel fuses the whole step per batch row in VMEM:

    loc  = conv31(cum_align) @ Wloc     (conv+dense pre-folded to [31, A];
                                         the conv itself becomes a constant
                                         0/1 shift-matrix matmul -- MXU work,
                                         no gather/scatter in-kernel)
    e    = tanh(keys + q + loc + b) @ v
    a    = softmax(e) masked to the text length
    cum' = cum + a
    ctx  = a @ values

Inference-path fusion: the conv kernel and location dense are both linear,
so folding them is exact; training keeps the factored parameterization so
gradients match the reference.  Correctness is pinned by an interpret-mode
equivalence test against the plain-JAX formulation.

Shapes (per grid step over batch):
    q [1, A]   cum [1, N]   keys [1, N, A]   values [1, N, D]   mask [1, N]
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU memory spaces; interpret mode on CPU ignores them
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

KWIN = 31  # location conv width (reference ``attention.py:84-86``)


def fold_location_params(conv_kernel: jnp.ndarray, w_loc: jnp.ndarray) -> jnp.ndarray:
    """conv [31, 1, F] and dense [F, A] -> one [31, A] location matrix."""
    return jnp.einsum('kif,fa->ka', conv_kernel, w_loc)


@functools.lru_cache(maxsize=8)
def _shift_matrix(n: int, kwin: int = KWIN) -> np.ndarray:
    """Constant [N*kwin, N] 0/1 matrix: (SHIFT @ cum).reshape(N, kwin)[i, k]
    == cum[i + k - kwin//2] ('same' padding with zeros)."""
    half = kwin // 2
    m = np.zeros((n * kwin, n), np.float32)
    for i in range(n):
        for k in range(kwin):
            j = i + k - half
            if 0 <= j < n:
                m[i * kwin + k, j] = 1.0
    return m


def _kernel(q_ref, cum_ref, keys_ref, values_ref, mask_ref,
            shift_ref, lock_ref, v_ref, b_ref,
            align_ref, cum_out_ref, ctx_ref):
    n = cum_ref.shape[1]
    kwin = lock_ref.shape[0]

    cum = cum_ref[0, :]                                        # [N]
    wflat = jnp.dot(shift_ref[:, :], cum[:, None],
                    preferred_element_type=jnp.float32)        # [N*kwin, 1]
    windows = wflat[:, 0].reshape(n, kwin)                     # [N, kwin]
    loc = jnp.dot(windows, lock_ref[:, :],
                  preferred_element_type=jnp.float32)          # [N, A]

    pre = jnp.tanh(keys_ref[0, :, :] + q_ref[0, :][None, :] + loc
                   + b_ref[0, :][None, :])
    e = jnp.dot(pre, v_ref[:, :], preferred_element_type=jnp.float32)[:, 0]

    mask = mask_ref[0, :]
    e = jnp.where(mask > 0, e, -1e30)
    m = jnp.max(e)
    w = jnp.exp(e - m) * (mask > 0)
    align = w / (jnp.sum(w) + 1e-30)

    align_ref[0, :] = align
    cum_out_ref[0, :] = cum + align
    ctx_ref[0, :] = jnp.dot(align[None, :], values_ref[0, :, :],
                            preferred_element_type=jnp.float32)[0, :]


@functools.partial(jax.jit, static_argnames=('interpret',))
def lsa_step_fused(q: jnp.ndarray, cum: jnp.ndarray, keys: jnp.ndarray,
                   values: jnp.ndarray, mask: jnp.ndarray,
                   loc_mat: jnp.ndarray, v: jnp.ndarray, b: jnp.ndarray,
                   interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused LSA step.

    Args:
      q: processed query ``[B, A]`` (query_layer already applied).
      cum: cumulative alignments ``[B, N]``.
      keys/values: ``[B, N, A]`` / ``[B, N, D]``.
      mask: ``[B, N]`` 1 inside text length.
      loc_mat: folded location matrix ``[31, A]``.
      v/b: energy projection ``[A]`` / ``[A]``.
    Returns: (alignments [B, N], new cum [B, N], context [B, D]).
    """
    bsz, n = cum.shape
    a = keys.shape[-1]
    d = values.shape[-1]
    kwin = loc_mat.shape[0]
    shift = jnp.asarray(_shift_matrix(n, kwin))

    spec = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    out = pl.pallas_call(
        _kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, a), lambda i: (i, 0), **spec),
            pl.BlockSpec((1, n), lambda i: (i, 0), **spec),
            pl.BlockSpec((1, n, a), lambda i: (i, 0, 0), **spec),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), **spec),
            pl.BlockSpec((1, n), lambda i: (i, 0), **spec),
            pl.BlockSpec((n * kwin, n), lambda i: (0, 0), **spec),
            pl.BlockSpec((kwin, a), lambda i: (0, 0), **spec),
            pl.BlockSpec((a, 1), lambda i: (0, 0), **spec),
            pl.BlockSpec((1, a), lambda i: (0, 0), **spec),
        ],
        out_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0), **spec),
            pl.BlockSpec((1, n), lambda i: (i, 0), **spec),
            pl.BlockSpec((1, d), lambda i: (i, 0), **spec),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, cum, keys, values, mask, shift, loc_mat, v[:, None], b[None, :])
    return out[0], out[1], out[2]


def lsa_step_reference(q, cum, keys, values, mask, loc_mat, v, b):
    """Pure-JAX reference implementation (same math, separate ops)."""
    n = cum.shape[-1]
    half = loc_mat.shape[0] // 2
    padded = jnp.pad(cum, ((0, 0), (half, half)))
    windows = jnp.stack([padded[:, k:k + n] for k in range(loc_mat.shape[0])],
                        axis=-1)                                  # [B, N, 31]
    loc = jnp.einsum('bnk,ka->bna', windows, loc_mat)
    pre = jnp.tanh(keys + q[:, None, :] + loc + b[None, None, :])
    e = jnp.einsum('bna,a->bn', pre, v)
    e = jnp.where(mask > 0, e, -jnp.inf)
    align = jax.nn.softmax(e, axis=-1)
    ctx = jnp.einsum('bn,bnd->bd', align, values)
    return align, cum + align, ctx
