"""Ambient mixed-precision policy for the vocoder conv stacks.

TPU-first rationale: the GAN train step is HBM-bandwidth-bound — a round-3
device profile (``docs/PERF_NOTES.md``) shows 78% of device time in
elementwise/conv *fusions* spread over 11 discriminator towers, with no hot
kernel.  Halving activation and kernel bytes via bfloat16 attacks exactly
that bucket, and the v5e MXU natively prefers bf16 operands.

Policy (the standard "params-in-f32, compute-in-bf16" recipe):

* master params, optimizer state, and weight-norm math (``g * v/||v||``)
  stay float32 — the per-channel norm is a reduction over up to ~20k
  elements and must not accumulate in bf16;
* the normalized kernel, bias, and input are cast to the ambient dtype just
  before each conv, so convolutions and everything fused around them
  (leaky_relu, residual adds, pooling) run in bf16;
* losses are computed in float32: callers cast network outputs back up at
  the apply boundary (``train/vocoder_step.py``), and the multi-STFT loss
  always receives f32 waveforms.

The dtype is ambient (a context manager consulted at trace time) rather
than a module attribute so the dozens of WNConv call sites across 12
generator variants and 3 discriminator families need no threading.  Under
``jax.jit`` the context is entered for the duration of tracing only, which
is exactly when ``nn.Module.__call__`` runs — the compiled program bakes
the casts in.  The reference trains pure-f32 on CUDA torch
(``retunegan/train.py`` has no AMP); this is an opt-in TPU capability, off
by default (``VocoderConfig.compute_dtype = 'float32'``).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax.numpy as jnp

_AMBIENT: contextvars.ContextVar[Optional[jnp.dtype]] = contextvars.ContextVar(
    'ttrg_compute_dtype', default=None)


def resolve_dtype(name: str):
    """Map a config string to a jnp dtype, or None for full precision."""
    if name in ('float32', 'f32', '', None):
        return None
    if name in ('bfloat16', 'bf16'):
        return jnp.bfloat16
    raise ValueError(f'unsupported compute_dtype: {name!r}')


@contextlib.contextmanager
def compute_dtype(dtype):
    """Set the ambient conv compute dtype (None/'float32' = no-op)."""
    if isinstance(dtype, str):
        dtype = resolve_dtype(dtype)
    tok = _AMBIENT.set(dtype)
    try:
        yield
    finally:
        _AMBIENT.reset(tok)


def ambient_dtype():
    """The dtype convs should compute in, or None for input precision."""
    return _AMBIENT.get()


def cast_compute(*arrays):
    """Cast conv operands to the ambient dtype (identity when unset)."""
    dt = _AMBIENT.get()
    if dt is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(a.astype(dt) for a in arrays)
    return out if len(out) > 1 else out[0]
