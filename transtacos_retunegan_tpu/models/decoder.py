"""Autoregressive decoder: residual GRU stack + location-sensitive attention,
expressed as a ``flax.linen.scan`` over decode steps.

This replaces the reference's ``tf.contrib.seq2seq.dynamic_decode`` while-loop
(``transtacos/models/tacotron.py:116-129``, ``rnn_wrappers.py:84-235``,
``attention.py``, ``custom_decoder.py``) with a statically-shaped scan the
XLA TPU compiler can pipeline: per step -- prenet -> [prev context] -> dense ->
2x residual GRU -> LSA over precomputed keys -> frame/stop projections.

Teacher forcing happens *inside* the scan carry (the reference's 'mix' method
blends the previous prediction with the ground-truth frame, so training is
inherently sequential too).  Inference runs a fixed ``max_iters`` scan with
a finished mask reproducing ``impute_finished=True`` semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from .layers import Prenet, sequence_mask


class AttentionParams(NamedTuple):
    """Precomputed per-utterance attention tensors."""
    keys: jnp.ndarray      # [B, N, attn_dim]  processed memory
    values: jnp.ndarray    # [B, N, D]         masked encoder outputs
    mask: jnp.ndarray      # [B, N]            1 inside text length


class DecoderCarry(NamedTuple):
    gru_states: Tuple[jnp.ndarray, ...]   # per-layer GRU hidden [B, H]
    attention: jnp.ndarray                # previous context [B, D]
    alignments: jnp.ndarray               # cumulative alignments [B, N]
    prev_out: jnp.ndarray                 # last predicted frame [B, n_mel]
    finished: jnp.ndarray                 # [B] bool (inference)


class MemoryLayer(nn.Module):
    """Key projection of the encoder memory (BahdanauAttention memory_layer:
    Dense(num_units, use_bias=False))."""
    attention_dim: int

    @nn.compact
    def __call__(self, memory: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.attention_dim, use_bias=False, name='memory_layer')(memory)


def prepare_attention(memory: jnp.ndarray, memory_lengths: jnp.ndarray,
                      keys: jnp.ndarray) -> AttentionParams:
    """Mask memory beyond its length (TF masks values with zeros and scores
    with -inf; reference ``attention.py:59-89`` via BahdanauAttention)."""
    mask = sequence_mask(memory_lengths, memory.shape[-2])
    return AttentionParams(keys=keys, values=memory * mask[..., None], mask=mask)


class LSAStep(nn.Module):
    """One location-sensitive-attention evaluation
    (reference ``attention.py:8-40, 91-132``)."""
    attention_dim: int = 128
    location_filters: int = 32
    location_kernel: int = 31

    @nn.compact
    def __call__(self, query: jnp.ndarray, cum_alignments: jnp.ndarray,
                 attn: AttentionParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # query: [B, H] -> [B, 1, A]
        q = nn.Dense(self.attention_dim, use_bias=False, name='query_layer')(query)
        q = q[:, None, :]
        # location features from cumulative alignments [B, N] -> [B, N, A]
        f = nn.Conv(self.location_filters, (self.location_kernel,), padding='SAME',
                    name='location_convolution')(cum_alignments[..., None])
        loc = nn.Dense(self.attention_dim, use_bias=False,
                       name='location_layer')(f)
        v = self.param('attention_variable', nn.initializers.xavier_uniform(),
                       (self.attention_dim, 1))
        b = self.param('attention_bias', nn.initializers.zeros,
                       (self.attention_dim,))
        energy = jnp.squeeze(jnp.tanh(attn.keys + q + loc + b) @ v, -1)  # [B, N]
        energy = jnp.where(attn.mask > 0, energy, -jnp.inf)
        alignments = jax.nn.softmax(energy, axis=-1)
        return alignments, cum_alignments + alignments


class DecoderCell(nn.Module):
    """One decode step (reference ``rnn_wrappers.py:181-235``).

    mode='train': input = tf-blend(target_prev, prev_out); emits raw stop logits.
    mode='infer': input = prev_out; emits sigmoid stop probs + finished logic
    with impute_finished masking.
    """
    cfg: Config
    mode: str  # 'train' | 'infer'

    @nn.compact
    def __call__(self, state, step_input):
        hp = self.cfg.acoustic
        n_mel = self.cfg.audio.n_mel
        carry, attn, tf_ratio = state
        target_prev = step_input['target_prev']  # [B, n_mel] (zeros in infer/t0)

        # next-input selection (reference ``custom_decoder.py:102-116``)
        if self.mode == 'train':
            if hp.tf_method == 'force':
                inputs = target_prev
            elif hp.tf_method == 'mix':
                inputs = tf_ratio * target_prev + (1.0 - tf_ratio) * carry.prev_out
            elif hp.tf_method == 'random':
                coin = jax.random.uniform(self.make_rng('tf'), ())
                inputs = jnp.where(coin < tf_ratio, target_prev, carry.prev_out)
            else:
                raise ValueError(hp.tf_method)
        else:
            inputs = carry.prev_out

        # information bottleneck
        prenet_out = Prenet(hp.prenet_depths, name='decoder_prenet')(
            inputs, train=self.mode == 'train')

        # input feeding + RNN stack with residual wrappers
        rnn_input = jnp.concatenate([prenet_out, carry.attention], axis=-1)
        x = nn.Dense(hp.decoder_depth, name='rnn_in_proj')(rnn_input)
        new_states = []
        for i, h in enumerate(carry.gru_states):
            h_new, out = nn.GRUCell(hp.decoder_depth, name=f'gru_{i}')(h, x)
            new_states.append(h_new)
            x = out + x                                    # ResidualWrapper
        rnn_output = x

        # attention with cumulative-alignment location features
        alignments, cum_alignments = LSAStep(hp.attention_depth, name='lsa')(
            rnn_output, carry.alignments, attn)
        context = jnp.einsum('bn,bnd->bd', alignments, attn.values)

        proj_input = jnp.concatenate([rnn_output, context], axis=-1)
        frame_out = nn.Dense(n_mel * hp.outputs_per_step,
                             name='frame_projection')(proj_input)
        stop_out = nn.Dense(hp.outputs_per_step, name='stop_projection')(proj_input)

        prev_out = frame_out[:, -n_mel:]

        if self.mode == 'infer':
            stop_prob = jax.nn.sigmoid(stop_out)
            # finished when any of the r stop sigmoids rounds to 1
            # (reference ``custom_decoder.py:55``)
            newly = jnp.any(stop_prob >= 0.5, axis=-1)
            was_finished = carry.finished
            finished = jnp.logical_or(was_finished, newly)
            # impute_finished: zero emissions for entries finished BEFORE this
            # step; hold their state (reference ``tacotron.py:127-129``)
            alive = (~was_finished).astype(frame_out.dtype)[:, None]
            frame_out = frame_out * alive
            stop_emit = stop_prob
            new_states = [jnp.where(was_finished[:, None], h_old, h_new)
                          for h_old, h_new in zip(carry.gru_states, new_states)]
            context = jnp.where(was_finished[:, None], carry.attention, context)
            cum_alignments = jnp.where(was_finished[:, None], carry.alignments,
                                       cum_alignments)
            prev_out = jnp.where(was_finished[:, None], carry.prev_out, prev_out)
        else:
            finished = carry.finished
            stop_emit = stop_out   # raw logits; loss uses sigmoid-CE

        new_carry = DecoderCarry(tuple(new_states), context, cum_alignments,
                                 prev_out, finished)
        ys = {'frames': frame_out, 'stop': stop_emit, 'alignments': alignments,
              'finished': finished}
        return (new_carry, attn, tf_ratio), ys


def init_carry(batch: int, n_text: int, cfg: Config) -> DecoderCarry:
    hp = cfg.acoustic
    return DecoderCarry(
        gru_states=tuple(jnp.zeros((batch, hp.decoder_depth))
                         for _ in range(hp.decoder_layers)),
        attention=jnp.zeros((batch, hp.encoder_depth)),
        alignments=jnp.zeros((batch, n_text)),
        prev_out=jnp.zeros((batch, cfg.audio.n_mel)),
        finished=jnp.zeros((batch,), bool),
    )


def make_scanned_cell(cfg: Config, mode: str, remat: bool = False,
                      unroll: int = 1) -> nn.Module:
    """Scan the cell over the time axis; params broadcast, rngs split per step.

    ``remat=True`` recomputes each step in the backward pass instead of
    saving ~30 small per-step residual buffers -- on TPU the dynamic-update
    -slice traffic of those stacked residuals dominates the training step
    (measured 45 s/step without remat at bs16/T400 on v5e).
    """
    cell = nn.remat(DecoderCell, prevent_cse=False) if remat else DecoderCell
    scanned = nn.scan(
        cell,
        variable_broadcast='params',
        split_rngs={'params': False, 'dropout': True, 'tf': True, 'noise': True},
        in_axes=0, out_axes=0, unroll=unroll)
    return scanned(cfg, mode, name='decoder_cell')


def teacher_inputs(mel_targets: jnp.ndarray, r: int) -> jnp.ndarray:
    """Per-step previous-group-last-frame targets ``[T/r, B, n_mel]``.

    The reference feeds every r-th frame (``custom_decoder.py:73``); step t's
    input is group t-1's last frame, zeros (<GO>) at t=0.
    """
    tgt = mel_targets[:, r - 1::r, :]                 # [B, T/r, M] last of group
    shifted = jnp.pad(tgt[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    return jnp.swapaxes(shifted, 0, 1)                # [T/r, B, M]
