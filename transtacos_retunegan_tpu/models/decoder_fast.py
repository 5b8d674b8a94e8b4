"""Op-count-reduced decoder cell: identical math, fewer kernels per step.

The training decode is a ``nn.scan`` whose per-step body is ~30 small ops at
serving-scale shapes ([16, 256]-ish operands): the step is launch/latency
bound, not FLOP bound (``docs/acoustic_step_trace.json``).  XLA does not
horizontally fuse independent dots, so the stock cell pays one MXU pass per
gate matmul.  This cell restructures the SAME math (reference semantics
pinned in ``decoder.py::DecoderCell``, ``rnn_wrappers.py:181-235``) into
fewer, wider ops:

* ``FusedGRU``: flax ``nn.GRUCell`` computes six [.,H] dots per step
  (ir/iz/in vs hr/hz/hn).  Each output element of a concatenated
  ``[., 3H]`` dot is the same independent dot product, so fusing the three
  input-side (resp. hidden-side) gate matmuls into one is numerically
  EXACT, and 6 dots become 2.
* folded location features: ``Conv(k=31, 32) -> Dense(128)`` is a
  composition of linear maps; one ``Conv(k=31, 128)`` with kernel
  ``k_conv @ w_dense`` and bias ``b_conv @ w_dense`` computes the same map
  (associativity; |delta| ~ 1e-6 f32 from re-accumulation).
* combined output head: ``frame_projection`` (r*n_mel) and
  ``stop_projection`` (r) share their input; one ``[., r*n_mel + r]`` dense
  + split is exact.

Parameters use a FUSED layout; ``fuse_cell_params`` maps a stock
``decoder_cell`` tree onto it (used by the equivalence tests and by
checkpoint migration).  Everything else (prenet, input-feed projection,
residual wiring, masking, carry) is shared with ``decoder.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from . import decoder as dec
from .layers import Prenet


def _concat_init(base_init, n: int):
    """Initializer drawing ``n`` independent ``base_init`` blocks along the
    last axis — the fused [in, n*H] kernel matches n stock [in, H] draws."""
    def init(key, shape, dtype=jnp.float32):
        h = shape[-1] // n
        keys = jax.random.split(key, n)
        blocks = [base_init(k, shape[:-1] + (h,), dtype) for k in keys]
        return jnp.concatenate(blocks, axis=-1)
    return init


class FusedGRU(nn.Module):
    """``nn.GRUCell`` with the three gate matmuls fused per side (exact)."""
    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray):
        hdim = self.features
        wi = self.param('wi', _concat_init(nn.initializers.lecun_normal(), 3),
                        (x.shape[-1], 3 * hdim))
        wh = self.param('wh', _concat_init(nn.initializers.orthogonal(), 3),
                        (hdim, 3 * hdim))
        bi = self.param('bi', nn.initializers.zeros, (3 * hdim,))
        bn = self.param('bn', nn.initializers.zeros, (hdim,))
        xi = x @ wi + bi
        hh = h @ wh
        r = nn.sigmoid(xi[..., :hdim] + hh[..., :hdim])
        z = nn.sigmoid(xi[..., hdim:2 * hdim] + hh[..., hdim:2 * hdim])
        n = jnp.tanh(xi[..., 2 * hdim:] + r * (hh[..., 2 * hdim:] + bn))
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h


class LSAStepFast(nn.Module):
    """``decoder.LSAStep`` with conv+dense location features folded into one
    conv (same map; see module docstring)."""
    attention_dim: int = 128
    location_kernel: int = 31

    @nn.compact
    def __call__(self, query: jnp.ndarray, cum_alignments: jnp.ndarray,
                 attn: dec.AttentionParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
        q = nn.Dense(self.attention_dim, use_bias=False,
                     name='query_layer')(query)[:, None, :]
        loc = nn.Conv(self.attention_dim, (self.location_kernel,),
                      padding='SAME', name='loc_conv')(cum_alignments[..., None])
        v = self.param('attention_variable', nn.initializers.xavier_uniform(),
                       (self.attention_dim, 1))
        b = self.param('attention_bias', nn.initializers.zeros,
                       (self.attention_dim,))
        energy = jnp.squeeze(jnp.tanh(attn.keys + q + loc + b) @ v, -1)
        energy = jnp.where(attn.mask > 0, energy, -jnp.inf)
        alignments = jax.nn.softmax(energy, axis=-1)
        return alignments, cum_alignments + alignments


class DecoderCellFast(nn.Module):
    """Drop-in fast variant of ``decoder.DecoderCell`` (same carry contract,
    same emissions; train and infer modes)."""
    cfg: Config
    mode: str  # 'train' | 'infer'

    @nn.compact
    def __call__(self, state, step_input):
        hp = self.cfg.acoustic
        n_mel = self.cfg.audio.n_mel
        r = hp.outputs_per_step
        carry, attn, tf_ratio = state
        target_prev = step_input['target_prev']

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

        prenet_out = Prenet(hp.prenet_depths, name='decoder_prenet')(
            inputs, train=self.mode == 'train')

        rnn_input = jnp.concatenate([prenet_out, carry.attention], axis=-1)
        x = nn.Dense(hp.decoder_depth, name='rnn_in_proj')(rnn_input)
        new_states = []
        for i, h in enumerate(carry.gru_states):
            h_new, out = FusedGRU(hp.decoder_depth, name=f'gru_{i}')(h, x)
            new_states.append(h_new)
            x = out + x
        rnn_output = x

        alignments, cum_alignments = LSAStepFast(hp.attention_depth,
                                                 name='lsa')(
            rnn_output, carry.alignments, attn)
        context = jnp.einsum('bn,bnd->bd', alignments, attn.values)

        proj_input = jnp.concatenate([rnn_output, context], axis=-1)
        head = nn.Dense(n_mel * r + r, name='out_projection')(proj_input)
        frame_out, stop_out = head[..., :n_mel * r], head[..., n_mel * r:]

        prev_out = frame_out[:, -n_mel:]

        if self.mode == 'infer':
            stop_prob = jax.nn.sigmoid(stop_out)
            newly = jnp.any(stop_prob >= 0.5, axis=-1)
            was_finished = carry.finished
            finished = jnp.logical_or(was_finished, newly)
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
            stop_emit = stop_out

        new_carry = dec.DecoderCarry(tuple(new_states), context,
                                     cum_alignments, prev_out, finished)
        ys = {'frames': frame_out, 'stop': stop_emit, 'alignments': alignments,
              'finished': finished}
        return (new_carry, attn, tf_ratio), ys


def make_scanned_cell_fast(cfg: Config, mode: str, remat: bool = False,
                           unroll: int = 1) -> nn.Module:
    """``decoder.make_scanned_cell`` over the fast cell."""
    cell = nn.remat(DecoderCellFast, prevent_cse=False) if remat \
        else DecoderCellFast
    scanned = nn.scan(
        cell,
        variable_broadcast='params',
        split_rngs={'params': False, 'dropout': True, 'tf': True,
                    'noise': True},
        in_axes=0, out_axes=0, unroll=unroll)
    return scanned(cfg, mode, name='decoder_cell')


def hoisted_force_decode(cell_params: Dict[str, Any], cfg: Config,
                         mel_targets: jnp.ndarray, keys: jnp.ndarray,
                         values: jnp.ndarray, mask: jnp.ndarray,
                         dropout_rng: jnp.ndarray = None):
    """Teacher-forced TRAINING decode with the time-parallel work hoisted out
    of the scan.

    When the decoder input does not depend on the previous prediction —
    ``tf_method='force'``, or ``mix``/``random`` while ``tf_ratio == 1.0``
    (the ENTIRE pre-decay regime, reference ``custom_decoder.py:124-151``:
    cosine decay only starts at ``tf_start_decay``) — the per-step inputs are
    pure ground truth, so:

      * the prenet runs as ONE batched matmul over all steps ([S*B, .] rows
        instead of [B, .] per step — MXU-shaped), including its half of the
        input-feed projection;
      * the frame/stop head runs as ONE batched matmul after the scan;
      * only the recurrent core (input-feed context proj, GRU tower, LSA,
        context) stays sequential.

    Math is the stock cell's exactly; the prenet dropout masks come from a
    different rng stream (batched instead of per-step folds) — identical
    distribution, not bit-identical.  Emits what the train path consumes:
    mel [B, S*r, M], raw stop logits [B, S*r], alignments [B, N, S].

    Weights are consumed via ``ops.fused_decoder.fold_params`` (f32), so
    both cell layouts work.
    """
    from ..ops.fused_decoder import fold_params
    hp = cfg.acoustic
    r = hp.outputs_per_step
    fp = fold_params(cell_params, dtype=jnp.float32, r=r)

    x_in = dec.teacher_inputs(mel_targets, r)              # [S, B, M]
    s, b, m = x_in.shape
    n = mask.shape[-1]

    # ---- batched prenet (dropout always on in train: reference
    # ``modules.py:13-21``) + the prenet half of the input-feed projection
    act = x_in.reshape(s * b, m)
    drops = (jax.random.split(dropout_rng, len(fp.prenet))
             if dropout_rng is not None else [None] * len(fp.prenet))
    for (w, bias), drng in zip(fp.prenet, drops):
        # jax.nn.relu, NOT jnp.maximum: their subgradients at exactly 0
        # differ (0 vs 0.5), and the <GO> zeros frame with zero-init biases
        # hits the tie on every element, skewing prenet gradients
        act = jax.nn.relu(act @ w + bias)
        if drng is not None:
            keep = jax.random.bernoulli(drng, 0.5, act.shape)
            act = jnp.where(keep, act / 0.5, 0.0)
    xp = (act @ fp.wx_p + fp.bx).reshape(s, b, -1)         # [S, B, H]

    # ---- sequential core
    loc_k = fp.loc.T[:, None, :]                           # [A, 1, 31] OIW

    def core(carry, xp_t):
        hs, ctx, cum = carry
        x = xp_t + ctx @ fp.wx_c
        h_news = []
        for j, (wi, bi, wh, bhn) in enumerate(fp.grus):
            hdim = hs[j].shape[-1]
            gi = x @ wi + bi
            gh = hs[j] @ wh
            rr = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
            z = jax.nn.sigmoid(gi[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
            nn_ = jnp.tanh(gi[:, 2 * hdim:] + rr * (gh[:, 2 * hdim:] + bhn))
            h_new = (1.0 - z) * nn_ + z * hs[j]
            h_news.append(h_new)
            x = h_new + x                                   # ResidualWrapper
        rnn = x
        q = rnn @ fp.wq
        loc = jax.lax.conv_general_dilated(
            cum[:, None, :], loc_k, (1,), 'SAME',
            dimension_numbers=('NCH', 'OIH', 'NCH')).transpose(0, 2, 1)
        energy = jnp.squeeze(
            jnp.tanh(keys + q[:, None, :] + loc + fp.ba) @ fp.v, -1)
        energy = jnp.where(mask > 0, energy, -jnp.inf)
        align = jax.nn.softmax(energy, axis=-1)
        ctx_new = jnp.einsum('bn,bnd->bd', align, values)
        return ((tuple(h_news), ctx_new, cum + align),
                (rnn, ctx_new, align))

    if hp.remat_decoder:
        core = jax.checkpoint(core, prevent_cse=False)
    h0 = tuple(jnp.zeros((b, hp.decoder_depth)) for _ in fp.grus)
    carry0 = (h0, jnp.zeros((b, values.shape[-1])), jnp.zeros((b, n)))
    _, (rnn_s, ctx_s, align_s) = jax.lax.scan(core, carry0, xp,
                                              unroll=hp.scan_unroll)

    # ---- batched output head
    frames = rnn_s @ fp.wf_r + ctx_s @ fp.wf_c + fp.bf     # [S, B, r*M]
    stop = rnn_s @ fp.ws_r + ctx_s @ fp.ws_c + fp.bs       # [S, B, r]
    n_mel = cfg.audio.n_mel
    mel_out = frames.transpose(1, 0, 2).reshape(b, s * r, n_mel)
    stop_out = stop.transpose(1, 0, 2).reshape(b, s * r)
    alignments = align_s.transpose(1, 2, 0)                # [B, N, S]
    return mel_out, stop_out, alignments


def fuse_cell_params(stock: Dict[str, Any]) -> Dict[str, Any]:
    """Map a stock ``decoder_cell`` param tree onto the fused layout.

    Exact per the module docstring; used by the equivalence tests and by
    checkpoint migration (stock checkpoints remain loadable).
    """
    out: Dict[str, Any] = {
        'decoder_prenet': stock['decoder_prenet'],
        'rnn_in_proj': stock['rnn_in_proj'],
    }
    i = 0
    while f'gru_{i}' in stock:
        g = stock[f'gru_{i}']
        out[f'gru_{i}'] = {
            'wi': jnp.concatenate([g['ir']['kernel'], g['iz']['kernel'],
                                   g['in']['kernel']], axis=1),
            'wh': jnp.concatenate([g['hr']['kernel'], g['hz']['kernel'],
                                   g['hn']['kernel']], axis=1),
            'bi': jnp.concatenate([g['ir']['bias'], g['iz']['bias'],
                                   g['in']['bias']]),
            'bn': g['hn']['bias'],
        }
        i += 1
    lsa = stock['lsa']
    k = lsa['location_convolution']['kernel']        # [K, 1, F]
    w = lsa['location_layer']['kernel']              # [F, A]
    out['lsa'] = {
        'query_layer': lsa['query_layer'],
        'loc_conv': {'kernel': jnp.einsum('kif,fa->kia', k, w),
                     'bias': lsa['location_convolution']['bias'] @ w},
        'attention_variable': lsa['attention_variable'],
        'attention_bias': lsa['attention_bias'],
    }
    out['out_projection'] = {
        'kernel': jnp.concatenate([stock['frame_projection']['kernel'],
                                   stock['stop_projection']['kernel']], axis=1),
        'bias': jnp.concatenate([stock['frame_projection']['bias'],
                                 stock['stop_projection']['bias']]),
    }
    return out
