"""TransTacoS acoustic model: text -> (mel, linear spec, stop tokens).

TPU-native rebuild of ``transtacos/models/tacotron.py``: flax module, static
shape buckets, ``nn.scan`` AR decoder, grouped-dense posnet.  Architecture:

  phone/tone/prds embeddings (+PE) -> prdsnet conv (prosody prediction)
  -> self-attention encoder with f0/c0 fusenet -> residual-GRU + LSA decoder
  (reduction factor r) -> mel [B,T,80] -> posnet (low 42 mels -> dense stack
  -> 8 grouped heads) -> linear mag [B,T,1024] (DC bin dropped)

Losses reproduce the reference sum (``tacotron.py:213-245``) including its
quirks, but masked so that bucket padding beyond the reference's own padded
length does not perturb the means.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..text.symbols import get_vocab_size
from . import decoder as dec
from .encoder import CBHG, EncoderSA
from .layers import (ConvStack, GaussianNoise, cosine_similarity_matrix,
                     embedding_init, sinusoid_table)


class Tacotron(nn.Module):
    """Single compact module; ``train=True`` runs the teacher-forced forward,
    ``train=False`` runs fixed-length AR inference with stop-token masking.
    Both paths share one parameter tree (flax keys by module name)."""
    cfg: Config

    @nn.compact
    def __call__(self, text, text_lengths, prds=None, spec_lengths=None,
                 mel_targets=None, f0_targets=None, c0_targets=None,
                 tf_ratio=0.0, train: bool = False,
                 max_iters: Optional[int] = None,
                 encoder_only: bool = False) -> Dict[str, Any]:
        hp = self.cfg.acoustic
        au = self.cfg.audio
        vocab = get_vocab_size(hp.g2p)
        b, n = text.shape[0], text.shape[1]
        r = hp.outputs_per_step

        # ---------------- embeddings + prdsnet (tacotron.py:40-78) --------
        e_text = self.param('E_text', embedding_init(), (vocab, hp.embed_depth))
        pe_table = jnp.asarray(sinusoid_table(max(au.maxlen_text, au.maxlen_spec),
                                              hp.posenc_depth))
        prds_prob = prds_out = None
        e_tone_sim = e_prds_sim = None
        if hp.g2p == 'syl4':
            e_tone = self.param('E_tone', embedding_init(), (au.n_tone, hp.embed_depth))
            e_prds = self.param('E_prds', embedding_init(), (au.n_prds, hp.embed_depth))
            cvvx, tone = text[..., 0], text[..., 1]
            text_embd = jnp.take(e_text, cvvx, axis=0) + jnp.take(e_tone, tone, axis=0)
            prds_prob = ConvStack(3, hp.prdsnet_conv_k, hp.prdsnet_depth, au.n_prds,
                                  activation=nn.relu, name='prdsnet')(text_embd)
            prds_out = jnp.argmax(prds_prob, axis=-1)
            prds_used = prds if train else prds_out
            embd_out = text_embd + jnp.take(e_prds, prds_used, axis=0)
            e_tone_sim = cosine_similarity_matrix(e_tone)
            e_prds_sim = cosine_similarity_matrix(e_prds)
        else:
            embd_out = jnp.take(e_text, text[..., 0], axis=0)

        if train:
            embd_out = GaussianNoise(hp.hidden_gauss_std, name='noise_embd')(
                embd_out, train)

        # ---------------- f0/c0 embeddings (train only; tacotron.py:86-103)
        f0_embd = c0_embd = None
        if hp.encoder_type == 'sa':
            if hp.txt_use_posenc:
                pe = jnp.broadcast_to(pe_table[None, :n, :], (b, n, hp.posenc_depth))
                embd_out = jnp.concatenate([embd_out, pe], axis=-1)
            if train:
                e_f0 = self.param('E_f0', embedding_init(),
                                  (au.n_f0_bins, hp.var_embed_depth))
                e_c0 = self.param('E_c0', embedding_init(),
                                  (au.n_c0_bins, hp.var_embed_depth))
                f0_embd = jnp.take(e_f0, f0_targets, axis=0)
                c0_embd = jnp.take(e_c0, c0_targets, axis=0)
                f0_embd = GaussianNoise(hp.hidden_gauss_std, name='noise_f0')(
                    f0_embd, train)
                c0_embd = GaussianNoise(hp.hidden_gauss_std, name='noise_c0')(
                    c0_embd, train)
                if hp.var_use_posenc:
                    t_frames = f0_targets.shape[-1]
                    pe_t = jnp.broadcast_to(pe_table[None, :t_frames, :],
                                            (b, t_frames, hp.posenc_depth))
                    f0_embd = jnp.concatenate([f0_embd, pe_t], axis=-1)
                    c0_embd = jnp.concatenate([c0_embd, pe_t], axis=-1)

        # ---------------- encoder ----------------------------------------
        if hp.encoder_type == 'sa':
            enc_out, attns, fuse = EncoderSA(hp, name='encoder')(
                embd_out, text_lengths, f0_embd, c0_embd, spec_lengths, train)
        else:
            enc_out = CBHG(hp, name='encoder')(embd_out, text_lengths, train)
            attns, fuse = ([], []), ((jnp.asarray(0.), jnp.asarray(0.)),
                                     (jnp.asarray(0.), jnp.asarray(0.)))
        if train:
            enc_out = GaussianNoise(hp.hidden_gauss_std, name='noise_enc')(
                enc_out, train)

        # ---------------- decoder (scan) ----------------------------------
        keys = dec.MemoryLayer(hp.attention_depth, name='attn_memory')(enc_out)
        attn_p = dec.prepare_attention(enc_out, text_lengths, keys)
        if encoder_only:
            # serving fast path: the fused pallas decoder (ops/fused_decoder)
            # consumes these directly with the same 'decoder_cell' params.
            # In train mode (hoisted-force step, train/acoustic_step.py) the
            # loss-side aux comes along too.
            out = {'keys': attn_p.keys, 'values': attn_p.values,
                   'mask': attn_p.mask, 'prds_out': prds_out,
                   'prds_prob': prds_prob}
            if train:
                (f0_r, f0_r_pred), (c0_r, c0_r_pred) = fuse
                out.update({
                    'E_text_sim': cosine_similarity_matrix(e_text),
                    'E_tone_sim': e_tone_sim, 'E_prds_sim': e_prds_sim,
                    'f0_r': f0_r, 'f0_r_pred': f0_r_pred,
                    'c0_r': c0_r, 'c0_r_pred': c0_r_pred})
            return out
        carry = dec.init_carry(b, n, self.cfg)
        if hp.fast_cell:
            from .decoder_fast import make_scanned_cell_fast as make_cell
        else:
            make_cell = dec.make_scanned_cell
        if train:
            cell = make_cell(self.cfg, 'train', remat=hp.remat_decoder,
                             unroll=hp.scan_unroll)
            xs = {'target_prev': dec.teacher_inputs(mel_targets, r)}
            tfr = jnp.asarray(tf_ratio, jnp.float32)
        else:
            cell = make_cell(self.cfg, 'infer')
            steps = max_iters or hp.max_iters
            xs = {'target_prev': jnp.zeros((steps, b, au.n_mel))}
            tfr = jnp.asarray(0.0)
        (carry, _, _), ys = cell((carry, attn_p, tfr), xs)

        frames = ys['frames']                       # [T/r, B, r*M]
        t_r = frames.shape[0]
        mel_out = frames.transpose(1, 0, 2).reshape(b, t_r * r, au.n_mel)
        stop_out = ys['stop'].transpose(1, 0, 2).reshape(b, t_r * r)
        alignments = ys['alignments'].transpose(1, 2, 0)    # [B, N, T/r]

        if hp.decoder_sew_layer:
            mel_out = mel_out + nn.Conv(au.n_mel, (7,), padding='SAME',
                                        name='sew_up_layer')(mel_out)

        # ---------------- posnet (tacotron.py:141-149) ---------------------
        x = mel_out[..., :hp.n_mel_low]
        x = nn.leaky_relu(nn.Dense(hp.posnet_depth // 4, name='posnet1')(x))
        x = nn.leaky_relu(nn.Dense(hp.posnet_depth // 2, name='posnet2')(x))
        x = nn.leaky_relu(nn.Dense(hp.posnet_depth, name='posnet3')(x))
        groups = jnp.split(x, hp.posnet_ngroup, axis=-1)
        mag_out = jnp.concatenate(
            [nn.Dense((au.n_freq - 1) // hp.posnet_ngroup, name=f'posnet4_{i}')(g)
             for i, g in enumerate(groups)], axis=-1)

        out: Dict[str, Any] = {
            'mel_outputs': mel_out, 'mag_outputs': mag_out,
            'stop_token_outputs': stop_out, 'alignments': alignments,
            'prds_prob': prds_prob, 'prds_out': prds_out,
            'E_text_sim': cosine_similarity_matrix(e_text),
            'E_tone_sim': e_tone_sim, 'E_prds_sim': e_prds_sim,
        }
        if train:
            (f0_r, f0_r_pred), (c0_r, c0_r_pred) = fuse
            out.update({'slf_attn': attns[0], 'crx_attn': attns[1],
                        'f0_r': f0_r, 'f0_r_pred': f0_r_pred,
                        'c0_r': c0_r, 'c0_r_pred': c0_r_pred})
        else:
            finished = ys['finished']               # [T, B]
            fin_any = jnp.any(finished, axis=0)
            first = jnp.argmax(finished, axis=0)
            n_steps = jnp.where(fin_any, first + 1, t_r)
            out['out_lengths'] = n_steps * r
        return out


def _grouped_heads_dense(kernels, biases) -> tuple:
    """Fold the posnet's per-group head kernels into one block-diagonal
    dense matmul.  Eight [T,64]x[64,128] matmuls with split/concat relayouts
    lower terribly on TPU at serving batch sizes (measured ~10 ms for the
    whole posnet at [1,400] frames); the single [T,512]x[512,1024] matmul is
    numerically identical and MXU-shaped."""
    ks = jnp.stack(kernels)                       # [G, C/G, F/G]
    g = ks.shape[0]
    dense = jnp.einsum('gcf,hg->hcgf', ks, jnp.eye(g, dtype=ks.dtype))
    dense = dense.reshape(g * ks.shape[1], g * ks.shape[2])
    return dense, jnp.concatenate(biases)


def posnet_apply(params: Dict[str, Any], mel_out: jnp.ndarray,
                 cfg: Config) -> jnp.ndarray:
    """Standalone posnet from the Tacotron param tree (serving fast path:
    mel from the fused decoder -> linear spec), identical math to the
    in-module posnet above."""
    hp = cfg.acoustic
    x = mel_out[..., :hp.n_mel_low]
    for name in ('posnet1', 'posnet2', 'posnet3'):
        x = nn.leaky_relu(x @ params[name]['kernel'] + params[name]['bias'])
    wd, bd = _grouped_heads_dense(
        [params[f'posnet4_{i}']['kernel'] for i in range(hp.posnet_ngroup)],
        [params[f'posnet4_{i}']['bias'] for i in range(hp.posnet_ngroup)])
    return x @ wd + bd


# ---------------------------------------------------------------------------
# losses (reference ``tacotron.py:213-245``)
# ---------------------------------------------------------------------------

def _masked_mean(err: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over [B, T, ...] restricted to frames where mask==1.

    The reference computes plain means over its batch-padded tensors; the
    mask reproduces exactly that population (padding up to the reference's
    own padded length included, bucket-extra padding excluded).
    """
    if err.ndim == 3:
        m = frame_mask[..., None]
        denom = frame_mask.sum() * err.shape[-1]
    else:
        m = frame_mask
        denom = frame_mask.sum()
    return jnp.sum(err * m) / jnp.maximum(denom, 1.0)


def compute_losses(out: Dict[str, Any], batch: Dict[str, Any], cfg: Config,
                   params) -> Dict[str, jnp.ndarray]:
    """Assemble the training loss.

    Keeps the reference's quirks: the ``mel_loss``/``mag_loss`` names are
    swapped relative to their tensors (``tacotron.py:218-219``; the sum is
    unaffected), fusenet losses are unmasked MSEs, similarity regularizers
    weigh off-diagonal embedding cosine similarity, L2 over all params.
    """
    hp = cfg.acoustic
    t_pad = out['mel_outputs'].shape[1]
    n_pad = batch['text'].shape[1]
    bsz = out['mel_outputs'].shape[0]

    # frame mask: 1 up to the reference-equivalent padded length
    fmask = (jnp.arange(t_pad)[None, :] < batch['frame_loss_len']).astype(jnp.float32)
    fmask = jnp.broadcast_to(fmask, (bsz, t_pad))
    tmask = (jnp.arange(n_pad)[None, :] < batch['text_loss_len']).astype(jnp.float32)
    tmask = jnp.broadcast_to(tmask, batch['prds'].shape)

    # NOTE swapped names preserved from the reference
    mel_loss = _masked_mean(jnp.abs(batch['mag_targets'] - out['mag_outputs']), fmask)
    mag_loss = _masked_mean(jnp.abs(batch['mel_targets'] - out['mel_outputs']), fmask)

    if hp.encoder_type == 'sa' and hp.encoder_fusenet:
        f0_loss = jnp.mean(jnp.square(out['f0_r'] - out['f0_r_pred']))
        c0_loss = jnp.mean(jnp.square(out['c0_r'] - out['c0_r_pred']))
    else:
        f0_loss = c0_loss = jnp.asarray(0.0)

    if hp.g2p == 'syl4':
        logp = jax.nn.log_softmax(out['prds_prob'], axis=-1)
        ce = -jnp.take_along_axis(logp, batch['prds'][..., None], axis=-1)[..., 0]
        prds_loss = jnp.sum(ce * tmask) / jnp.maximum(tmask.sum(), 1.0)
        vocab = out['E_text_sim'].shape[0]
        sim_loss = (jnp.mean(jnp.abs((1.0 - jnp.eye(vocab)) * out['E_text_sim']))
                    + jnp.mean(jnp.abs((1.0 - jnp.eye(cfg.audio.n_prds))
                                       * out['E_prds_sim']))) * hp.sim_weight
    else:
        prds_loss = jnp.asarray(0.0)
        vocab = out['E_text_sim'].shape[0]
        sim_loss = jnp.mean(jnp.abs((1.0 - jnp.eye(vocab))
                                    * out['E_text_sim'])) * hp.sim_weight

    # stop-token sigmoid CE (numerically-stable formulation)
    logits = out['stop_token_outputs']
    labels = batch['stop_token_targets']
    ce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    stop_token_loss = _masked_mean(ce, fmask)

    # L2 over all trainable params (tf.nn.l2_loss = sum(v^2)/2)
    l2 = sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params)) / 2.0
    reg_loss = l2 * hp.reg_weight

    loss = (prds_loss + mel_loss + mag_loss + f0_loss + c0_loss + sim_loss
            + stop_token_loss + reg_loss)
    return {
        'loss': loss, 'mel_loss': mel_loss, 'mag_loss': mag_loss,
        'f0_loss': f0_loss, 'c0_loss': c0_loss, 'prds_loss': prds_loss,
        'sim_loss': sim_loss, 'stop_token_loss': stop_token_loss,
        'reg_loss': reg_loss,
    }
