"""Pallas TPU fused autoregressive decoder step (inference path).

Profiling the 80-step decode scan on v5e showed ~1.3 ms/step: each step is
~30 small XLA kernels (prenet, input proj, 12 GRU matmul/elementwise ops,
location conv, energy, softmax, context, projections, impute masking), each
paying launch + HBM-latency overhead at [B<=16, 512]-sized operands.  This
module collapses one decode step into ONE pallas kernel launch:
prenet (n layers) -> input-feed proj -> residual GRU x n -> LSA (folded
location conv as shift-matrix matmul) -> context -> frame/stop projections
-> stop logic -> impute_finished state selection (kernel factory: any
prenet_depths/decoder_layers config).  A single launch halves the
launch-latency of the original A/B two-kernel split (34.5 -> 17.0 ms for an
80-step decode at batch 1 on v5e), which dominates at serving batch sizes.

The kernel consumes the *same* parameter tree the flax model trains (packed/folded at
trace time, which XLA hoists out of the scan).  GRU weights are carried in
bfloat16 (f32 accumulation) so each kernel's operands fit comfortably in
VMEM.  A pure-JAX reference path mirrors the math for interpret-mode
equivalence tests against ``models.decoder.DecoderCell``.

Reference semantics: ``transtacos/models/rnn_wrappers.py:181-235``,
``attention.py``, ``custom_decoder.py:44-59`` (stop when any of the r stop
sigmoids >= .5; impute_finished zeroes emissions and holds state).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import Config
from .lsa_kernel import fold_location_params

try:
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


class FoldedParams(NamedTuple):
    """Packed decoder weights (bf16 matmul operands, f32 biases).

    ``prenet`` holds one (w [in, P_i], b [P_i]) pair per prenet layer;
    ``grus`` one (wi [H, 3H] (r|z|n), bi [3H], wh [H, 3H], bhn [H]) tuple per
    GRU layer -- both arbitrary-depth (any ``prenet_depths`` /
    ``decoder_layers`` config).
    """
    prenet: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    wx_p: jnp.ndarray    # input proj, prenet part  [P, H]
    wx_c: jnp.ndarray    # input proj, context part [D, H]
    bx: jnp.ndarray      # [H]
    grus: Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], ...]
    wq: jnp.ndarray      # query proj [H, A]
    loc: jnp.ndarray     # folded location matrix [31, A]
    v: jnp.ndarray       # [A, 1]
    ba: jnp.ndarray      # [A]
    wf_r: jnp.ndarray    # frame proj, rnn part [H, r*M]
    wf_c: jnp.ndarray    # frame proj, ctx part [D, r*M]
    bf: jnp.ndarray      # [r*M]
    ws_r: jnp.ndarray    # stop proj [H, r]
    ws_c: jnp.ndarray    # [D, r]
    bs: jnp.ndarray      # [r]


def fold_params(cell_params: Dict[str, Any], dtype=jnp.bfloat16,
                r: int = 0) -> FoldedParams:
    """Pack a flax ``decoder_cell`` param tree into kernel operands.

    Accepts BOTH cell layouts: the stock ``decoder.DecoderCell`` tree and
    the fused ``decoder_fast.DecoderCellFast`` tree (whose on-disk layout
    already matches these operands).  ``r`` (outputs_per_step) is required
    only for the fused layout, to split the combined frame|stop head.
    """
    p = cell_params

    # prenet layers are dense_1..dense_n (models/layers.py::Prenet)
    n_prenet = sum(1 for k in p['decoder_prenet'] if k.startswith('dense_'))
    prenet = tuple(
        (p['decoder_prenet'][f'dense_{i + 1}']['kernel'].astype(dtype),
         p['decoder_prenet'][f'dense_{i + 1}']['bias'])
        for i in range(n_prenet))

    def gru_pack(g):
        if 'wi' in g:                      # fused layout: already packed
            return (g['wi'].astype(dtype), g['bi'], g['wh'].astype(dtype),
                    g['bn'])
        wi = jnp.concatenate([g['ir']['kernel'], g['iz']['kernel'],
                              g['in']['kernel']], axis=1)
        bi = jnp.concatenate([g['ir']['bias'], g['iz']['bias'],
                              g['in']['bias']])
        wh = jnp.concatenate([g['hr']['kernel'], g['hz']['kernel'],
                              g['hn']['kernel']], axis=1)
        return wi.astype(dtype), bi, wh.astype(dtype), g['hn']['bias']

    n_gru = sum(1 for k in p if k.startswith('gru_'))
    grus = tuple(gru_pack(p[f'gru_{i}']) for i in range(n_gru))

    wx = p['rnn_in_proj']['kernel']
    prenet_out = prenet[-1][0].shape[1]
    lsa = p['lsa']
    if 'loc_conv' in lsa:                  # fused layout: conv pre-folded
        loc = lsa['loc_conv']['kernel'][:, 0, :]
        ba = lsa['attention_bias'] + lsa['loc_conv']['bias']
    else:
        loc = fold_location_params(lsa['location_convolution']['kernel'],
                                   lsa['location_layer']['kernel'])
        # the location conv's bias is a constant additive term on the
        # pre-tanh energy: Dense(conv(x) + b_c) == conv'(x) + b_c @ W, so it
        # folds into the attention bias (dropping it would silently shift
        # the energies of a TRAINED checkpoint; zero-init tests can't see it)
        ba = (lsa['attention_bias']
              + lsa['location_convolution']['bias'] @ lsa['location_layer']['kernel'])
    if 'out_projection' in p:              # fused layout: combined head
        if not r:
            raise ValueError('fused cell layout requires r (outputs_per_step)')
        k_out = p['out_projection']['kernel']
        b_out = p['out_projection']['bias']
        rm = b_out.shape[0] - r
        wf, ws = k_out[:, :rm], k_out[:, rm:]
        bf, bs = b_out[:rm], b_out[rm:]
    else:
        wf = p['frame_projection']['kernel']
        ws = p['stop_projection']['kernel']
        bf = p['frame_projection']['bias']
        bs = p['stop_projection']['bias']
    h = grus[0][0].shape[0]

    return FoldedParams(
        prenet=prenet,
        wx_p=wx[:prenet_out].astype(dtype),
        wx_c=wx[prenet_out:].astype(dtype),
        bx=p['rnn_in_proj']['bias'],
        grus=grus,
        wq=lsa['query_layer']['kernel'].astype(dtype),
        loc=loc.astype(jnp.float32),
        v=lsa['attention_variable'].astype(jnp.float32),
        ba=ba,
        wf_r=wf[:h].astype(dtype),
        wf_c=wf[h:].astype(dtype),
        bf=bf,
        ws_r=ws[:h].astype(dtype),
        ws_c=ws[h:].astype(dtype),
        bs=bs,
    )


def _full_specs(shapes, spec):
    # n bound at definition time (late-binding lambdas would all see the
    # last shape in the list)
    return [pl.BlockSpec(s, lambda *_, n=len(s): (0,) * n, **spec)
            for s in shapes]


# ---------------------------------------------------------------------------
# single fully-fused step kernel (A+B in one launch)
# ---------------------------------------------------------------------------
# At serving batch sizes every matmul is tiny, so the decode scan is launch-
# latency bound: 2 pallas launches x steps.  This kernel runs the whole step
# (prenet -> GRU tower -> LSA -> projections -> stop/impute) in ONE launch.


def _read_weight_refs(refs, n_prenet: int, n_gru: int):
    """Materialize the packed weight operand refs (see ``_call_step`` arg
    order) into values.  Returns (weights-tuple, refs consumed)."""
    i = 0
    prenet = tuple((refs[i + 2 * j][:, :], refs[i + 2 * j + 1][0, :])
                   for j in range(n_prenet))
    i += 2 * n_prenet
    wxp, wxc, bx = refs[i][:, :], refs[i + 1][:, :], refs[i + 2][0, :]
    i += 3
    grus = tuple((refs[i + 4 * j][:, :], refs[i + 4 * j + 1][0, :],
                  refs[i + 4 * j + 2][:, :], refs[i + 4 * j + 3][0, :])
                 for j in range(n_gru))
    i += 4 * n_gru
    (wq, loc, v, ba, wfr, wfc, bf, wsr, wsc, bs) = (
        refs[i][:, :], refs[i + 1][:, :], refs[i + 2][:, :], refs[i + 3][0, :],
        refs[i + 4][:, :], refs[i + 5][:, :], refs[i + 6][0, :],
        refs[i + 7][:, :], refs[i + 8][:, :], refs[i + 9][0, :])
    i += 10
    return (prenet, wxp, wxc, bx, grus, wq, loc, v, ba,
            wfr, wfc, bf, wsr, wsc, bs), i


def _step_math(prev, ctx, hs, cum, keys, values, mask, was_fin, weights):
    """One decode step on VALUES (shared by the per-step and whole-decode
    kernels): prenet -> input-feed proj -> residual GRU tower -> LSA ->
    context -> frame/stop projections -> stop/impute selection.

    ``was_fin`` is [B, 1] float; every next-carry output is already
    impute-selected (finished rows hold their previous state).  Returns
    (frames, stop_prob, align, ctx_o, cum_o, prev_o, fin, h_os).
    """
    f32 = jnp.float32
    (prenet, wxp, wxc, bx, grus, wq, loc_m, v, ba,
     wfr, wfc, bf, wsr, wsc, bs) = weights
    bf16 = wxp.dtype

    # ---- prenet + input feeding + gru tower
    act = prev
    for w, bias in prenet:
        act = jnp.maximum(
            jnp.dot(act.astype(bf16), w, preferred_element_type=f32) + bias,
            0.0)
    x = (jnp.dot(act.astype(bf16), wxp, preferred_element_type=f32)
         + jnp.dot(ctx.astype(bf16), wxc, preferred_element_type=f32)
         + bx)

    def gru(x, h, wi, bi, wh, bhn):
        hsz = h.shape[-1]
        gi = jnp.dot(x.astype(bf16), wi, preferred_element_type=f32) + bi
        gh = jnp.dot(h.astype(bf16), wh, preferred_element_type=f32)
        r = jax.nn.sigmoid(gi[:, :hsz] + gh[:, :hsz])
        z = jax.nn.sigmoid(gi[:, hsz:2 * hsz] + gh[:, hsz:2 * hsz])
        n = jnp.tanh(gi[:, 2 * hsz:] + r * (gh[:, 2 * hsz:] + bhn))
        return (1.0 - z) * n + z * h

    h_news = []
    for j, (wi, bi, wh, bhn) in enumerate(grus):
        h_new = gru(x, hs[j], wi, bi, wh, bhn)
        h_news.append(h_new)
        x = h_new + x                                   # ResidualWrapper
    rnn = x

    # ---- LSA + context + projections (kernel B math)
    b, n = cum.shape
    kwin = loc_m.shape[0]
    half = kwin // 2
    q = jnp.dot(rnn.astype(bf16), wq, preferred_element_type=f32)
    a_dim = loc_m.shape[1]
    zpad = jnp.zeros((b, half), f32)
    cum_pad = jnp.concatenate([zpad, cum, zpad], axis=1)
    loc = jnp.zeros((b, n, a_dim), f32)
    for k in range(kwin):
        w_k = cum_pad[:, k:k + n]
        loc = loc + w_k[:, :, None] * loc_m[k, :][None, None, :]

    pre = jnp.tanh(keys + q[:, None, :] + loc + ba)
    e = jnp.dot(pre.reshape(b * n, a_dim), v,
                preferred_element_type=f32).reshape(b, n)
    e = jnp.where(mask > 0, e, -1e30)
    m = jnp.max(e, axis=-1, keepdims=True)
    w = jnp.exp(e - m) * (mask > 0)
    align = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-30)
    ctx_new = jnp.sum(align[:, :, None] * values, axis=1)

    frames = (jnp.dot(rnn.astype(bf16), wfr, preferred_element_type=f32)
              + jnp.dot(ctx_new.astype(bf16), wfc, preferred_element_type=f32)
              + bf)
    stop_logit = (jnp.dot(rnn.astype(bf16), wsr, preferred_element_type=f32)
                  + jnp.dot(ctx_new.astype(bf16), wsc, preferred_element_type=f32)
                  + bs)
    stop_prob = jax.nn.sigmoid(stop_logit)

    newly = jnp.max((stop_prob >= 0.5).astype(f32), axis=-1, keepdims=True)
    fin = jnp.maximum(was_fin, newly)
    n_mel = prev.shape[-1]
    alive = 1.0 - was_fin
    frames = frames * alive
    prev_new = frames[:, -n_mel:]

    ctx_o = jnp.where(was_fin > 0, ctx, ctx_new)
    cum_o = jnp.where(was_fin > 0, cum, cum + align)
    prev_o = jnp.where(was_fin > 0, prev, prev_new)
    h_os = [jnp.where(was_fin > 0, hs[j], h_news[j]) for j in range(len(hs))]
    return frames, stop_prob, align, ctx_o, cum_o, prev_o, fin, h_os


def _make_step_kernel(n_prenet: int, n_gru: int):
    def kernel(*refs):
        i = 0
        prev_ref, ctx_ref = refs[i], refs[i + 1]
        i += 2
        h_refs = refs[i:i + n_gru]
        i += n_gru
        cum_ref, keys_ref, values_ref, mask_ref, finished_ref = refs[i:i + 5]
        i += 5
        weights, n_w = _read_weight_refs(refs[i:], n_prenet, n_gru)
        i += n_w
        frames_ref, stop_ref, align_ref, ctxo_ref, cumo_ref, prevo_ref, \
            fin_ref = refs[i:i + 7]
        ho_refs = refs[i + 7:i + 7 + n_gru]

        frames, stop_prob, align, ctx_o, cum_o, prev_o, fin, h_os = \
            _step_math(prev_ref[:, :], ctx_ref[:, :],
                       [h[:, :] for h in h_refs], cum_ref[:, :],
                       keys_ref[:, :, :], values_ref[:, :, :],
                       mask_ref[:, :], finished_ref[:, :], weights)

        frames_ref[:, :] = frames
        stop_ref[:, :] = stop_prob
        align_ref[:, :] = align
        ctxo_ref[:, :] = ctx_o
        cumo_ref[:, :] = cum_o
        prevo_ref[:, :] = prev_o
        fin_ref[:, :] = fin
        for j in range(n_gru):
            ho_refs[j][:, :] = h_os[j]

    return kernel


def _call_step(fp: FoldedParams, prev, ctx, hs, cum, keys, values, mask,
               finished, interpret: bool):
    b, n = cum.shape
    h = hs[0].shape[-1]
    n_gru = len(hs)
    d = values.shape[-1]
    rm = fp.bf.shape[0]
    r = fp.bs.shape[0]
    n_mel = prev.shape[-1]
    spec = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    args = (prev, ctx, *hs, cum, keys, values, mask, finished)
    for w, bias in fp.prenet:
        args += (w, bias[None, :])
    args += (fp.wx_p, fp.wx_c, fp.bx[None, :])
    for wi, bi, wh, bhn in fp.grus:
        args += (wi, bi[None, :], wh, bhn[None, :])
    args += (fp.wq, fp.loc, fp.v, fp.ba[None, :],
             fp.wf_r, fp.wf_c, fp.bf[None, :], fp.ws_r, fp.ws_c, fp.bs[None, :])
    outs = [(b, rm), (b, r), (b, n), (b, d), (b, n), (b, n_mel), (b, 1)] \
        + [(b, h)] * n_gru
    res = pl.pallas_call(
        _make_step_kernel(len(fp.prenet), n_gru),
        in_specs=_full_specs([a.shape for a in args], spec),
        out_specs=_full_specs(outs, spec),
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in outs],
        interpret=interpret,
    )(*args)
    return res[:7], tuple(res[7:])


# ---------------------------------------------------------------------------
# scan driver
# ---------------------------------------------------------------------------

def fused_decode(cell_params: Dict[str, Any], cfg: Config,
                 keys: jnp.ndarray, values: jnp.ndarray, mask: jnp.ndarray,
                 steps: int, interpret: bool = False,
                 dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Run the full AR inference decode with the fused kernels.

    Returns mel frames [B, steps*r, M], stop probs, alignments [B, N, steps],
    out_lengths [B] -- matching ``Tacotron.__call__(train=False)``'s decoder
    outputs (posnet applies outside).
    """
    hp = cfg.acoustic
    au = cfg.audio
    b, n = mask.shape
    fp = fold_params(cell_params, dtype=dtype, r=hp.outputs_per_step)

    def step(carry, _):
        hs, ctx, cum, prev, fin = carry
        (frames, stop, align, ctx_n, cum_n, prev_n, fin_n), hs_new = \
            _call_step(fp, prev, ctx, hs, cum, keys, values, mask, fin,
                       interpret)
        new_carry = (hs_new, ctx_n, cum_n, prev_n, fin_n)
        return new_carry, {'frames': frames, 'stop': stop, 'align': align,
                           'finished': fin_n[:, 0] > 0.5}

    carry0 = (tuple(jnp.zeros((b, hp.decoder_depth))
                    for _ in range(len(fp.grus))),
              jnp.zeros((b, hp.encoder_depth)), jnp.zeros((b, n)),
              jnp.zeros((b, au.n_mel)), jnp.zeros((b, 1)))
    _, ys = jax.lax.scan(step, carry0, None, length=steps)

    r = hp.outputs_per_step
    frames = ys['frames']                       # [T, B, r*M]
    mel = frames.transpose(1, 0, 2).reshape(b, steps * r, au.n_mel)
    stop = ys['stop'].transpose(1, 0, 2).reshape(b, steps * r)
    align = ys['align'].transpose(1, 2, 0)      # [B, N, T]
    finished = ys['finished']                   # [T, B]
    fin_any = jnp.any(finished, axis=0)
    first = jnp.argmax(finished, axis=0)
    n_steps = jnp.where(fin_any, first + 1, steps)
    return {'mel_outputs': mel, 'stop_token_outputs': stop,
            'alignments': align, 'out_lengths': n_steps * r}


# ---------------------------------------------------------------------------
# whole-decode single-launch kernel
# ---------------------------------------------------------------------------
# The per-step kernel above still pays one pallas launch per decode step
# (~17 ms for an 80-step batch-1 decode on v5e -- launch latency, not
# compute).  TPU pallas executes a 1-D grid SEQUENTIALLY on one core and
# scratch buffers persist across grid steps, so the entire AR loop can run
# inside ONE launch: grid=(steps,), the decoder carry (GRU states, context,
# cumulative alignments, prev frame, finished flag) lives in VMEM scratch,
# weights and encoder memory stay VMEM-resident across all steps (their
# BlockSpec index maps are constant, so pallas fetches them once), and each
# grid step writes its emissions to the t-th output block.
#
# VMEM budget at default geometry (H=512, A=128, D=256, M=80, r=5, bf16
# weights ~7.3 MB): batch 1 and text N<=512 fit comfortably in 16 MB; the
# driver asserts an estimate and callers fall back to ``fused_decode`` for
# oversized shapes.

def _make_full_kernel(n_prenet: int, n_gru: int, early_exit: bool,
                      block: int):
    """Kernel factory: ``block`` decode steps per grid iteration.

    Blocking matters because a skipped-or-run grid iteration has a fixed
    cost (sequencing + the emission-block DMAs, measured ~7 us) that an
    unblocked early exit cannot beat: at block=1, skipping 220 of 300 steps
    saved only ~25%.  With K steps per iteration the fixed cost amortizes
    K-fold and the skip granularity is K steps.
    """
    def kernel(*refs):
        i = 0
        keys_ref, values_ref, mask_ref = refs[i:i + 3]
        i += 3
        weights, n_w = _read_weight_refs(refs[i:], n_prenet, n_gru)
        i += n_w
        frames_ref, stop_ref, align_ref, fin_out_ref = refs[i:i + 4]
        i += 4
        h_refs = refs[i:i + n_gru]
        ctx_ref, cum_ref, prev_ref, fin_ref = refs[i + n_gru:i + n_gru + 4]

        t = pl.program_id(0)
        b = cum_ref.shape[0]

        @pl.when(t == 0)
        def _init():
            for h in h_refs:
                h[:, :] = jnp.zeros(h.shape, h.dtype)
            ctx_ref[:, :] = jnp.zeros(ctx_ref.shape, ctx_ref.dtype)
            cum_ref[:, :] = jnp.zeros(cum_ref.shape, cum_ref.dtype)
            prev_ref[:, :] = jnp.zeros(prev_ref.shape, prev_ref.dtype)
            fin_ref[:, :] = jnp.zeros(fin_ref.shape, fin_ref.dtype)

        if not early_exit:
            prev, ctx = prev_ref[:, :], ctx_ref[:, :]
            hs = [h[:, :] for h in h_refs]
            cum, fin = cum_ref[:, :], fin_ref[:, :]
            keys, values, mask = (keys_ref[:, :, :], values_ref[:, :, :],
                                  mask_ref[:, :])
            for j in range(block):
                frames, stop_prob, align, ctx, cum, prev, fin, hs = \
                    _step_math(prev, ctx, hs, cum, keys, values, mask, fin,
                               weights)
                frames_ref[j, :, :] = frames
                stop_ref[j, :, :] = stop_prob
                align_ref[j, :, :] = align
                fin_out_ref[j, :, :] = fin
            ctx_ref[:, :] = ctx
            cum_ref[:, :] = cum
            prev_ref[:, :] = prev
            fin_ref[:, :] = fin
            for j in range(n_gru):
                h_refs[j][:, :] = hs[j]
            return

        # early exit: once every batch row has stopped, the remaining grid
        # iterations skip the step math entirely (outputs past the stop
        # token are trimmed by callers; mel frames are impute-zeroed like
        # the scan).  A lax.scan cannot do this -- fixed trip count, no
        # cross-step branch -- which is the one structural advantage of
        # holding the decode loop inside a single stateful kernel.
        #
        # The branches emit into VMEM scratch, and the OUTPUT-block writes
        # happen unconditionally afterwards: output writes under a
        # conditional defeat Mosaic's output windowing (it falls back to
        # materializing the full [steps, ...] outputs in VMEM -- measured
        # 23.7 MB scoped for a 300-step decode, an OOM).
        ef_ref, es_ref, ea_ref, efin_ref = refs[i + n_gru + 4:i + n_gru + 8]
        run = jnp.sum(fin_ref[:, :]) < b

        @pl.when(run)
        def _body():
            prev, ctx = prev_ref[:, :], ctx_ref[:, :]
            hs = [h[:, :] for h in h_refs]
            cum, fin = cum_ref[:, :], fin_ref[:, :]
            keys, values, mask = (keys_ref[:, :, :], values_ref[:, :, :],
                                  mask_ref[:, :])
            for j in range(block):
                frames, stop_prob, align, ctx, cum, prev, fin, hs = \
                    _step_math(prev, ctx, hs, cum, keys, values, mask, fin,
                               weights)
                ef_ref[j, :, :] = frames
                es_ref[j, :, :] = stop_prob
                ea_ref[j, :, :] = align
                efin_ref[j, :, :] = fin
            ctx_ref[:, :] = ctx
            cum_ref[:, :] = cum
            prev_ref[:, :] = prev
            fin_ref[:, :] = fin
            for j in range(n_gru):
                h_refs[j][:, :] = hs[j]

        @pl.when(jnp.logical_not(run))
        def _skip():
            f32 = jnp.float32
            ef_ref[:, :, :] = jnp.zeros(ef_ref.shape, f32)
            es_ref[:, :, :] = jnp.zeros(es_ref.shape, f32)
            ea_ref[:, :, :] = jnp.zeros(ea_ref.shape, f32)
            efin_ref[:, :, :] = jnp.ones(efin_ref.shape, f32)

        frames_ref[:, :, :] = ef_ref[:, :, :]
        stop_ref[:, :, :] = es_ref[:, :, :]
        align_ref[:, :, :] = ea_ref[:, :, :]
        fin_out_ref[:, :, :] = efin_ref[:, :, :]

    return kernel


# resident-footprint ceiling for the whole-decode kernel; shapes estimated
# above this fall back to the per-step kernel (tests monkeypatch this to 0
# to pin the fallback path)
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_estimate_bytes(fp: FoldedParams, b: int, n: int, d: int) -> int:
    """Rough VMEM footprint of the whole-decode kernel: resident weights +
    encoder memory + the [B, N, A] attention intermediates (x2 for
    double-buffering slack)."""
    weights = sum(int(x.size) * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(fp))
    a_dim = fp.loc.shape[1]
    memory = b * n * (a_dim + d) * 4
    interm = 2 * b * n * a_dim * 4
    return weights + memory + interm


def fused_decode_full(cell_params: Dict[str, Any], cfg: Config,
                      keys: jnp.ndarray, values: jnp.ndarray,
                      mask: jnp.ndarray, steps: int, interpret: bool = False,
                      dtype=jnp.bfloat16,
                      early_exit: bool = False) -> Dict[str, jnp.ndarray]:
    """Whole AR decode in ONE pallas launch (drop-in for ``fused_decode``).

    Same contract as ``fused_decode`` (reference semantics:
    ``transtacos/custom_decoder.py:44-59`` stop-any-of-r + impute_finished,
    ``tacotron.py:116-129``): the scan-of-launches becomes a sequential
    pallas grid with the carry in VMEM scratch.  Measured device-throughput
    is the same as the per-step kernel (XLA already amortizes in-program
    launches -- docs/PERF_NOTES.md); the reason this kernel exists is
    ``early_exit=True``, which skips the step math for every grid step after
    ALL batch rows have stopped -- serving decodes run a fixed
    ``max_iters`` but utterances typically stop in the first third, and a
    ``lax.scan`` has no way to skip the tail.  With early exit, emissions
    PAST the all-finished step are zeros (mel frames already were, by
    impute semantics); callers trim by ``out_lengths``, so the served
    output is unchanged.
    """
    hp = cfg.acoustic
    au = cfg.audio
    b, n = mask.shape
    d = values.shape[-1]
    fp = fold_params(cell_params, dtype=dtype, r=hp.outputs_per_step)
    n_gru = len(fp.grus)
    h = hp.decoder_depth
    rm = fp.bf.shape[0]
    r = fp.bs.shape[0]
    n_mel = au.n_mel

    if _vmem_estimate_bytes(fp, b, n, d) > _VMEM_BUDGET_BYTES:
        # shapes too big to hold the decode resident: per-step kernel path
        return fused_decode(cell_params, cfg, keys, values, mask, steps,
                            interpret=interpret, dtype=dtype)
    del cell_params  # folded above

    # steps per grid iteration: largest candidate dividing ``steps`` (the
    # emission blocks per iteration are [K, B, .] slabs, so K must tile the
    # step count exactly)
    block = next(k for k in (10, 8, 6, 5, 4, 3, 2, 1) if steps % k == 0)

    args = (keys, values, mask)
    for w, bias in fp.prenet:
        args += (w, bias[None, :])
    args += (fp.wx_p, fp.wx_c, fp.bx[None, :])
    for wi, bi, wh, bhn in fp.grus:
        args += (wi, bi[None, :], wh, bhn[None, :])
    args += (fp.wq, fp.loc, fp.v, fp.ba[None, :],
             fp.wf_r, fp.wf_c, fp.bf[None, :], fp.ws_r, fp.ws_c, fp.bs[None, :])

    # inputs: whole-array VMEM residents.  A blocked spec (even with a
    # constant index map) gets DOUBLE-buffered for grid pipelining, which
    # blows the 16 MB VMEM budget with ~7.5 MB of weights; a memory_space
    # -only spec allocates them once for the whole launch.
    if _VMEM is not None and not interpret:
        in_specs = [pl.BlockSpec(memory_space=_VMEM) for _ in args]
    else:
        in_specs = [pl.BlockSpec(a.shape, lambda t, nd=len(a.shape): (0,) * nd)
                    for a in args]
    out_shapes = [(steps, b, rm), (steps, b, r), (steps, b, n), (steps, b, 1)]
    out_specs = [pl.BlockSpec((block,) + s[1:], lambda t: (t, 0, 0))
                 for s in out_shapes]
    scratch = [pltpu.VMEM((b, h), jnp.float32) for _ in range(n_gru)] + [
        pltpu.VMEM((b, d), jnp.float32),       # context
        pltpu.VMEM((b, n), jnp.float32),       # cumulative alignments
        pltpu.VMEM((b, n_mel), jnp.float32),   # prev frame
        pltpu.VMEM((b, 1), jnp.float32),       # finished
    ]
    if early_exit:
        # per-iteration emission staging (see _make_full_kernel: output
        # blocks must be written unconditionally to keep Mosaic windowing)
        scratch += [pltpu.VMEM((block, b, rm), jnp.float32),
                    pltpu.VMEM((block, b, r), jnp.float32),
                    pltpu.VMEM((block, b, n), jnp.float32),
                    pltpu.VMEM((block, b, 1), jnp.float32)]
    kwargs = {}
    if pltpu is not None and not interpret:
        # Mosaic's scoped-vmem accountant over-charges this kernel past the
        # 16 MB default even though the live set (weights + memory + carry
        # + emission scratch, ~9 MB) fits: conditional bodies are charged
        # per-branch (early_exit), and the bf16 path is charged for both
        # the bf16 weights and their f32 operand copies (20.5 MB scoped at
        # DEFAULT dims).  Raise the scoped limit to the physical headroom
        # instead of restructuring the kernel around the accountant.
        kwargs['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    frames, stop, align, fin = pl.pallas_call(
        _make_full_kernel(len(fp.prenet), n_gru, early_exit, block),
        grid=(steps // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in out_shapes],
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*args)

    mel = frames.transpose(1, 0, 2).reshape(b, steps * (rm // n_mel), n_mel)
    stop_o = stop.transpose(1, 0, 2).reshape(b, steps * r)
    align_o = align.transpose(1, 2, 0)          # [B, N, T]
    finished = fin[:, :, 0] > 0.5               # [T, B]
    fin_any = jnp.any(finished, axis=0)
    first = jnp.argmax(finished, axis=0)
    n_steps = jnp.where(fin_any, first + 1, steps)
    return {'mel_outputs': mel, 'stop_token_outputs': stop_o,
            'alignments': align_o, 'out_lengths': n_steps * r}
