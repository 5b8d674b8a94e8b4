"""On-device pallas decoder equivalence artifact.

Round-3 verdict weak item 7: the fused/whole-decode kernels were
equivalence-tested only in interpret mode on CPU (``tests/test_fused_decoder
.py``); on real TPU they were exercised only for throughput.  Mosaic may
compile a kernel differently than the interpreter executes it, so this
script runs all four decode paths ON THE CURRENT DEVICE with shared params
at DEFAULT model dims and records max |Δ| per output into a committed JSON:

  * flax ``nn.scan`` cell (the training/reference-semantics baseline,
    ``transtacos/custom_decoder.py:44-59``, ``tacotron.py:116-129``)
  * ``ops.fused_decoder.fused_decode``      (per-step pallas launch)
  * ``ops.fused_decoder.fused_decode_full`` (single-launch, early_exit off)
  * ``ops.fused_decoder.fused_decode_full`` (early_exit on; emissions past
    the all-finished step are zeros by contract, so comparison trims to
    ``out_lengths``)

All fused paths run at f32 so any disagreement is kernel semantics, not
precision; a bf16 row is recorded for context.  Exits non-zero if any f32
delta exceeds --atol, so CI/verify runs double as an assertion.

Usage (TPU; ~4 fresh compiles, budget 15+ min cold):
  python -m transtacos_retunegan_tpu.tools.pallas_equivalence \
      [--out docs/pallas_equivalence.json] [--steps 40] [--atol 2e-4]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import decoder as dec
from ..ops import fused_decoder as F

# persistent executable cache (compiles through the tunnel are minutes each)
_CACHE = os.path.join(os.getcwd(), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def run_flax(cfg, params, attn, steps, b):
    cell = dec.make_scanned_cell(cfg, 'infer')
    carry = dec.init_carry(b, attn.mask.shape[1], cfg)
    xs = {'target_prev': jnp.zeros((steps, b, cfg.audio.n_mel))}
    (carry, _, _), ys = cell.apply({'params': params},
                                   (carry, attn, jnp.asarray(0.0)), xs)
    r = cfg.acoustic.outputs_per_step
    mel = ys['frames'].transpose(1, 0, 2).reshape(b, steps * r,
                                                  cfg.audio.n_mel)
    stop = ys['stop'].transpose(1, 0, 2).reshape(b, steps * r)
    align = ys['alignments'].transpose(1, 2, 0)
    fin = np.asarray(ys['finished'])
    fin_any = fin.any(axis=0)
    first = fin.argmax(axis=0)
    out_lengths = np.where(fin_any, first + 1, steps) * r
    return {'mel_outputs': np.asarray(mel),
            'stop_token_outputs': np.asarray(stop),
            'alignments': np.asarray(align), 'out_lengths': out_lengths}


def deltas(ref, out, trim_frames=None, trim_steps=None):
    """max |Δ| per output vs the flax baseline; optionally trimmed to the
    valid region (early-exit zeros everything past the all-finished step)."""
    d = {}
    for k in ('mel_outputs', 'stop_token_outputs'):
        a, b_ = ref[k], np.asarray(out[k])
        if trim_frames is not None:
            a, b_ = a[:, :trim_frames], b_[:, :trim_frames]
        d[k] = float(np.abs(a - b_).max())
    a, b_ = ref['alignments'], np.asarray(out['alignments'])
    if trim_steps is not None:
        a, b_ = a[:, :, :trim_steps], b_[:, :, :trim_steps]
    d['alignments'] = float(np.abs(a - b_).max())
    d['out_lengths_equal'] = bool(
        (ref['out_lengths'] == np.asarray(out['out_lengths'])).all())
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='docs/pallas_equivalence.json')
    p.add_argument('--steps', type=int, default=40)
    p.add_argument('--batch', type=int, default=1,
                   help='serving geometry (batch 1) by default')
    p.add_argument('--n_text', type=int, default=80)
    p.add_argument('--atol', type=float, default=2e-4)
    p.add_argument('--interpret', action='store_true', default=False,
                   help='pallas interpret mode (CPU smoke of this script; '
                        'the committed artifact must come from a real TPU '
                        'run, interpret=False)')
    p.add_argument('--ckpt', default=None,
                   help='acoustic run dir: use the latest checkpoint\'s '
                        'TRAINED decoder_cell params instead of random init '
                        '(trained biases are nonzero, so this also proves '
                        'the fold_params bias handling on-device)')
    args = p.parse_args()

    cfg = Config()                                  # DEFAULT dims
    b, n, steps = args.batch, args.n_text, args.steps
    r_ = np.random.RandomState(0)
    keys = jnp.asarray(r_.randn(b, n, cfg.acoustic.attention_depth)
                       .astype(np.float32) * 0.3)
    values = jnp.asarray(r_.randn(b, n, cfg.acoustic.encoder_depth)
                         .astype(np.float32) * 0.3)
    lens = np.full((b,), n); lens[1:] = n - 7
    mask = jnp.asarray((np.arange(n)[None, :] < lens[:, None])
                       .astype(np.float32))
    attn = dec.AttentionParams(keys, values * mask[..., None], mask)

    cell = dec.make_scanned_cell(cfg, 'infer')
    carry = dec.init_carry(b, n, cfg)
    xs = {'target_prev': jnp.zeros((steps, b, cfg.audio.n_mel))}
    params = cell.init({'params': jax.random.PRNGKey(0)},
                       (carry, attn, jnp.asarray(0.0)), xs)['params']
    params_from = 'random init'
    if args.ckpt:
        from ..train import checkpoint as ckpt
        path = ckpt.scan_checkpoint(args.ckpt, 'ckpt_')
        if path is None:
            raise SystemExit(f'no ckpt_* under {args.ckpt}')
        tree = ckpt.restore_tree_np(path)
        params = jax.tree.map(jnp.asarray, tree['params']['decoder_cell'])
        params_from = path

    print(f'# device: {jax.devices()[0]}', flush=True)
    ref = run_flax(cfg, params, attn, steps, b)
    print('# flax scan done', flush=True)

    runs = {}
    fused32 = F.fused_decode(params, cfg, keys, attn.values, mask, steps,
                             dtype=jnp.float32, interpret=args.interpret)
    runs['fused_per_step_f32'] = deltas(ref, fused32)
    print('# fused_decode f32 done', flush=True)

    full32 = F.fused_decode_full(params, cfg, keys, attn.values, mask, steps,
                                 dtype=jnp.float32, early_exit=False,
                                 interpret=args.interpret)
    runs['fused_full_f32'] = deltas(ref, full32)
    print('# fused_decode_full f32 done', flush=True)

    ee32 = F.fused_decode_full(params, cfg, keys, attn.values, mask, steps,
                               dtype=jnp.float32, early_exit=True,
                               interpret=args.interpret)
    # early-exit zeroes emissions past the all-finished step: compare the
    # region the serving layer actually consumes (trim by out_lengths)
    t_valid = int(np.asarray(ee32['out_lengths']).max())
    runs['fused_full_early_exit_f32'] = deltas(
        ref, ee32, trim_frames=t_valid,
        trim_steps=t_valid // cfg.acoustic.outputs_per_step)
    runs['fused_full_early_exit_f32']['trimmed_to_frames'] = t_valid
    print('# fused_decode_full early_exit done', flush=True)

    fullbf = F.fused_decode_full(params, cfg, keys, attn.values, mask, steps,
                                 dtype=jnp.bfloat16, early_exit=False,
                                 interpret=args.interpret)
    runs['fused_full_bf16_vs_f32_scan'] = deltas(ref, fullbf)
    print('# bf16 context row done', flush=True)

    result = {
        'device': str(jax.devices()[0]),
        'platform': jax.devices()[0].platform,
        'interpret': args.interpret,
        'params_from': params_from,
        'config': 'DEFAULT dims',
        'shapes': {'batch': b, 'n_text': n, 'steps': steps,
                   'frames': steps * cfg.acoustic.outputs_per_step},
        'atol_f32': args.atol,
        'runs': runs,
    }
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))

    bad = []
    for tag in ('fused_per_step_f32', 'fused_full_f32',
                'fused_full_early_exit_f32'):
        d = runs[tag]
        for k in ('mel_outputs', 'stop_token_outputs', 'alignments'):
            if d[k] > args.atol:
                bad.append(f'{tag}.{k}={d[k]:g}')
        if not d['out_lengths_equal']:
            bad.append(f'{tag}.out_lengths differ')
    if bad:
        raise SystemExit('equivalence FAILED: ' + ', '.join(bad))
    print('# all f32 paths within atol', flush=True)


if __name__ == '__main__':
    main()
