"""Convert a stock-layout acoustic run to the fused (fast_cell) layout.

``models/decoder_fast.py`` trains/serves the decoder with fused parameter
blocks (GRU gate matmuls concatenated, location conv+dense folded, combined
frame|stop head) — same math, fewer kernels per scan step.  This converts an
existing STOCK run directory into a fast_cell run directory:

* params: ``fuse_cell_params`` (exact; see the decoder_fast docstring)
* Adam moments (mu/nu): converted with the SAME mapping where it is a pure
  element re-arrangement (GRU blocks, combined head — Adam is element-wise,
  so re-arranged moments stay exact) and RESET TO ZERO for the folded
  location block (the fold is a linear contraction, not a re-arrangement;
  moments of folded params are not derivable — a zero-init transient on two
  small tensors)
* the frozen ``config.json`` is rewritten with ``fast_cell: true`` so every
  downstream consumer (train resume, eval, serving) builds the fast model

The reverse direction is not provided: the fold REDUCES parameters
([31,1,32]x[32,128] -> [31,1,128]), so fast checkpoints don't map back.
Serving needs no conversion at all — ``ops.fused_decoder.fold_params``
consumes both layouts directly.

Usage:
  python -m transtacos_retunegan_tpu.tools.convert_acoustic_cell \
      --run_dir <stock acoustic run> --out_dir <new fast run>
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.decoder_fast import fuse_cell_params
from ..train import checkpoint as ckpt


def convert_tree(tree: dict) -> dict:
    """Convert one restored acoustic checkpoint tree (params + moments)."""
    def conv_cell(cell, zero_loc: bool):
        fused = fuse_cell_params(cell)
        if zero_loc:
            fused['lsa']['loc_conv'] = jax.tree.map(jnp.zeros_like,
                                                    fused['lsa']['loc_conv'])
        return fused

    out = dict(tree)
    params = dict(tree['params'])
    params['decoder_cell'] = conv_cell(params['decoder_cell'], zero_loc=False)
    out['params'] = params

    opt = list(tree['opt_state'])
    adam = dict(opt[1])                     # [clip, scale_by_adam, lr]
    for m in ('mu', 'nu'):
        mom = dict(adam[m])
        mom['decoder_cell'] = conv_cell(mom['decoder_cell'], zero_loc=True)
        adam[m] = mom
    opt[1] = adam
    out['opt_state'] = opt
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--run_dir', required=True)
    p.add_argument('--out_dir', required=True)
    args = p.parse_args()

    path = ckpt.scan_checkpoint(args.run_dir, 'ckpt_')
    if path is None:
        raise SystemExit(f'no ckpt_* under {args.run_dir}')
    tree = ckpt.restore_tree_np(path)
    cell = tree['params']['decoder_cell']
    if 'out_projection' in cell:
        raise SystemExit(f'{path} is already fast_cell layout')

    cfg = Config.load(args.run_dir)
    if cfg.acoustic.fast_cell:
        raise SystemExit(f'{args.run_dir}/config.json already fast_cell')
    new_cfg = dataclasses.replace(
        cfg, acoustic=dataclasses.replace(cfg.acoustic, fast_cell=True))

    new_tree = convert_tree(tree)
    step = int(np.asarray(tree['step']))
    os.makedirs(args.out_dir, exist_ok=True)
    new_cfg.save(args.out_dir)
    out_path = os.path.join(args.out_dir, f'ckpt_{step:08d}')
    ckpt.save_tree(out_path, new_tree)
    n_old = sum(x.size for x in jax.tree.leaves(tree['params']))
    n_new = sum(int(np.asarray(x).size)
                for x in jax.tree.leaves(new_tree['params']))
    print(f'# {path} (step {step}, {n_old:,} params)')
    print(f'# -> {out_path} ({n_new:,} params, fast_cell layout)')


if __name__ == '__main__':
    main()
