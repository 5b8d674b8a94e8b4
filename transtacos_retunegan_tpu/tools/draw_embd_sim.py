"""Embedding cosine-similarity heatmaps from an acoustic checkpoint.

Capability rebuild of ``img/draw_embd_sim.py``: loads the newest acoustic
checkpoint, computes pairwise cosine similarity of the phone/tone/prosody
embedding tables and writes labeled heatmap PNGs.

Usage:
  python -m transtacos_retunegan_tpu.tools.draw_embd_sim \
      --run_dir runs/acoustic --out_dir img/
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ..config import Config  # noqa: E402
from ..text.symbols import get_table  # noqa: E402
from ..train import checkpoint as ckpt  # noqa: E402
from ..train.acoustic_step import init_state  # noqa: E402


def cosine_sim(e: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(e, axis=-1, keepdims=True)
    return (e @ e.T) / (n @ n.T + 1e-8)


def draw(sim: np.ndarray, labels, path: str, title: str):
    fig, ax = plt.subplots(figsize=(10, 9))
    im = ax.imshow(sim, cmap='coolwarm', vmin=-1, vmax=1)
    fig.colorbar(im, ax=ax)
    if labels is not None and len(labels) <= 64:
        ax.set_xticks(range(len(labels)))
        ax.set_yticks(range(len(labels)))
        ax.set_xticklabels(labels, rotation=90, fontsize=6)
        ax.set_yticklabels(labels, fontsize=6)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--run_dir', required=True)
    p.add_argument('--out_dir', default='img')
    args = p.parse_args()
    cfg_path = os.path.join(args.run_dir, 'config.json')
    cfg = Config.load(cfg_path) if os.path.exists(cfg_path) else Config()
    os.makedirs(args.out_dir, exist_ok=True)

    r = cfg.acoustic.outputs_per_step
    dummy = {
        'text': jnp.zeros((1, 8, 2), jnp.int32),
        'text_lengths': jnp.asarray([8]),
        'prds': jnp.zeros((1, 8), jnp.int32),
        'spec_lengths': jnp.asarray([4 * r]),
        'mel_targets': jnp.zeros((1, 4 * r, cfg.audio.n_mel)),
        'f0_targets': jnp.zeros((1, 4 * r), jnp.int32),
        'c0_targets': jnp.zeros((1, 4 * r), jnp.int32),
    }
    state = init_state(cfg, jax.random.PRNGKey(0), dummy)
    restored = ckpt.restore_acoustic(args.run_dir, state)
    if restored is not None:
        state = restored
    params = state.params

    table = get_table(cfg.acoustic.g2p)
    draw(cosine_sim(np.asarray(params['E_text'])), table.symbols,
         os.path.join(args.out_dir, 'E_text_sim.png'), 'phone embedding cos-sim')
    if 'E_tone' in params:
        draw(cosine_sim(np.asarray(params['E_tone'])), list('012345'),
             os.path.join(args.out_dir, 'E_tone_sim.png'), 'tone embedding cos-sim')
        draw(cosine_sim(np.asarray(params['E_prds'])), list('012345'),
             os.path.join(args.out_dir, 'E_prds_sim.png'), 'prosody embedding cos-sim')
    print(f'wrote heatmaps to {args.out_dir}')


if __name__ == '__main__':
    main()
