"""Import a trained reference RetuneGAN checkpoint into this framework.

The reference saves torch checkpoints as ``g_<step:08d>`` (generator only,
``{'generator': state_dict}``) and ``do_<step:08d>`` (msd/mpd/mtd +
optimizer states), written at ``retunegan/train.py:214-224`` and loaded at
``retunegan/train.py:63-88``.  This tool converts them to this repo's orbax
layout (``train/checkpoint.py::save_gan``) so reference users can carry a
trained vocoder over instead of retraining:

    python -m transtacos_retunegan_tpu.tools.import_reference_ckpt \
        --g /path/to/g_00400000 [--do /path/to/do_00400000] \
        --out runs/imported [--ver RefineGAN_small]

* ``--g`` alone is enough for serving: ``Synthesizer`` /
  ``restore_generator_params`` load the newest ``g_*`` from the run dir.
* ``--do`` additionally converts the three discriminators so fine-tuning can
  resume.  Optimizer *moments* are NOT carried over (torch Adam state does
  not map onto optax's pytree layout); the converted ``do_`` stores freshly
  initialized optimizer states, so the first post-import steps behave like an
  optimizer restart at the checkpoint's step count.

Numerical fidelity of the conversion itself is pinned by
``tests/test_torch_parity.py`` (transplanted weights produce outputs equal to
the torch modules within f32 tolerance).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from transtacos_retunegan_tpu import interop
from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.train import checkpoint as ckpt


def _as_jax(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), tree)


def import_run(g_path: str, out_dir: str, ver: str = 'RefineGAN_small',
               do_path: str | None = None, cfg: Config | None = None) -> str:
    """Convert ``g_path`` (and optionally ``do_path``) into ``out_dir``.

    Returns the orbax ``g_*`` path written.  The step is taken from the
    source filename (``g_<step>``) when parseable, else from the ``do_``
    checkpoint's recorded step, else 0.
    """
    import torch

    cfg = cfg or Config()
    os.makedirs(out_dir, exist_ok=True)

    g_ckpt = torch.load(g_path, map_location='cpu', weights_only=False)
    gen_params = _as_jax(
        interop.import_generator_state_dict(g_ckpt['generator'], ver))

    base = os.path.basename(g_path)
    try:
        step = int(base.split('_')[-1])
    except ValueError:
        step = 0

    do_tree = None
    if do_path is not None:
        do = interop.import_do_checkpoint(do_path, cfg)
        step = step or do['steps']
        disc_params = _as_jax(
            {'msd': do['msd'], 'mpd': do['mpd'], 'mtd': do['mtd']})
        from transtacos_retunegan_tpu.train.vocoder_step import make_optimizers
        gopt, dopt = make_optimizers(cfg, steps_per_epoch=568)
        do_tree = {
            'disc_params': disc_params,
            'gen_opt': gopt.init(gen_params),
            'disc_opt': dopt.init(disc_params),
            'step': jnp.asarray(step, jnp.int32),
            'epoch': do['epoch'],
        }

    g_out = os.path.join(out_dir, f'g_{step:08d}')
    ckpt.save_tree(g_out, {'generator': gen_params})
    if do_tree is not None:
        ckpt.save_tree(os.path.join(out_dir, f'do_{step:08d}'), do_tree)

    # freeze the config like a native training run so serve/resume find it
    cfg_json = os.path.join(out_dir, 'config.json')
    if not os.path.exists(cfg_json):
        cfg.save(cfg_json)
    return g_out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--g', required=True, help='reference g_<step> torch file')
    ap.add_argument('--do', dest='do_path', default=None,
                    help='reference do_<step> torch file (optional)')
    ap.add_argument('--out', required=True, help='output run dir (orbax)')
    ap.add_argument('--ver', default='RefineGAN_small',
                    help=f'generator version; mapped: '
                         f'{sorted(interop.GENERATOR_MAPS)}')
    args = ap.parse_args(argv)
    g_out = import_run(args.g, args.out, args.ver, args.do_path)
    print(f'wrote {g_out}')


if __name__ == '__main__':
    main()
