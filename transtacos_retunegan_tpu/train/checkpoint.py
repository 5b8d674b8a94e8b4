"""Orbax checkpointing with the reference's layout semantics.

* acoustic: single ``ckpt_<step>`` trees, ``max_to_keep=1``
  (reference ``transtacos/train.py:65,97-99``).
* vocoder: two trees per save -- ``g_<step:08d>`` (generator params only,
  what inference loads) and ``do_<step:08d>`` (discriminators + both
  optimizer states + step + epoch) -- reference ``retunegan/train.py:263-273``.
* ``scan_checkpoint`` finds the newest by sorted prefix match
  (reference ``retunegan/utils.py:78-81``).
* the run dir always carries a frozen ``config.json``
  (reference copies hparam.py, ``retunegan/train.py:37``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

# one long-lived checkpointer: StandardCheckpointer saves asynchronously, so
# per-call instances get garbage-collected mid-commit ("cannot schedule new
# futures after shutdown") and leave .orbax-checkpoint-tmp dirs behind
_CKPT: Optional[ocp.Checkpointer] = None


def _checkpointer() -> ocp.Checkpointer:
    global _CKPT
    if _CKPT is None:
        _CKPT = ocp.StandardCheckpointer()
    return _CKPT


def save_tree(path: str, tree: Any) -> None:
    c = _checkpointer()
    c.save(os.path.abspath(path), tree, force=True)
    c.wait_until_finished()


def restore_tree(path: str, template: Optional[Any] = None) -> Any:
    if template is not None:
        return _checkpointer().restore(os.path.abspath(path), target=template)
    return _checkpointer().restore(os.path.abspath(path))


def restore_tree_np(path: str) -> Any:
    """Restore a checkpoint as host numpy arrays, no template needed.

    A template-less ``restore_tree`` re-creates the arrays on the devices
    they were SAVED from, which fails when inspecting a TPU-trained
    checkpoint from a CPU process (tools, converters, tests).  This restores
    every leaf as ``np.ndarray`` regardless of origin.
    """
    import jax
    import numpy as np
    cp = ocp.PyTreeCheckpointer()
    item = cp.metadata(os.path.abspath(path)).item_metadata
    tree = item.tree if hasattr(item, 'tree') else item
    args = jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                        tree)
    return cp.restore(os.path.abspath(path), restore_args=args)


def scan_checkpoint(dirpath: str, prefix: str) -> Optional[str]:
    """Newest checkpoint dir matching ``prefix*`` (sorted order)."""
    if not os.path.isdir(dirpath):
        return None
    pat = re.compile(re.escape(prefix) + r'(\d+)$')
    hits = sorted(p for p in os.listdir(dirpath) if pat.match(p))
    return os.path.join(dirpath, hits[-1]) if hits else None


def prune_old(dirpath: str, prefix: str, keep: int = 1) -> None:
    pat = re.compile(re.escape(prefix) + r'(\d+)$')
    hits = sorted(p for p in os.listdir(dirpath) if pat.match(p))
    for p in hits[:-keep] if keep > 0 else hits:
        full = os.path.join(dirpath, p)
        import shutil
        shutil.rmtree(full, ignore_errors=True)


# -------------------- acoustic --------------------

def save_acoustic(run_dir: str, state, keep: int = 1) -> str:
    step = int(state.step)
    path = os.path.join(run_dir, f'ckpt_{step:08d}')
    save_tree(path, {'step': state.step, 'params': state.params,
                     'opt_state': state.opt_state,
                     'extra_vars': state.extra_vars})
    prune_old(run_dir, 'ckpt_', keep)
    return path


def restore_acoustic(run_dir: str, template) -> Optional[Any]:
    path = scan_checkpoint(run_dir, 'ckpt_')
    if path is None:
        return None
    tree = restore_tree(path, {'step': template.step, 'params': template.params,
                               'opt_state': template.opt_state,
                               'extra_vars': template.extra_vars})
    return type(template)(tree['step'], tree['params'], tree['opt_state'],
                          tree['extra_vars'])


# -------------------- vocoder (g_/do_ split) --------------------

def save_gan(run_dir: str, state, epoch: int, keep: int = 2) -> Tuple[str, str]:
    step = int(state.step)
    g_path = os.path.join(run_dir, f'g_{step:08d}')
    do_path = os.path.join(run_dir, f'do_{step:08d}')
    save_tree(g_path, {'generator': state.gen_params})
    save_tree(do_path, {'disc_params': state.disc_params,
                        'gen_opt': state.gen_opt, 'disc_opt': state.disc_opt,
                        'step': state.step, 'epoch': epoch})
    prune_old(run_dir, 'g_', keep)
    prune_old(run_dir, 'do_', keep)
    return g_path, do_path


def restore_gan(run_dir: str, template) -> Tuple[Optional[Any], int]:
    """Returns (state, epoch); (None, -1) when no checkpoint exists."""
    g_path = scan_checkpoint(run_dir, 'g_')
    do_path = scan_checkpoint(run_dir, 'do_')
    if g_path is None or do_path is None:
        return None, -1
    g = restore_tree(g_path, {'generator': template.gen_params})
    do = restore_tree(do_path, {'disc_params': template.disc_params,
                                'gen_opt': template.gen_opt,
                                'disc_opt': template.disc_opt,
                                'step': template.step, 'epoch': 0})
    state = type(template)(do['step'], g['generator'], do['gen_opt'],
                           do['disc_params'], do['disc_opt'])
    return state, int(do['epoch'])


def restore_generator_params(run_dir: str, template_params) -> Optional[Any]:
    """Inference path: newest ``g_*`` only (reference ``server.py:76-81``)."""
    g_path = scan_checkpoint(run_dir, 'g_')
    if g_path is None:
        return None
    return restore_tree(g_path, {'generator': template_params})['generator']
