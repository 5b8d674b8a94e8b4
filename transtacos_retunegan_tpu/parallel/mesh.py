"""Device mesh + sharding helpers.

The reference is single-process single-device (SURVEY §2.4); parallelism here
is designed TPU-first: a named ``(data, model)`` mesh, batch sharded over
``data`` (pure DP -- the right fit for a 7M-param acoustic model and a 2.7M
vocoder), with tensor-parallel parameter shardings over ``model`` available
for scale-out.  XLA/GSPMD inserts the all-reduces (ICI collectives) from the
sharding annotations; there is no hand-written NCCL/MPI layer to port.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the first n devices."""
    devices = list(devices or jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ('data', 'model'))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host batch with the leading axis sharded over ``data``.
    Scalars (loss-length markers) replicate."""
    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            spec = P()
        else:
            spec = P('data', *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh (params, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# -- tensor-parallel parameter rules ---------------------------------------
# Pattern -> which axis of the kernel to shard over 'model'.  Applied to the
# largest parameter tensors where the dimension divides the axis size; all
# other params replicate.  This is GSPMD-style TP: any annotation is
# semantically valid, the compiler inserts the collectives.
_TP_PATTERNS = [
    (re.compile(r'.*(posnet4_\d+|posnet3|posnet2).*'), -1),   # grouped heads
    (re.compile(r'.*decoder_cell.*(gru_\d+|rnn_in_proj).*'), -1),
    (re.compile(r'.*(sa_\d+_\d+|proj_sa_\d+).*'), -1),        # attention heads
    (re.compile(r'.*(conv_fuse|merge_\d+|dec_rb.*|enc_r.*|ups.*|WNConv.*).*'), -1),
]


def tp_param_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree: shard whitelisted kernels over 'model'."""
    msize = mesh.shape['model']
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf):
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if msize > 1 and leaf.ndim >= 2 and leaf.size >= 4096:
            for pat, axis in _TP_PATTERNS:
                if pat.match(name):
                    ax = axis % leaf.ndim
                    if leaf.shape[ax] % msize == 0:
                        spec = [None] * leaf.ndim
                        spec[ax] = 'model'
                        return P(*spec)
        return P()

    specs = {jax.tree_util.keystr(p): spec_for(p, l) for p, l in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, l: specs[jax.tree_util.keystr(p)], params)


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    specs = tp_param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
