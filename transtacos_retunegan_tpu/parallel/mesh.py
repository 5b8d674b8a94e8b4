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


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> None:
    """Multi-host entry hook: ``jax.distributed.initialize`` when a
    coordinator is configured (CLI flags or the standard JAX env vars);
    a no-op in the single-process case, so the CLIs run unchanged on one
    host.  Call BEFORE any jax computation."""
    import os
    if coordinator is None and 'JAX_COORDINATOR_ADDRESS' not in os.environ:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs['coordinator_address'] = coordinator
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the first n devices.

    Multi-process (multi-host) runs get a two-level DCN x ICI layout: the
    ``model`` axis stays within a host (TP collectives ride ICI) and the
    ``data`` axis spans hosts x remaining per-host chips, so the only
    cross-DCN traffic is the once-per-step gradient all-reduce."""
    if devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils
        n_local = jax.local_device_count()
        assert n_local % model_parallel == 0, (n_local, model_parallel)
        # granule = DCN island.  TPU multi-slice exposes slice_index; when
        # absent (single slice, or CPU gloo validation runs) fall back to
        # the process as the granule -- still a valid DCN-outer layout.
        slices = {getattr(d, 'slice_index', 0) for d in jax.devices()}
        if len(slices) > 1:
            per_slice = jax.device_count() // len(slices)
            assert per_slice % model_parallel == 0, (per_slice, model_parallel)
            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(per_slice // model_parallel, model_parallel),
                dcn_mesh_shape=(len(slices), 1))
        else:
            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_local // model_parallel, model_parallel),
                dcn_mesh_shape=(jax.process_count(), 1),
                process_is_granule=True)
        return Mesh(arr, ('data', 'model'))
    devices = list(devices or jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ('data', 'model'))


def process_shard(n: int) -> slice:
    """This process's contiguous slice of a leading batch axis of size n
    (identity when single-process)."""
    pc = jax.process_count()
    assert n % pc == 0, f'batch axis {n} not divisible by {pc} processes'
    per = n // pc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch(mesh: Mesh, batch: Dict[str, Any],
                process_local: Optional[bool] = None) -> Dict[str, Any]:
    """Place a host batch with the leading axis sharded over ``data``.
    Scalars (loss-length markers) replicate.

    Single-process: a plain sharded ``device_put`` of the full batch.
    Multi-process: each process passes only ITS slice of the global batch
    (the feeder/loader already yields per-process batches -- see
    ``data/feeder.py``/``data/vocoder_data.py``) and the global array is
    assembled with ``jax.make_array_from_process_local_data``, so no host
    ever materializes or transfers the full global batch."""
    if process_local is None:
        process_local = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            spec = P()
        else:
            spec = P('data', *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if process_local:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)
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
