"""HBM-resident training corpus: upload once, gather batches on device.

The reference streams every batch host->GPU per step (``transtacos/
data.py:20-100`` fills a host FIFO; the session pulls from it each step).
On this image's remote-tunnel TPU that wire is the training bottleneck: a
bs64 batch at the evidence-corpus geometry is ~130 MB of spectrogram
targets, the tunnel sustains ~60 MB/s, and the client retains every
transfer (docs/PERF_NOTES.md leak) -- 2.3 s/step wall against a 10 ms
device step, measured during the round-5 decay run.

The TPU-native fix: a preprocessed corpus is SMALL compared to HBM when
targets are stored 16-bit (the 2,458-utterance evidence corpus is ~2.4 GB;
one v5e chip has 16 GB).  ``DeviceResidentData`` pads every example once to
a single global (T_pad, N_pad) geometry, uploads the whole corpus in one
``device_put``, and a tiny jitted ``gather`` assembles each step's batch
ON DEVICE from an int32 index vector -- per-step wire traffic drops from
~130 MB to ~256 bytes, and the single global shape means the train step
compiles exactly once.

Batch SEMANTICS match ``prepare_batch`` (reference ``data.py:172-226``):
spec rows pad with their own sample min, stop-token padding is 1.0, and
``frame_loss_len``/``text_loss_len`` are the BATCH-max reference lengths
(computed on device from the gathered true lengths, exact same
``round_up(max+1, r)`` arithmetic).  The batch PLAN mirrors ``DataFeeder``:
shuffled epochs, groups of ``batch_size x batches_per_group`` sorted by
frame length, split into batches, batch order and members shuffled.

Targets quantize to ~1e-3 relative in the 16-bit store -- the same
precision contract as the existing ``--wire_dtype float16`` transfer path;
all math upcasts to float32 on device.  Corpora that do not fit are the
streaming feeder's job: ``fits_in_hbm`` gates auto-selection.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, Optional

import numpy as np

from ..config import Config
from .feeder import AcousticDataset, _round_up


def _padded_geometry(dataset: AcousticDataset, cfg: Config) -> tuple:
    """Single global (t_pad, n_pad) covering every example (+1 stop frame),
    rounded to the configured bucket multiples."""
    hp = cfg.acoustic
    r = hp.outputs_per_step
    mxf = max(dataset.frame_len(i) for i in range(len(dataset)))
    mxt = max(dataset.text_len(i) for i in range(len(dataset)))
    t_pad = _round_up(_round_up(mxf + 1, r), hp.frame_bucket)
    n_pad = _round_up(mxt, hp.text_bucket)
    return t_pad, n_pad


def corpus_nbytes(dataset: AcousticDataset, cfg: Config) -> int:
    """16-bit-store footprint of the padded corpus (upload size == HBM size)."""
    t_pad, n_pad = _padded_geometry(dataset, cfg)
    n = len(dataset)
    freq = cfg.audio.n_freq - 1
    per = (t_pad * (cfg.audio.n_mel + freq + 1) * 2      # mel+mag+stop f16
           + t_pad * 2 * 4                               # f0, c0 int32
           + n_pad * 3 * 4)                              # text[,2], prds int32
    return n * per + n * 8


def fits_in_hbm(dataset: AcousticDataset, cfg: Config,
                budget_bytes: int = 9 * 2 ** 30) -> bool:
    """True when the 16-bit corpus fits the HBM budget (default 9 GiB,
    leaving headroom for params/optimizer/activations on a 16 GB chip)."""
    return corpus_nbytes(dataset, cfg) <= budget_bytes


def _build_host_arrays(dataset: AcousticDataset, cfg: Config,
                       store_dtype: str) -> Dict[str, np.ndarray]:
    """Pad every example to the single global geometry, reference pad
    semantics (sample-min spec pad, stop pad 1.0)."""
    t_pad, n_pad = _padded_geometry(dataset, cfg)
    sd = np.dtype(store_dtype)
    n = len(dataset)
    freq = cfg.audio.n_freq - 1
    text = np.zeros((n, n_pad, 2), np.int32)
    prds = np.zeros((n, n_pad), np.int32)
    mel = np.zeros((n, t_pad, cfg.audio.n_mel), sd)
    mag = np.zeros((n, t_pad, freq), sd)
    f0 = np.zeros((n, t_pad), np.int32)
    c0 = np.zeros((n, t_pad), np.int32)
    stop = np.ones((n, t_pad), sd)                      # pad value 1.0
    tlen = np.zeros(n, np.int32)
    slen = np.zeros(n, np.int32)
    for i in range(n):
        seq, p, me, ma, f0q, c0q, st = dataset.load(i)
        tlen[i], slen[i] = len(seq), len(me)
        text[i, :len(seq)] = seq
        prds[i, :len(p)] = p
        mel[i] = me.min()                               # sample-min pad
        mag[i] = ma.min()
        mel[i, :len(me)] = me
        mag[i, :len(ma)] = ma
        f0[i, :len(f0q)] = f0q
        c0[i, :len(c0q)] = c0q
        stop[i, :len(st)] = st
    return {'text': text, 'prds': prds, 'mel': mel, 'mag': mag,
            'f0': f0, 'c0': c0, 'stop': stop,
            'text_lengths': tlen, 'spec_lengths': slen}


class DeviceResidentData:
    """Whole-corpus device store + on-device batch gather."""

    def __init__(self, dataset: AcousticDataset, cfg: Config, device=None,
                 store_dtype: str = 'float16'):
        import jax
        import jax.numpy as jnp
        self._jax, self._jnp = jax, jnp
        self.cfg = cfg
        self.n = len(dataset)
        self.t_pad, self.n_pad = _padded_geometry(dataset, cfg)

        host = _build_host_arrays(dataset, cfg, store_dtype)
        self._lens_host = (host['text_lengths'], host['spec_lengths'])
        dev = device if device is not None else jax.devices()[0]
        self.data = jax.device_put(host, dev)
        jax.block_until_ready(self.data)

        r = cfg.acoustic.outputs_per_step

        @jax.jit
        def gather(data, idx):
            take = lambda k: jnp.take(data[k], idx, axis=0)
            sl, tl = take('spec_lengths'), take('text_lengths')
            t_ref = ((jnp.max(sl) + 1 + r - 1) // r) * r
            return {
                'text': take('text'), 'prds': take('prds'),
                'text_lengths': tl, 'spec_lengths': sl,
                'mel_targets': take('mel').astype(jnp.float32),
                'mag_targets': take('mag').astype(jnp.float32),
                'f0_targets': take('f0'), 'c0_targets': take('c0'),
                'stop_token_targets': take('stop').astype(jnp.float32),
                'frame_loss_len': t_ref.astype(jnp.int32),
                'text_loss_len': jnp.max(tl).astype(jnp.int32),
            }

        self._gather = gather

    def nbytes(self) -> int:
        return sum(v.nbytes for v in self._jax.tree.leaves(self.data))

    def gather(self, idx: np.ndarray):
        """Device batch for int32 indices (256 bytes on the wire)."""
        return self._gather(self.data, self._jnp.asarray(idx, self._jnp.int32))

    # -- batch plan (mirrors DataFeeder._run) ---------------------------
    def plan(self, seed: int = 114514,
             batches_per_group: Optional[int] = None
             ) -> Iterator[np.ndarray]:
        """Endless index-batch stream with DataFeeder's grouping semantics:
        shuffled epoch order, frame-length-sorted groups of
        ``bs x batches_per_group``, shuffled batch order."""
        bs = self.cfg.acoustic.batch_size
        bpg = batches_per_group or bs
        rng = random.Random(seed)
        _, slen = self._lens_host
        order = list(range(self.n))
        offset = self.n                     # trigger shuffle on first use

        def next_index():
            nonlocal offset
            if offset >= len(order):
                offset = 0
                rng.shuffle(order)
            i = order[offset]
            offset += 1
            return i

        while True:
            group = [next_index() for _ in range(bs * bpg)]
            group.sort(key=lambda i: int(slen[i]))
            batches = [group[i:i + bs] for i in range(0, len(group), bs)]
            rng.shuffle(batches)
            for idxs in batches:
                rng.shuffle(idxs)
                yield np.asarray(idxs, np.int32)


class MeshDeviceResidentData:
    """DP-sharded HBM corpus for a ``(data, model)`` mesh.

    Examples are BLOCK-distributed over the ``data`` axis (one
    ``device_put`` with a ``P('data')`` sharding; each chip holds n/dp
    rows), and every step gathers its shard's rows LOCALLY via
    ``shard_map`` -- the input path needs no cross-chip collectives, only
    the scalar loss-length max rides GSPMD.  This is the pod-slice shape
    of ``DeviceResidentData``: corpus HBM cost divides by dp.

    Sampling semantics follow the sharded-dataset convention (each shard
    runs an independent grouped-shuffle plan over ITS block, like the
    multi-host feeder striding examples per process) rather than the
    single-stream global shuffle -- standard for DP input pipelines; the
    loss-length scalars are still GLOBAL batch maxima, matching
    ``prepare_batch``.
    """

    def __init__(self, dataset: AcousticDataset, cfg: Config, mesh,
                 store_dtype: str = 'float16'):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        try:                                   # jax>=0.4.35 moved it
            from jax.experimental.shard_map import shard_map
        except ImportError:                    # pragma: no cover
            from jax.shard_map import shard_map
        self._jax, self._jnp = jax, jnp
        self.cfg = cfg
        self.mesh = mesh
        dp = mesh.shape['data']
        self.dp = dp
        assert cfg.acoustic.batch_size % dp == 0, \
            f'batch_size {cfg.acoustic.batch_size} not divisible by dp {dp}'
        self.t_pad, self.n_pad = _padded_geometry(dataset, cfg)

        host = _build_host_arrays(dataset, cfg, store_dtype)
        n = len(dataset)
        blk = -(-n // dp)
        if blk * dp != n:                      # equal blocks: wrap-pad rows
            extra = blk * dp - n
            host = {k: np.concatenate([v, v[:extra]], axis=0)
                    for k, v in host.items()}
        self.n, self.blk = blk * dp, blk
        self._lens_host = (host['text_lengths'], host['spec_lengths'])

        row_sh = NamedSharding(mesh, P('data'))
        self.data = {k: jax.device_put(v, row_sh) for k, v in host.items()}
        jax.block_until_ready(self.data)
        self._idx_sh = row_sh

        r = cfg.acoustic.outputs_per_step

        def _local_take(data, idx):            # per-shard block + local idx
            return {k: jnp.take(v, idx, axis=0) for k, v in data.items()}

        taker = shard_map(_local_take, mesh=mesh,
                          in_specs=(P('data'), P('data')),
                          out_specs=P('data'))

        @jax.jit
        def gather(data, idx):
            g = taker(data, idx)
            sl, tl = g['spec_lengths'], g['text_lengths']
            t_ref = ((jnp.max(sl) + 1 + r - 1) // r) * r    # GLOBAL max
            return {
                'text': g['text'], 'prds': g['prds'],
                'text_lengths': tl, 'spec_lengths': sl,
                'mel_targets': g['mel'].astype(jnp.float32),
                'mag_targets': g['mag'].astype(jnp.float32),
                'f0_targets': g['f0'], 'c0_targets': g['c0'],
                'stop_token_targets': g['stop'].astype(jnp.float32),
                'frame_loss_len': t_ref.astype(jnp.int32),
                'text_loss_len': jnp.max(tl).astype(jnp.int32),
            }

        self._gather = gather

    def nbytes(self) -> int:
        return sum(v.nbytes for v in self._jax.tree.leaves(self.data))

    def gather(self, idx: np.ndarray):
        """Device batch for LOCAL int32 indices [bs] (row i belongs to
        shard i*dp//bs and indexes within that shard's block)."""
        idx = self._jax.device_put(
            self._jnp.asarray(idx, self._jnp.int32), self._idx_sh)
        return self._gather(self.data, idx)

    def plan(self, seed: int = 114514,
             batches_per_group: Optional[int] = None
             ) -> Iterator[np.ndarray]:
        """Endless [bs]-index stream: per-shard grouped-shuffle plans over
        each block, concatenated in shard order (local indices)."""
        bs_local = self.cfg.acoustic.batch_size // self.dp
        bpg = batches_per_group or self.cfg.acoustic.batch_size
        tl, sl = self._lens_host

        def shard_stream(d: int):
            rng = random.Random(seed * 131 + d)
            base = d * self.blk
            order = list(range(self.blk))
            offset = self.blk

            def next_index():
                nonlocal offset
                if offset >= self.blk:
                    offset = 0
                    rng.shuffle(order)
                i = order[offset]
                offset += 1
                return i

            while True:
                group = [next_index() for _ in range(bs_local * bpg)]
                group.sort(key=lambda i: int(sl[base + i]))
                batches = [group[i:i + bs_local]
                           for i in range(0, len(group), bs_local)]
                rng.shuffle(batches)
                for b in batches:
                    rng.shuffle(b)
                    yield b

        streams = [shard_stream(d) for d in range(self.dp)]
        while True:
            yield np.concatenate([np.asarray(next(s), np.int32)
                                  for s in streams])


class DevicePump:
    """Drop-in for the train loop's batch source (``get_batch``/``stop``
    protocol): next planned index batch, gathered on device."""

    def __init__(self, dd, seed: int = 114514):
        self.dd = dd
        self._it = dd.plan(seed)

    def get_batch(self):
        return self.dd.gather(next(self._it))

    def stop(self):
        pass
