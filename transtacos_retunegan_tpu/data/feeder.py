"""Acoustic-model training feeder with length bucketing and static shapes.

Rebuild of the reference's ``DataFeeder`` thread + ``tf.FIFOQueue``
(``transtacos/data.py``): loads ``batch_size^2`` examples per group, sorts by
spectrogram frame count, splits into batches, shuffles batch order.  Padding
follows the reference exactly (text pad id 0, spec pad per-sample min, stop
pad 1.0, lengths +1 then rounded up to r) and is then extended to the static
shape buckets so each batch shape compiles once.  A background thread keeps a
bounded queue of device-ready numpy batches.
"""

from __future__ import annotations

import os
import queue
import random
import threading
import time as _time
from typing import Dict, List, Optional

import numpy as np

from ..audio import features as F
from ..config import Config
from ..text import frontend


def _round_up(x: int, m: int) -> int:
    return x if x % m == 0 else x + m - x % m


class AcousticDataset:
    """Loads + caches serialized examples from a preprocessed corpus dir."""

    def __init__(self, data_dir: str, cfg: Config, split: str = 'train'):
        self.cfg = cfg
        self.data_dir = data_dir
        with open(os.path.join(data_dir, f'{split}.txt'), encoding='utf-8') as fh:
            self.metadata = [ln.strip().split('|') for ln in fh if ln.strip()]
        self.cache: List[Optional[tuple]] = [None] * len(self.metadata)
        self._frame_len: List[Optional[int]] = [None] * len(self.metadata)
        self._text_len: List[Optional[int]] = [None] * len(self.metadata)

    def __len__(self):
        return len(self.metadata)

    def frame_len(self, index: int) -> int:
        """Spectrogram frame count WITHOUT materializing the example: reads
        the mel .npy header via mmap.  Batch planning (sort + pad shapes)
        needs lengths for every member of a group, but under multi-host
        each process materializes only its strided slice -- lengths must be
        knowable for all of them cheaply."""
        if self._frame_len[index] is None:
            if self.cache[index] is not None:
                self._frame_len[index] = int(self.cache[index][2].shape[0])
            else:
                name = self.metadata[index][0]
                m = np.load(os.path.join(self.data_dir, f'mel-{name}.npy'),
                            mmap_mode='r')
                self._frame_len[index] = int(m.shape[1])   # stored [M, T]
        return self._frame_len[index]

    def text_len(self, index: int) -> int:
        """Serialized text length (host-side G2P only, no feature IO)."""
        if self._text_len[index] is None:
            if self.cache[index] is not None:
                self._text_len[index] = int(len(self.cache[index][0]))
            else:
                name, prds_str, text = self.metadata[index]
                seq, _ = frontend.serialize_train(
                    text, [int(d) for d in prds_str], self.cfg.acoustic.g2p)
                self._text_len[index] = int(len(seq))
        return self._text_len[index]

    def load(self, index: int) -> tuple:
        """(seq [T,2], prds [T], mel [T,M], mag [T,F-1], f0q [T], c0q [T], stop [T])
        -- reference ``data.py:102-170`` incl. the DC-bin drop."""
        if self.cache[index] is None:
            name, prds_str, text = self.metadata[index]
            seq, prds = frontend.serialize_train(
                text, [int(d) for d in prds_str], self.cfg.acoustic.g2p)
            mel = np.load(os.path.join(self.data_dir, f'mel-{name}.npy')).T
            mag = np.load(os.path.join(self.data_dir, f'mag-{name}.npy')).T
            f0 = np.load(os.path.join(self.data_dir, f'f0-{name}.npy'))
            c0 = np.load(os.path.join(self.data_dir, f'c0-{name}.npy'))
            mag = mag[:, 1:]                             # drop DC
            f0q = F.quantize_f0(f0, self.cfg.audio)
            c0q = F.quantize_c0(c0, self.cfg.audio)
            stop = np.zeros(mel.shape[0], np.float32)
            assert 0 <= f0q.min() and f0q.max() < self.cfg.audio.n_f0_bins
            assert 0 <= c0q.min() and c0q.max() < self.cfg.audio.n_c0_bins
            self.cache[index] = (seq, prds, mel.astype(np.float32),
                                 mag.astype(np.float32), f0q, c0q, stop)
        return self.cache[index]


def prepare_batch(examples: List[tuple], cfg: Config, bucket: bool = True,
                  shuffle: bool = True,
                  pad_to: Optional[tuple] = None) -> Dict[str, np.ndarray]:
    """Pad a list of examples into one batch (reference ``data.py:172-226``).

    ``pad_to=(n_ref, t_ref)`` overrides the reference padded lengths with
    externally computed ones -- the multi-host feeder passes the GLOBAL
    batch's maxima so every process pads its local rows to identical shapes
    and loss-length scalars (``DataFeeder.run``).  ``shuffle=False`` skips
    the within-batch shuffle when the caller already ordered the members."""
    hp = cfg.acoustic
    r = hp.outputs_per_step
    if shuffle:
        random.shuffle(examples)

    text_lengths = np.asarray([len(e[0]) for e in examples], np.int32)
    spec_lengths = np.asarray([len(e[2]) for e in examples], np.int32)

    # reference padded lengths: text to batch max; frames to batch max + 1,
    # rounded up to a multiple of r
    if pad_to is not None:
        n_ref, t_ref = pad_to
    else:
        n_ref = int(text_lengths.max())
        t_ref = _round_up(int(spec_lengths.max()) + 1, r)
    # static-shape buckets on top (loss masks exclude the extra padding)
    n_pad = _round_up(n_ref, hp.text_bucket) if bucket else n_ref
    t_pad = _round_up(t_ref, hp.frame_bucket) if bucket else t_ref

    b = len(examples)
    text = np.zeros((b, n_pad, 2), np.int32)
    prds = np.zeros((b, n_pad), np.int32)
    mel = np.zeros((b, t_pad, cfg.audio.n_mel), np.float32)
    mag = np.zeros((b, t_pad, cfg.audio.n_freq - 1), np.float32)
    f0 = np.zeros((b, t_pad), np.int32)
    c0 = np.zeros((b, t_pad), np.int32)
    stop = np.ones((b, t_pad), np.float32)          # pad value 1.0

    for i, (seq, p, me, ma, f0q, c0q, st) in enumerate(examples):
        text[i, :len(seq)] = seq
        prds[i, :len(p)] = p
        mel[i] = me.min()                           # spec pad with sample min
        mag[i] = ma.min()
        mel[i, :len(me)] = me
        mag[i, :len(ma)] = ma
        f0[i, :len(f0q)] = f0q
        c0[i, :len(c0q)] = c0q
        stop[i, :len(st)] = st

    return {
        'text': text, 'text_lengths': text_lengths, 'prds': prds,
        'spec_lengths': spec_lengths, 'mel_targets': mel, 'mag_targets': mag,
        'f0_targets': f0, 'c0_targets': c0, 'stop_token_targets': stop,
        'frame_loss_len': np.asarray(t_ref, np.int32),
        'text_loss_len': np.asarray(n_ref, np.int32),
    }


class DataFeeder(threading.Thread):
    """Background batch producer (reference ``data.py:20-100``)."""

    def __init__(self, dataset: AcousticDataset, cfg: Config,
                 batches_per_group: Optional[int] = None, queue_size: int = 8,
                 seed: int = 114514, num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None):
        """``num_shards``/``shard_index`` override the jax process topology
        (tests exercise the multi-host plan without a real process group)."""
        super().__init__(daemon=True)
        self.dataset = dataset
        self.cfg = cfg
        self.bs = cfg.acoustic.batch_size
        self._order = list(range(len(dataset)))
        # multi-host: EVERY process computes the identical global batch plan
        # (same seed -> same order/sort/shuffles; lengths come from cheap
        # npy-header reads, not feature loads) and then materializes only
        # its strided slice of each global batch's members, padded to the
        # GLOBAL batch's shapes.  Per-rank independent bucketing would give
        # ranks different pad shapes / loss-length scalars on real
        # variable-length corpora, breaking global batch assembly in
        # ``parallel.shard_batch``.  jax imported lazily: single-host data
        # tests stay jax-free.
        if num_shards is not None:
            pc = num_shards
            self._pidx = shard_index or 0
        else:
            import jax
            pc = jax.process_count()
            self._pidx = jax.process_index() if pc > 1 else 0
        self._pc = pc
        if pc > 1:
            assert self.bs % pc == 0, \
                f'batch_size {self.bs} not divisible by {pc} processes'
        self.batches_per_group = batches_per_group or self.bs
        self.q: 'queue.Queue[Dict[str, np.ndarray]]' = queue.Queue(queue_size)
        self.rng = random.Random(seed)
        self._offset = len(self._order)   # trigger shuffle on first use
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None

    def _next_index(self) -> int:
        if self._offset >= len(self._order):
            self._offset = 0
            self.rng.shuffle(self._order)
        i = self._order[self._offset]
        self._offset += 1
        return i

    def run(self):
        # propagate feeder-thread failures to the training loop instead of
        # dying silently and letting get_batch() time out opaquely
        # (reference parity: transtacos/data.py:65-71)
        try:
            self._run()
        except BaseException as e:
            self._error = e

    def _run(self):
        r = self.cfg.acoustic.outputs_per_step
        while not self._stop.is_set():
            n = self.bs
            group = [self._next_index() for _ in range(n * self.batches_per_group)]
            # bucket by output frame count (reference ``data.py:90-95``);
            # planning uses index lengths only, so the plan is identical on
            # every process of a multi-host run
            group.sort(key=self.dataset.frame_len)
            batches = [group[i:i + n] for i in range(0, len(group), n)]
            self.rng.shuffle(batches)
            for idxs in batches:
                if self._stop.is_set():
                    return
                if len(idxs) != n:
                    continue
                self.rng.shuffle(idxs)     # within-batch order, shared plan
                # GLOBAL pad shapes / loss lengths (reference formulas)
                n_ref = max(self.dataset.text_len(i) for i in idxs)
                t_ref = _round_up(
                    max(self.dataset.frame_len(i) for i in idxs) + 1, r)
                local = idxs[self._pidx::self._pc]
                examples = [self.dataset.load(i) for i in local]
                self.q.put(prepare_batch(examples, self.cfg, shuffle=False,
                                         pad_to=(n_ref, t_ref)))

    def get_batch(self, timeout: float = 300.0) -> Dict[str, np.ndarray]:
        deadline = _time.monotonic() + timeout
        while True:
            if self._error is not None:
                raise RuntimeError('DataFeeder thread failed') from self._error
            try:
                return self.q.get(timeout=min(1.0, max(
                    0.01, deadline - _time.monotonic())))
            except queue.Empty:
                if _time.monotonic() >= deadline:
                    raise

    def stop(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass


class DevicePrefetcher:
    """Overlap host->device batch transfers with the running train step.

    On a remote-attached TPU backend the jit dispatch path transfers each
    host numpy argument with a blocking round trip: measured on this
    image's axon tunnel, the 11-array acoustic batch costs ~0.4-0.5 s per
    step while the device step itself is ~10 ms (docs/PERF_NOTES.md,
    round 4).  This wrapper pulls host batches from a ``DataFeeder``-like
    source on a side thread and issues the WHOLE batch as one async
    ``jax.device_put`` tree -- every transfer in flight together
    (~0.03 s measured) and overlapped with the step running on device --
    so the training loop's dispatch never blocks on the wire.

    ``wire_dtype`` ('float16' or 'bfloat16') additionally narrows float32
    feature arrays on the host before transfer: half the bytes on the
    wire AND half of this tunnel's per-transfer host-memory retention.
    The jitted steps upcast on device (``acoustic_step`` casts 16-bit
    floats back to float32 at entry), so only the stored precision of the
    TARGETS changes (~1e-3 relative on mel/mag), never the math dtype.
    Default (None/'float32') transfers bit-exact batches.

    The reference has no analogue: its feeder thread fills a host-side
    ``tf.FIFOQueue`` only (``transtacos/data.py:20-100``).
    """

    def __init__(self, source, depth: int = 2,
                 wire_dtype: Optional[str] = None, device=None):
        import jax                         # lazy: host-only tests stay jax-free
        self._jax = jax
        self.source = source
        self.device = device if device is not None else jax.devices()[0]
        if wire_dtype in (None, '', 'float32'):
            self._wire = None
        elif wire_dtype == 'float16':
            self._wire = np.float16
        elif wire_dtype == 'bfloat16':
            import ml_dtypes               # ships with jax
            self._wire = ml_dtypes.bfloat16
        else:
            raise ValueError(f'unsupported wire_dtype {wire_dtype!r}')
        self.q: 'queue.Queue' = queue.Queue(max(1, int(depth)))
        self._stop_evt = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()

    # -- transfer ----------------------------------------------------------
    def _cast(self, v):
        if self._wire is not None and getattr(v, 'dtype', None) == np.float32:
            return np.asarray(v, dtype=self._wire)
        return v

    def put_device(self, batch: Dict[str, np.ndarray]):
        """Async device_put of one host batch (also used by callers that
        already hold a batch, e.g. the init batch in the train CLI).  One
        ``jax.device_put`` over the whole tree so the runtime can batch
        the per-leaf transfers."""
        jax = self._jax
        return jax.device_put(jax.tree.map(self._cast, batch), self.device)

    # -- thread body --------------------------------------------------------
    def _run(self):
        try:
            while not self._stop_evt.is_set():
                try:
                    batch = self.source.get_batch(timeout=5.0)
                except queue.Empty:
                    continue               # source idle; re-check stop flag
                out = self.put_device(batch)
                while not self._stop_evt.is_set():
                    try:
                        self.q.put(out, timeout=0.5)
                        break
                    except queue.Full:
                        pass
        except BaseException as e:         # propagate to the consumer
            self._error = e

    # -- consumer API (mirrors DataFeeder) ----------------------------------
    def get_batch(self, timeout: float = 300.0):
        deadline = _time.monotonic() + timeout
        while True:
            if self._error is not None:
                raise RuntimeError('DevicePrefetcher failed') from self._error
            try:
                return self.q.get(timeout=min(1.0, max(
                    0.01, deadline - _time.monotonic())))
            except queue.Empty:
                if _time.monotonic() >= deadline:
                    raise

    def stop(self):
        self._stop_evt.set()
        self.source.stop()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
