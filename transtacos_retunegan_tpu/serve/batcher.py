"""Dynamic micro-batching for the HTTP serving layer.

The reference serves one request at a time end to end (``app.py:61-90``
chains three Flask services; each holds the GPU for the whole request).
Here concurrent requests COALESCE: a dispatcher gathers same-shape-bucket
requests arriving within a small window and runs ONE batched device program
(``Synthesizer.synthesize_spec_batch`` / ``vocode_batch``), so production
QPS scales with the MXU's appetite for batch work (vocode_batch measured
7.2 ms/stream at batch 8 vs 26 ms solo) instead of serializing.

Design invariants:

* **Arrival-order independence.**  Per-request PRNG keys derive from request
  CONTENT (``Synthesizer.content_key``), and requests only group within the
  same shape bucket (text bucket for the acoustic stage, frame bucket for the
  vocoder stage), so padding is identical whether a request runs alone or in
  a batch.  N concurrent requests therefore produce the same audio as the
  same N requests issued serially (``tests/test_serving_concurrent.py``).
* **One compute path.**  The frontend always uses the batched surfaces, even
  for a group of one; a lone request pays the coalescing window (a few ms)
  plus the scan-decoder path.  Latency-critical solo traffic can bypass the
  frontend entirely (``Synthesizer.tts`` keeps the fused single-dispatch
  kernel) or run the server with ``--batch_window_ms 0``.
* **Device work stays single-threaded.**  All jitted calls happen on the two
  dispatcher threads (acoustic, vocoder), which also serializes access to
  the per-stage compile caches; handler threads only queue and wait.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, Hashable, List, Sequence, Tuple

import numpy as np

from ..text import frontend
from .pipeline import Synthesizer, _round_up


class Coalescer:
    """Gathers concurrent same-bucket submissions into batched calls.

    ``fn(bucket_key, payloads) -> results`` runs on the dispatcher thread
    with 1..max_batch payloads that share ``bucket_key``; submitters block
    on a Future.  When a batched ``fn`` call fails with >1 payload, the
    dispatcher retries each payload SOLO so only the genuinely poisoned
    request(s) receive the exception -- healthy cohort members never fail
    for a neighbor's bad input (``test_serving_concurrent.py`` mixed-cohort
    test).  The dispatcher itself survives all failures."""

    def __init__(self, fn: Callable[[Hashable, List], Sequence],
                 max_batch: int = 8, window_s: float = 0.006,
                 name: str = 'coalescer'):
        self._fn = fn
        self._max = max(1, int(max_batch))
        self._win = float(window_s)
        self._q: 'queue.SimpleQueue[Tuple[Hashable, object, Future]]' = (
            queue.SimpleQueue())
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name=name)
        self._thread.start()

    def submit(self, bucket_key: Hashable, payload) -> Future:
        fut: Future = Future()
        self._q.put((bucket_key, payload, fut))
        return fut

    def __call__(self, bucket_key: Hashable, payload):
        return self.submit(bucket_key, payload).result()

    # -- dispatcher ------------------------------------------------------
    def _collect(self) -> Dict[Hashable, List[Tuple[object, Future]]]:
        """Block for one item, then drain arrivals for the window."""
        key, payload, fut = self._q.get()
        groups: Dict[Hashable, List[Tuple[object, Future]]] = {}
        groups[key] = [(payload, fut)]
        deadline = time.monotonic() + self._win
        n = 1
        while n < self._max:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                key, payload, fut = self._q.get(timeout=left)
            except queue.Empty:
                break
            groups.setdefault(key, []).append((payload, fut))
            n += 1
        return groups

    def _loop(self):
        while True:
            for key, items in self._collect().items():
                futs = [f for _, f in items]
                try:
                    results = self._fn(key, [p for p, _ in items])
                    if len(results) != len(futs):
                        raise RuntimeError(
                            f'batch fn returned {len(results)} results '
                            f'for {len(futs)} payloads')
                except Exception as e:                       # noqa: BLE001
                    if len(items) == 1:
                        futs[0].set_exception(e)
                        continue
                    # poisoned-cohort isolation: re-run each payload solo so
                    # only the bad request(s) fail.  The healthy majority
                    # pays one retry dispatch -- rare path, correctness over
                    # batching efficiency here.
                    for p, f in items:
                        try:
                            r = self._fn(key, [p])
                            if len(r) != 1:
                                raise RuntimeError(
                                    f'batch fn returned {len(r)} results '
                                    'for 1 payload')
                            f.set_result(r[0])
                        except Exception as ee:              # noqa: BLE001
                            f.set_exception(ee)
                    continue
                for f, r in zip(futs, results):
                    f.set_result(r)


class BatchingFrontend:
    """Self-batching serving surface over a ``Synthesizer``.

    Two coalescing stages mirror the pipeline: acoustic (text bucket ->
    specs via ``synthesize_spec_batch``) and vocoder (frame bucket -> wavs
    via ``vocode_batch`` with content-derived keys).  A full ``tts`` request
    flows through both, so acoustic work for one cohort overlaps queueing of
    the next."""

    def __init__(self, synth: Synthesizer, max_batch: int = 8,
                 window_s: float = 0.006):
        self.synth = synth
        self._ac = Coalescer(self._run_acoustic, max_batch, window_s,
                             name='batch-acoustic')
        self._vo = Coalescer(self._run_vocode, max_batch, window_s,
                             name='batch-vocoder')

    # -- bucket keys (must match the padding the surfaces compute) -------
    def _text_bucket(self, pinyin: str) -> int:
        seq = frontend.serialize_inference(pinyin, self.synth.cfg.acoustic.g2p)
        n = seq.shape[0]
        return _round_up(max(n, 1), self.synth.cfg.acoustic.text_bucket)

    def _frame_bucket(self, spec: np.ndarray) -> int:
        t = spec.shape[1] if spec.shape[0] in (
            self.synth.cfg.audio.n_freq,
            self.synth.cfg.audio.n_freq - 1) else spec.shape[0]
        return _round_up(max(t, 64), 64)

    # -- dispatcher bodies ------------------------------------------------
    def _run_acoustic(self, bucket: int, pinyins: List[str]) -> List[np.ndarray]:
        return self.synth.synthesize_spec_batch(pinyins)

    def _run_vocode(self, bucket: int,
                    items: List[Tuple[np.ndarray, object]]
                    ) -> List[np.ndarray]:
        specs = [s for s, _ in items]
        keys = [k for _, k in items]
        return self.synth.vocode_batch(specs, keys=keys)

    # -- public surfaces ---------------------------------------------------
    def synth_spec(self, pinyin: str) -> np.ndarray:
        return self._ac(self._text_bucket(pinyin), pinyin)

    def vocode(self, spec: np.ndarray, key=None) -> np.ndarray:
        """``key=None`` hashes the spec bytes: a client re-posting the same
        payload gets the same audio.  Upstream stages that COMPUTE the spec
        must pass a key derived from their own request text instead --
        float last-bit jitter across batch compositions would otherwise
        select a different GL phase key and change the audio audibly."""
        spec = np.asarray(spec, np.float32)
        if key is None:
            key = self.synth.content_key(np.ascontiguousarray(spec).tobytes())
        return self._vo(self._frame_bucket(spec), (spec, key))

    def tts(self, text: str) -> np.ndarray:
        """Full text -> wav through both coalescing stages (neural only;
        the GL debug path stays on the plain Synthesizer)."""
        if frontend.looks_like_pinyin(text):
            clauses = [text.strip().lower()]
        else:
            segs = frontend.normalize_text(text)
            clauses = [self.synth.kanji2pinyin(s) for s in segs]
        specs = [self.synth_spec(p) for p in clauses]
        spec = specs[0] if len(specs) == 1 else np.concatenate(specs, axis=1)
        return self.vocode(spec,
                           key=self.synth.content_key(
                               ' '.join(clauses).encode('utf-8')))

    def tts_batch(self, texts: List[str], neural: bool = True
                  ) -> List[np.ndarray]:
        """Explicit batch POSTs flow through the same coalescers as
        concurrent singles (all items submitted before any result is
        awaited, so they group up to max_batch), keeping /synth_batch and
        coalesced /synth outputs identical for identical payloads."""
        if not neural:
            return self.synth.tts_batch(texts, neural=False)
        # per-text clause lists, exactly like ``tts`` (kanji splits into
        # clauses, each synthesized separately and concatenated): a text
        # POSTed to /synth_batch must yield the same audio as /synth
        clause_lists = []
        for t in texts:
            if frontend.looks_like_pinyin(t):
                clause_lists.append([t.strip().lower()])
            else:
                segs = frontend.normalize_text(t)
                clause_lists.append([self.synth.kanji2pinyin(s)
                                     for s in segs])
        spec_futs = [[self._ac.submit(self._text_bucket(p), p) for p in cl]
                     for cl in clause_lists]
        specs = []
        for futs in spec_futs:
            parts = [np.asarray(f.result(), np.float32) for f in futs]
            specs.append(parts[0] if len(parts) == 1
                         else np.concatenate(parts, axis=1))
        wav_futs = [
            self._vo.submit(
                self._frame_bucket(s),
                (s, self.synth.content_key(' '.join(cl).encode('utf-8'))))
            for cl, s in zip(clause_lists, specs)]
        return [f.result() for f in wav_futs]
