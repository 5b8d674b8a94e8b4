"""Sustained-load serving tail latency through the BatchingFrontend.

Round-4's bench reported concurrent throughput as a min-of-trials, which is
right for steady-state QPS but buried a 7.8x outlier trial (1569 ms vs the
200 ms steady state, ``BENCH_r04.json``).  This tool runs a closed-loop
sustained load -- N worker threads each issuing blocking requests back to
back for a fixed duration -- and reports the per-request latency
DISTRIBUTION (p50/p95/p99/max), which is what a serving SLO actually sees.

Outlier diagnosis: every request records its start/end timestamps.  A slow
request is classified as

* ``global_stall``  -- every other in-flight request over the same interval
  was also slow (host pause: GC, allocator, tunnel hiccup), or
* ``cohort_local``  -- only its own cohort stalled (first-use compile of a
  new (bucket, batch-size) program, or a long device queue).

Usage:
  python -m transtacos_retunegan_tpu.tools.serving_latency \
      [--duration 60] [--concurrency 16] [--out docs/serving_latency.json]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from typing import Callable, Dict, List

import numpy as np


def warm_cohort_sizes(fe, specs: List[np.ndarray],
                      sizes=(1, 2, 4, 8)) -> None:
    """Compile/warm every power-of-two vocode cohort size BEFORE measuring.

    The closed-loop load produces ragged cohort sizes (1..max_batch) which
    the pipeline pads to powers of two -- each a distinct executable.  A
    measurement window that triggers a first-use compile measures the
    compiler, not the server (this ate bench.py's first concurrent_tail
    leg whole); a production server should run exactly this warmup at
    startup."""
    for b in sizes:
        fe.synth.vocode_batch(list(specs[:max(1, min(b, len(specs)))]))


def percentiles(lat_ms: List[float]) -> Dict[str, float]:
    a = np.asarray(lat_ms, np.float64)
    return {
        'n': int(a.size),
        'p50_ms': round(float(np.percentile(a, 50)), 2),
        'p90_ms': round(float(np.percentile(a, 90)), 2),
        'p95_ms': round(float(np.percentile(a, 95)), 2),
        'p99_ms': round(float(np.percentile(a, 99)), 2),
        'max_ms': round(float(a.max()), 2),
        'mean_ms': round(float(a.mean()), 2),
    }


def run_load(request_fns: List[Callable[[], None]], duration_s: float,
             warmup_s: float = 5.0) -> Dict:
    """Closed-loop load: one worker per request_fn, looping until the
    deadline.  Returns latency records + percentile summaries (overall and
    steady-state, i.e. excluding the first ``warmup_s``)."""
    records: List[tuple] = []      # (worker, t_start, t_end)
    lock = threading.Lock()
    t_begin = time.monotonic()
    deadline = t_begin + duration_s
    errors: List[str] = []

    def worker(idx: int, fn: Callable[[], None]):
        local = []
        while time.monotonic() < deadline:
            t0 = time.monotonic()
            try:
                fn()
            except Exception as e:          # noqa: BLE001
                with lock:
                    errors.append(repr(e))
                break
            local.append((idx, t0, time.monotonic()))
        with lock:
            records.extend(local)

    threads = [threading.Thread(target=worker, args=(i, fn))
               for i, fn in enumerate(request_fns)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    records.sort(key=lambda r: r[1])
    lat_all = [(e - s) * 1000 for _, s, e in records]
    steady = [(e - s) * 1000 for _, s, e in records
              if s - t_begin >= warmup_s]
    out = {
        'duration_s': duration_s,
        'concurrency': len(request_fns),
        'errors': errors,
        'overall': percentiles(lat_all) if lat_all else None,
        'steady_state': percentiles(steady) if steady else None,
        'qps_steady': (round(len(steady) / max(duration_s - warmup_s, 1e-9),
                             2) if steady else None),
    }

    # ---- outlier classification --------------------------------------
    if steady:
        p50 = float(np.percentile(steady, 50))
        outliers = []
        for i, (w, s, e) in enumerate(records):
            dt_ms = (e - s) * 1000
            if s - t_begin < warmup_s or dt_ms < max(3 * p50, p50 + 50):
                continue
            # latencies of requests overlapping [s, e] issued by OTHERS
            overlap = [(ee - ss) * 1000 for (ww, ss, ee) in records
                       if ww != w and ss < e and ee > s]
            slow_share = (float(np.mean([x >= 2 * p50 for x in overlap]))
                          if overlap else 0.0)
            outliers.append({
                't_s': round(s - t_begin, 3),
                'latency_ms': round(dt_ms, 1),
                'concurrent_slow_share': round(slow_share, 2),
                'kind': 'global_stall' if slow_share >= 0.75
                        else 'cohort_local',
            })
        out['outliers_gt_3x_p50'] = outliers
    return out


def main():
    import dataclasses
    import os as _os

    import jax
    # persistent executable cache (same as bench.py): cohort-size programs
    # compile in minutes through this image's tunnel
    cache = _os.path.join(_os.getcwd(), '.jax_cache')
    _os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from ..config import Config
    from ..serve.batcher import BatchingFrontend
    from ..serve.pipeline import Synthesizer

    p = argparse.ArgumentParser()
    p.add_argument('--duration', type=float, default=60.0)
    p.add_argument('--warmup', type=float, default=8.0)
    p.add_argument('--concurrency', type=int, default=16)
    p.add_argument('--frames', type=int, default=400,
                   help='spec length per request (matches the bench leg)')
    p.add_argument('--mixed_buckets', action='store_true', default=False,
                   help='spread request lengths over several frame buckets '
                        '(stresses per-bucket program cache + grouping)')
    p.add_argument('--infer_dtype', default='auto')
    p.add_argument('--window_ms', type=float, default=6.0)
    p.add_argument('--out', default='docs/serving_latency.json')
    args = p.parse_args()

    cfg = Config()
    cfg = dataclasses.replace(cfg)
    synth = Synthesizer(cfg, infer_dtype=args.infer_dtype)
    fe = BatchingFrontend(synth, max_batch=8, window_s=args.window_ms / 1e3)

    rng = np.random.RandomState(7)
    lengths = ([args.frames] * args.concurrency if not args.mixed_buckets
               else [args.frames + 64 * (i % 3)
                     for i in range(args.concurrency)])
    specs = [np.abs(rng.randn(cfg.audio.n_freq, t) * 0.01).astype(np.float32)
             for t in lengths]
    fns = [(lambda s=s: fe.vocode(s)) for s in specs]

    print('# warming cohort-size programs (1/2/4/8)', flush=True)
    for t in sorted(set(lengths)):
        warm_cohort_sizes(fe, [s for s, tl in zip(specs, lengths)
                               if tl == t])
    print(f'# sustained load: {args.concurrency} workers, '
          f'{args.duration:.0f}s, window {args.window_ms}ms', flush=True)
    res = run_load(fns, args.duration, warmup_s=args.warmup)
    res['config'] = {'frames': lengths, 'window_ms': args.window_ms,
                     'infer_dtype': synth.infer_dtype
                     if hasattr(synth, 'infer_dtype') else args.infer_dtype,
                     'max_batch': 8}
    import jax
    res['device'] = str(jax.devices()[0])
    with open(args.out, 'w') as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps({k: res[k] for k in
                      ('steady_state', 'qps_steady', 'errors')}, indent=2))
    print(f'# wrote {args.out}', flush=True)


if __name__ == '__main__':
    main()
