"""Serving CLI.

Usage:
  python -m transtacos_retunegan_tpu.serve.app \
      --acoustic_dir runs/acoustic --vocoder_dir runs/vocoder [--mode all]

Modes: ``all`` (default; one process, three reference-compatible ports
5103/5104/5105), or a single role (``webui``/``acoustic``/``vocoder``) on its
reference port -- the drop-in multi-process deployment shape.
"""

from __future__ import annotations

import argparse
import time

from ..config import Config
from .httpd import serve, serve_all
from .pipeline import Synthesizer

PORTS = {'webui': 5103, 'vocoder': 5104, 'acoustic': 5105}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--mode', default='all',
                   choices=['all', 'webui', 'acoustic', 'vocoder'])
    p.add_argument('--host', default='0.0.0.0')
    p.add_argument('--port', type=int, default=None)
    p.add_argument('--config', default=None)
    p.add_argument('--acoustic_dir', default=None)
    p.add_argument('--vocoder_dir', default=None)
    p.add_argument('--kanji_table', default=None)
    p.add_argument('--max_iters', type=int, default=None)
    p.add_argument('--dp', type=int, default=1,
                   help='data-parallel serving over N local devices: the '
                        'batched surfaces (tts_batch etc.) shard their '
                        'batch dim over a jax.sharding.Mesh via GSPMD')
    p.add_argument('--max_batch', type=int, default=8,
                   help='dynamic micro-batching: max coalesced batch')
    p.add_argument('--batch_window_ms', type=float, default=6.0,
                   help='dynamic micro-batching window; 0 disables '
                        'coalescing (every request runs solo on the '
                        'lowest-latency fused path)')
    args = p.parse_args()

    cfg = Config.load(args.config) if args.config else Config()
    mesh = None
    if args.dp > 1:
        import numpy as np
        import jax
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < args.dp:
            raise SystemExit(f'--dp {args.dp} but only {len(devs)} devices')
        mesh = Mesh(np.array(devs[:args.dp]), ('data',))
    synth = Synthesizer(cfg, acoustic_dir=args.acoustic_dir,
                        vocoder_dir=args.vocoder_dir,
                        kanji_table=args.kanji_table,
                        max_iters=args.max_iters,
                        mesh=mesh)

    # warm the compile caches with a short utterance
    print('warming up...')
    t0 = time.time()
    synth.tts('ni3 hao3', neural=True)
    print(f'warmup took {time.time() - t0:.1f}s')

    batching = args.batch_window_ms > 0
    if args.mode == 'all':
        serve_all(synth, args.host, batching=batching,
                  max_batch=args.max_batch,
                  batch_window_s=args.batch_window_ms / 1000.0)
        print('serving on ports 5103 (webui), 5104 (vocoder), 5105 (acoustic)'
              + (f' [micro-batching <= {args.max_batch}'
                 f' @ {args.batch_window_ms:g} ms]' if batching else ''))
    else:
        port = args.port or PORTS[args.mode]
        serve(synth, args.mode, port, args.host, batching=batching,
              max_batch=args.max_batch,
              batch_window_s=args.batch_window_ms / 1000.0)
        print(f'serving {args.mode} on port {port}')

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass


if __name__ == '__main__':
    main()
