"""Vocoder GAN training CLI.

Rebuild of ``retunegan/train.py``: threaded loader over the RAM-cached
dataset, jitted GAN step (D x2 then G), per-10-step loss breakdown with
explosion guard, TB scalars, g_/do_ checkpoints, validation loop with audio
and spectrogram dumps every interval.  ``--finetune`` consumes the acoustic
preprocessor's features (the cross-stack contract).

Usage:
  python -m transtacos_retunegan_tpu.train.train_vocoder \
      --data_dir ~/Data/processed --log_path runs/vocoder --finetune
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import transforms as T
from ..config import Config
from ..data.vocoder_data import VocoderDataset, VocoderLoader
from ..utils.logging import get_logger, host_rss_gb
from ..utils.plotting import spectrogram_figure
from . import checkpoint as ckpt
from .vocoder_step import (gan_eval_step, gan_train_step, init_gan_state)


def train(args) -> None:
    # multi-host entry hook (no-op single-host; see train_acoustic.py)
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed(getattr(args, 'coordinator', None),
                                 getattr(args, 'num_processes', None),
                                 getattr(args, 'process_id', None))
    cfg = Config.load(args.config) if args.config else Config()
    if getattr(args, 'compute_dtype', None):
        import dataclasses
        cfg = dataclasses.replace(cfg, vocoder=dataclasses.replace(
            cfg.vocoder, compute_dtype=args.compute_dtype))
    if args.debug_nans:
        jax.config.update('jax_debug_nans', True)
    hv = cfg.vocoder
    os.makedirs(args.log_path, exist_ok=True)
    cfg.save(args.log_path)       # frozen config snapshot (reference train.py:37)
    logger = get_logger('vocoder', os.path.join(args.log_path, 'rtg.log'))

    try:
        from torch.utils.tensorboard import SummaryWriter
        sw = SummaryWriter(args.log_path)
    except Exception:
        sw = None

    trainset = VocoderDataset(getattr(args, 'train_split', 'train'),
                              args.data_dir, cfg, finetune=args.finetune)
    validset = VocoderDataset('test', args.data_dir, cfg, finetune=args.finetune,
                              limit=hv.valid_limit)
    logger.info(f'dataset: {len(trainset)} train / {len(validset)} valid')
    loader = VocoderLoader(trainset, hv.batch_size, shuffle=True,
                           num_workers=hv.num_workers)
    steps_per_epoch = max(1, len(loader))

    rng = jax.random.PRNGKey(cfg.audio.randseed)
    first_batch = next(iter(VocoderLoader(trainset, hv.batch_size,
                                          shuffle=False, num_workers=1)))
    state = init_gan_state(cfg, rng, first_batch, steps_per_epoch)
    n_g = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.gen_params))
    n_d = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.disc_params))
    logger.info(f'generator {hv.generator_ver}: {n_g:,} params; discs: {n_d:,}')

    restored, last_epoch = ckpt.restore_gan(args.log_path, state)
    if restored is not None:
        state = restored
        logger.info(f'resumed from step {int(state.step)} epoch {last_epoch}')

    # multi-chip: pure DP over the batch (the right fit for a 2.7M-param
    # generator); params/opt replicate, XLA inserts the gradient all-reduce
    mesh = None
    num_devices = getattr(args, 'num_devices', 0)
    if jax.process_count() > 1 and not (num_devices and num_devices > 1):
        # --coordinator alone would make the loader slice the batch per
        # process while mesh=None inserts NO gradient all-reduce: N hosts
        # would silently train independent diverging models.  Fail loudly.
        raise SystemExit('multi-host run (process_count='
                         f'{jax.process_count()}) requires --num_devices '
                         '(global device count) > 1 so the mesh synchronizes '
                         'gradients across hosts')
    if num_devices and num_devices > 1:
        from ..parallel import make_mesh, replicate, shard_batch
        mesh = make_mesh(num_devices,
                         model_parallel=getattr(args, 'model_parallel', 1))
        dp = mesh.shape['data']
        assert hv.batch_size % dp == 0, \
            f'batch_size {hv.batch_size} not divisible by data axis {dp}'
        state = type(state)(state.step,
                            replicate(mesh, state.gen_params),
                            replicate(mesh, state.gen_opt),
                            replicate(mesh, state.disc_params),
                            replicate(mesh, state.disc_opt))
        logger.info(f'mesh: {dict(mesh.shape)} ({dp}-way DP)')

    # Single-device path: pipeline host->device transfers behind the running
    # step (same rationale as train_acoustic's DevicePrefetcher; a bs64
    # batch is ~4.3 MB of wav/template/mel, ~70 ms of the ~320 ms step wall
    # when transferred synchronously at dispatch).
    def _device_batches(epoch_loader, depth=2):
        import queue as _q
        import threading as _th
        q: '_q.Queue' = _q.Queue(depth)
        sentinel = object()

        def _worker():
            try:
                for b in epoch_loader:
                    q.put(jax.device_put(b))
                q.put(sentinel)
            except BaseException as e:                   # propagate
                q.put(e)

        _th.Thread(target=_worker, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    prefetch = getattr(args, 'prefetch', 2)

    # host-side step counter: syncing ``state.step`` per batch stalls the
    # dispatch queue (see train_acoustic.py); metrics sync at stdout_interval
    step = int(state.step)
    loss_max = None    # device-side running max since the last log point
    last_t = time.time()
    for epoch in range(max(0, last_epoch), args.epochs):
        start_e = time.time()
        logger.info(f'>> Epoch {epoch + 1}')
        pump = (_device_batches(loader, prefetch)
                if mesh is None and prefetch > 0 else loader)
        for batch in pump:
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            state, m = gan_train_step(cfg, state, batch, sub, steps_per_epoch)
            step += 1
            # async device-side max: transient-spike detection without a
            # per-step host sync (see train_acoustic.py)
            loss_max = m['loss_gen_all'] if loss_max is None \
                else jnp.maximum(loss_max, m['loss_gen_all'])

            if step % args.stdout_interval == 0:
                g = float(m['loss_gen_all'])         # drains the queue
                now = time.time()
                s_per_b = (now - last_t) / args.stdout_interval
                last_t = now
                logger.info(
                    f'[{step} ({s_per_b:.2f} s/b)]\n'
                    f"  total gen: {g:.3f}, g_s: {float(m['loss_gen_s']):.3f}, "
                    f"g_p: {float(m['loss_gen_p']):.3f}, g_t: {float(m['loss_gen_t']):.3f}, "
                    f"fm_s: {float(m['loss_fm_s']) * hv.w_loss_fm:.3f}, "
                    f"fm_p: {float(m['loss_fm_p']) * hv.w_loss_fm:.3f}, "
                    f"fm_t: {float(m['loss_fm_t']) * hv.w_loss_fm:.3f}, "
                    f"mstft: {float(m['loss_mstft']) * hv.w_loss_mstft:.3f}, "
                    f"dyn: {float(m['loss_dyn']) * hv.w_loss_dyn:.3f}\n"
                    f"  total disc: {float(m['loss_disc_all']):.3f}, "
                    f"d_s: {float(m['loss_disc_s']):.3f}, "
                    f"d_p: {float(m['loss_disc_p']):.3f}, "
                    f"d_t: {float(m['loss_disc_t']):.3f}\n"
                    f"  d-scores >> sc_s_r: {float(m['sc_s_r']):.3f}, "
                    f"sc_s_g: {float(m['sc_s_g']):.3f}, "
                    f"sc_p_r: {float(m['sc_p_r']):.3f}, sc_p_g: {float(m['sc_p_g']):.3f}, "
                    f"sc_t_r: {float(m['sc_t_r']):.3f}, sc_t_g: {float(m['sc_t_g']):.3f}")
                gmax = float(loss_max)
                loss_max = None
                if not np.isfinite(gmax) or gmax > 1e5:
                    logger.error(f'loss exploded to {gmax} within the last '
                                 f'{args.stdout_interval} steps, aborting')
                    raise SystemExit(1)
                # host-memory guard (see train_acoustic.py / PERF_NOTES.md)
                rss_limit = getattr(args, 'rss_limit_gb', 0)
                if rss_limit and host_rss_gb() > rss_limit:
                    paths = ckpt.save_gan(args.log_path, state, epoch)
                    logger.warning(
                        f'host RSS {host_rss_gb():.1f} GiB over '
                        f'--rss_limit_gb {rss_limit}; checkpointed '
                        f'{paths}, exiting 75 for resume')
                    raise SystemExit(75)

            if sw is not None and step % args.summary_interval == 0:
                for k, v in m.items():
                    sw.add_scalar(f'train/{k}', float(v), step)

            if step % args.checkpoint_interval == 0:
                paths = ckpt.save_gan(args.log_path, state, epoch)
                logger.info(f'saved {paths}')

            if step % args.validation_interval == 0:
                _validate(cfg, state, validset, step, logger, sw)
                last_t = time.time()             # exclude validation time

        logger.info(f'<< Epoch {epoch + 1} took {time.time() - start_e:.2f}s')


def _pad_to_bucket(item, cfg, bucket_frames=128):
    """Pad a full-length eval item to a frame bucket so gan_eval_step
    compiles once per bucket instead of once per utterance length."""
    hop = cfg.audio.hop_length
    t = item['mel'].shape[0] if 'mel' in item else item['mel_c'].shape[0]
    t_pad = -(-t // bucket_frames) * bucket_frames
    if t_pad == t:
        return item
    out = {}
    for k, v in item.items():
        if k.startswith('mel'):
            out[k] = np.pad(v, ((0, t_pad - t), (0, 0)),
                            constant_values=float(v.min()))
        else:
            out[k] = np.pad(v, (0, (t_pad - t) * hop))
    return out


def _validate(cfg, state, validset, step, logger, sw):
    """Held-out metrics + sample audio dumps (reference ``train.py:275-322``)."""
    agg = {'loss_mstft': 0.0, 'loss_env': 0.0, 'loss_dyn': 0.0, 'loss_sm': 0.0}
    count = 0
    for j in range(len(validset)):
        item = _pad_to_bucket(validset[j], cfg)
        batch = {k: v[None] for k, v in item.items()}
        y_g, metrics = gan_eval_step(cfg, state.gen_params, batch)
        for k in agg:
            agg[k] += float(metrics[k])
        count += 1
        if sw is not None and j < 4:
            wav = np.asarray(y_g[0])
            mel = T.get_mel(wav, cfg.audio)
            sw.add_audio(f'gen/y_hat_{j}',
                         wav[None] / max(1e-5, np.abs(wav).max()), step,
                         cfg.audio.sample_rate)
            sw.add_figure(f'gen/y_hat_spec_{j}', spectrogram_figure(mel), step)
            if step == 0:
                raw = item['wav']
                sw.add_audio(f'raw/y_{j}',
                             raw[None] / max(1e-5, np.abs(raw).max()), step,
                             cfg.audio.sample_rate)
    if count:
        msg = ', '.join(f'{k}: {v / count:.4f}' for k, v in agg.items())
        logger.info(f'  valid >> {msg}')
        if sw is not None:
            for k, v in agg.items():
                sw.add_scalar(f'valid/{k}', v / count, step)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', required=True)
    p.add_argument('--log_path', default='rtg-logs')
    p.add_argument('--config', default=None)
    p.add_argument('--finetune', action='store_true', default=False)
    p.add_argument('--epochs', type=int, default=100)
    p.add_argument('--stdout_interval', type=int, default=10)
    p.add_argument('--summary_interval', type=int, default=250)
    p.add_argument('--validation_interval', type=int, default=1000)
    p.add_argument('--checkpoint_interval', type=int, default=1000)
    p.add_argument('--train_split', default='train',
                   help="index name: 'train' or a voice bank like 'vbank_male'")
    p.add_argument('--num_devices', type=int, default=0,
                   help='devices in the (data, model) mesh; 0/1 = single-device')
    p.add_argument('--model_parallel', type=int, default=1,
                   help='size of the model (TP) mesh axis')
    p.add_argument('--coordinator', default=None,
                   help='multi-host: coordinator address host:port for '
                        'jax.distributed.initialize (single-host if unset)')
    p.add_argument('--num_processes', type=int, default=None)
    p.add_argument('--process_id', type=int, default=None)
    p.add_argument('--rss_limit_gb', type=float, default=0,
                   help='checkpoint and exit 75 when host RSS exceeds this '
                        '(resume continues the run; mitigates remote-backend '
                        'transfer leaks, docs/PERF_NOTES.md).  0 = off.')
    p.add_argument('--prefetch', type=int, default=2,
                   help='async host->device batch pipeline depth (single-'
                        'device path; 0 disables)')
    p.add_argument('--debug_nans', action='store_true', default=False)
    p.add_argument('--compute_dtype', default=None,
                   choices=['float32', 'bfloat16'],
                   help='conv compute precision (overrides config); bfloat16 '
                        '= TPU mixed precision with f32 master params')
    train(p.parse_args())


if __name__ == '__main__':
    main()
