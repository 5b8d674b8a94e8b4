"""Acoustic model training CLI.

Rebuild of ``transtacos/train.py``: background feeder, jitted train step,
rolling-window time/loss logging, loss-explosion guard, TensorBoard summaries
(losses, LR, teacher-forcing ratio, grad norm, alignment/embedding-similarity
images, Griffin-Lim audio of target vs predicted mag), checkpoint + eval
artifact dump every interval, hard stop at ``max_steps``.

Usage:
  python -m transtacos_retunegan_tpu.train.train_acoustic \
      --data_dir ~/Data/processed --log_path runs/acoustic
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
from ..data.feeder import AcousticDataset, DataFeeder
from ..utils.logging import ValueWindow, get_logger, host_rss_gb
from ..utils.plotting import plot_alignment, plot_specs
from . import checkpoint as ckpt
from .acoustic_step import (TrainState, hoist_force_eligible, init_state,
                            train_step, train_step_hoisted)


def train(args) -> None:
    # multi-host entry hook: no-op unless a coordinator is configured (CLI
    # flag or JAX_COORDINATOR_ADDRESS), so single-host runs are unchanged
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed(getattr(args, 'coordinator', None),
                                 getattr(args, 'num_processes', None),
                                 getattr(args, 'process_id', None))
    cfg = Config.load(args.config) if args.config else Config()
    if args.debug_nans:
        # jitted NaN detection (the analogue of the reference's
        # torch.autograd.set_detect_anomaly, ``retunegan/train.py:31``)
        jax.config.update('jax_debug_nans', True)
    os.makedirs(args.log_path, exist_ok=True)
    cfg.save(args.log_path)
    logger = get_logger('acoustic', os.path.join(args.log_path, 'train.log'))

    try:
        from torch.utils.tensorboard import SummaryWriter
        sw = SummaryWriter(args.log_path)
    except Exception:
        sw = None

    dataset = AcousticDataset(args.data_dir, cfg,
                              getattr(args, 'train_split', 'train'))
    logger.info(f'dataset: {len(dataset)} examples')

    # multi-chip: (data, model) mesh -- DP over the batch, TP shardings on
    # whitelisted kernels; GSPMD inserts the collectives (SURVEY §2.4/§7.7).
    # Created before the data path: the device-resident corpus shards over it.
    mesh = None
    num_devices = getattr(args, 'num_devices', 0)
    if jax.process_count() > 1 and not (num_devices and num_devices > 1):
        # --coordinator alone would make the feeder slice the batch per
        # process while mesh=None inserts NO gradient all-reduce: N hosts
        # would silently train independent diverging models.  Fail loudly.
        raise SystemExit('multi-host run (process_count='
                         f'{jax.process_count()}) requires --num_devices '
                         '(global device count) > 1 so the mesh synchronizes '
                         'gradients across hosts')
    if num_devices and num_devices > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(num_devices,
                         model_parallel=getattr(args, 'model_parallel', 1))
        dp = mesh.shape['data']
        assert cfg.acoustic.batch_size % dp == 0, \
            f'batch_size {cfg.acoustic.batch_size} not divisible by data axis {dp}'
        logger.info(f'mesh: {dict(mesh.shape)} '
                    f'({dp}-way DP x {mesh.shape["model"]}-way TP)')

    # HBM-resident corpus: upload once, gather batches on device (per-step
    # wire bytes -> ~0; see data/device_data.py).  On a mesh the corpus
    # block-shards over the data axis (HBM cost / dp) and gathers locally;
    # multi-HOST runs keep the streaming feeder (a single process must be
    # able to see the whole corpus here).
    device_data = getattr(args, 'device_data', False)
    if device_data and jax.process_count() > 1:
        raise SystemExit('--device_data supports single-process runs '
                         '(single- or multi-device); multi-host runs '
                         'stream via the feeder')
    if device_data:
        from ..data.device_data import (DevicePump, DeviceResidentData,
                                        MeshDeviceResidentData,
                                        corpus_nbytes, fits_in_hbm)
        if not fits_in_hbm(dataset, cfg):
            raise SystemExit(
                f'--device_data: padded corpus is '
                f'{corpus_nbytes(dataset, cfg) / 2**30:.1f} GiB, over the '
                'HBM budget; use the streaming feeder')
        t0 = time.time()
        dd = (MeshDeviceResidentData(dataset, cfg, mesh) if mesh is not None
              else DeviceResidentData(dataset, cfg))
        logger.info(f'device-resident corpus: {dd.nbytes() / 2**30:.2f} GiB '
                    f'({dd.n} x T{dd.t_pad} x N{dd.n_pad}'
                    f'{", sharded" if mesh is not None else ""}), uploaded '
                    f'in {time.time() - t0:.1f}s')
        pump = DevicePump(dd, seed=cfg.audio.randseed)
        feeder = None
    else:
        feeder = DataFeeder(dataset, cfg)
        feeder.start()
        pump = feeder             # swapped for a DevicePrefetcher below

    rng = jax.random.PRNGKey(cfg.audio.randseed)
    first = pump.get_batch()
    state = init_state(cfg, rng, first)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.info(f'model params: {n_params:,}')

    restored = ckpt.restore_acoustic(args.log_path, state)
    if restored is not None:
        state = restored
        logger.info(f'resumed from step {int(state.step)}')

    if mesh is not None:
        from ..parallel import replicate, shard_batch, shard_params_tp
        state = TrainState(state.step, shard_params_tp(mesh, state.params),
                           replicate(mesh, state.opt_state),
                           replicate(mesh, state.extra_vars))

    # Single-device path: pipeline host->device transfers behind the running
    # step (DevicePrefetcher docstring has the measured numbers: the jit
    # dispatch otherwise pays ~0.4-0.5 s/step of blocking per-array
    # transfers on this image's remote tunnel).  The mesh path keeps its
    # shard_batch assembly.
    prefetch = getattr(args, 'prefetch', 2)
    if device_data:
        pass                      # batches never leave the device
    elif mesh is None and prefetch > 0:
        from ..data.feeder import DevicePrefetcher
        pump = DevicePrefetcher(feeder, depth=prefetch,
                                wire_dtype=getattr(args, 'wire_dtype', None))
        first = pump.put_device(first)
        pump.start()
        wire = (f', wire dtype {np.dtype(pump._wire).name}'
                if pump._wire is not None else '')
        logger.info(f'prefetch depth {prefetch}{wire}')
    elif getattr(args, 'wire_dtype', None):
        # --wire_dtype rides the DevicePrefetcher; without it (mesh path or
        # --prefetch 0) nothing narrows, so say so instead of silently
        # ignoring the flag
        logger.warning('--wire_dtype has no effect: it applies only to the '
                       'single-device --prefetch path (DevicePrefetcher not '
                       'instantiated here)')

    time_window, loss_window = ValueWindow(100), ValueWindow(100)
    max_steps = args.max_steps or cfg.acoustic.max_steps

    # Host-side step counter: reading ``state.step``/losses from the device
    # every iteration forces a per-step sync, which stalls the dispatch
    # queue (on remote-attached hardware that dominates: ~0.6 s/step vs a
    # 15 ms device step).  Sync only at log_interval; the explosion guard
    # (reference ``train.py:89-91``) consequently fires within log_interval
    # steps of the explosion rather than immediately.
    step = int(state.step)
    profiling = False
    loss_max = None    # device-side running max since the last log point
    last_t = time.time()
    while step < max_steps:
        # XLA-level profiler window (view with tensorboard/xprof); replaces
        # the reference's env-level --xla_hlo_profile (``train.py:22-23``)
        if args.profile_dir and step == args.profile_start:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        if profiling and step >= args.profile_start + args.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
            logger.info(f'wrote profiler trace to {args.profile_dir}')
        batch = first if first is not None else pump.get_batch()
        first = None
        if mesh is not None and not device_data:
            batch = shard_batch(mesh, batch)   # device-data batches arrive
                                               # already mesh-sharded
        rng, sub = jax.random.split(rng)
        # hoisted-force step while decoder inputs are pure ground truth
        # (identical function, time-parallel prenet/head; the host-side
        # schedule check costs nothing and switches programs exactly at the
        # TF-decay boundary)
        if hoist_force_eligible(cfg, step):
            state, losses = train_step_hoisted(cfg, state, batch, sub)
        else:
            state, losses = train_step(cfg, state, batch, sub)
        step += 1
        # async device-side max: catches TRANSIENT spikes between log points
        # without forcing a per-step host sync (NaN propagates through max)
        loss_max = losses['loss'] if loss_max is None \
            else jnp.maximum(loss_max, losses['loss'])

        if step % args.log_interval == 0:
            loss = float(losses['loss'])             # drains the queue
            now = time.time()
            time_window.append((now - last_t) / args.log_interval)
            last_t = now
            loss_window.append(loss)
            logger.info(
                f'step {step} [{time_window.average:.3f} s/step, '
                f'loss {loss:.4f}, avg {loss_window.average:.4f}, '
                f"mel {float(losses['mel_loss']):.4f} mag {float(losses['mag_loss']):.4f} "
                f"stop {float(losses['stop_token_loss']):.4f} "
                f"tfr {float(losses['tfr']):.3f}]")
            # loss-explosion guard (reference ``train.py:89-91``) over the
            # WINDOWED max, so a transient spike that recovers between log
            # points is still detected
            lmax = float(loss_max)
            loss_max = None
            if lmax > 300 or not np.isfinite(lmax):
                logger.error(f'loss exploded to {lmax} within the last '
                             f'{args.log_interval} steps (step {step}), aborting')
                pump.stop()
                raise SystemExit(1)
            # host-memory guard: remote backends can leak host RAM per
            # host->device transfer (the axon tunnel retains every batch
            # transfer, docs/PERF_NOTES.md); checkpoint and hand off to an
            # external resume loop before the OOM killer strikes
            rss_limit = getattr(args, 'rss_limit_gb', 0)
            if rss_limit and host_rss_gb() > rss_limit:
                path = ckpt.save_acoustic(args.log_path, state)
                logger.warning(
                    f'host RSS {host_rss_gb():.1f} GiB over --rss_limit_gb '
                    f'{rss_limit}; checkpointed to {path}, exiting 75 for '
                    f'resume')
                pump.stop()
                raise SystemExit(75)

        if sw is not None and step % args.summary_interval == 0:
            for k, v in losses.items():
                sw.add_scalar(f'train/{k}', float(v), step)
            # histogram stats (reference ``tacotron.py:272-294``): model
            # outputs vs targets + per-parameter gradient norms.  Separate
            # jitted program so the hot train_step stays untouched.
            from .acoustic_step import summary_stats
            stats = summary_stats(cfg, state, batch, sub)
            sw.add_histogram('mel_outputs',
                             np.asarray(stats['mel_outputs']), step)
            sw.add_histogram('mel_targets',
                             _np_f32(batch['mel_targets']), step)
            sw.add_histogram('mag_outputs',
                             np.asarray(stats['mag_outputs']), step)
            sw.add_histogram('mag_targets',
                             _np_f32(batch['mag_targets']), step)
            gn = np.asarray([float(g) for g in
                             jax.tree.leaves(stats['grad_norms'])], np.float32)
            sw.add_histogram('gradient_norm', gn, step)
            sw.add_scalar('train/max_gradient_norm', float(gn.max()), step)
            if stats['prds_out'] is not None:
                from ..eval.metrics import prds_accuracy
                sw.add_scalar('train/prds_accuracy', prds_accuracy(
                    np.asarray(batch['prds']), np.asarray(stats['prds_out']),
                    np.asarray(batch['text_lengths'])), step)

        if step % args.checkpoint_interval == 0:
            path = ckpt.save_acoustic(args.log_path, state)
            logger.info(f'saved checkpoint {path}')
            _dump_eval(cfg, state, batch, args.log_path, step, logger, sw)
            last_t = time.time()                     # exclude eval dump time

    pump.stop()
    logger.info(f'training complete at step {step}')


def _np_f32(v) -> np.ndarray:
    """Host numpy view of a (possibly 16-bit-wire, possibly on-device)
    batch array, widened to float32 for plotting/TB/DSP consumers that
    don't accept bfloat16 numpy."""
    a = np.asarray(v)
    if a.dtype != np.float32 and a.dtype.kind in ('f', 'V'):
        a = a.astype(np.float32)
    return a


def format_decode_dump(cfg, batch, out) -> list:
    """Checkpoint-time input decode (reference ``transtacos/train.py:102-121``):
    the first batch item's phone string, tone string, and -- in syl4 mode --
    ground-truth vs predicted prosody marks with masked accuracy.  Returns
    log lines."""
    from ..eval.metrics import prds_accuracy
    from ..text import frontend

    n = int(batch['text_lengths'][0])
    seq = np.asarray(batch['text'][0][:n])
    lines = ['Input:',
             f"  text: {' '.join(frontend.deserialize(seq, cfg.acoustic.g2p))}"]
    if seq.ndim == 2:                       # syl4 [T, 2]: (phone id, tone)
        lines.append(f"  tone: {''.join(str(t) for t in seq[:, 1])}")
    if out.get('prds_out') is not None:
        prds_r = np.asarray(batch['prds'][0][:n])
        prds_o = np.asarray(out['prds_out'][0][:n])
        acc = prds_accuracy(prds_r[None], prds_o[None], np.asarray([n]))
        lines.append(f"  prds: {''.join(str(p) for p in prds_r)}")
        lines.append(f"  pred: {''.join(str(p) for p in prds_o)} "
                     f"(accuracy {acc:.3f})")
    return lines


def _dump_eval(cfg, state: TrainState, batch, log_path, step, logger, sw):
    """Eval artifacts: GL wavs of target/predicted mag, alignment + spec PNGs
    (reference ``transtacos/train.py:97-127``, ``tacotron.py:296-313``)."""
    from ..audio import features as F
    from ..models.acoustic import Tacotron

    # widen any 16-bit-wire arrays (DevicePrefetcher) back to float32 on the
    # host: this eval path mixes batch arrays into numpy DSP and plotting
    batch = {k: _np_f32(v) for k, v in batch.items()}
    model = Tacotron(cfg)
    mutable = list(state.extra_vars.keys())
    out = model.apply({'params': state.params, **state.extra_vars},
                      batch['text'],
                      batch['text_lengths'], batch['prds'],
                      batch['spec_lengths'], batch['mel_targets'],
                      batch['f0_targets'], batch['c0_targets'], 1.0,
                      train=True, mutable=mutable if mutable else False,
                      rngs={'noise': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1),
                            'tf': jax.random.PRNGKey(2)})
    if mutable:
        out, _ = out
    for line in format_decode_dump(cfg, batch, out):
        logger.info(line)
    mag_t = np.asarray(batch['mag_targets'][0]).T     # [F-1, T]
    mag_p = np.asarray(out['mag_outputs'][0]).T
    try:
        wav_t = T.inv_spec(mag_t, cfg.audio)
        wav_p = T.inv_spec(mag_p, cfg.audio)
        F.save_wav(wav_t, os.path.join(log_path, f'step-{step}-raw.wav'), cfg.audio)
        F.save_wav(wav_p, os.path.join(log_path, f'step-{step}-gen.wav'), cfg.audio)
        if sw is not None:
            sw.add_audio('raw', wav_t[None] / max(1e-5, np.abs(wav_t).max()),
                         step, cfg.audio.sample_rate)
            sw.add_audio('gen', wav_p[None] / max(1e-5, np.abs(wav_p).max()),
                         step, cfg.audio.sample_rate)
    except Exception as e:  # GL on garbage early specs can overflow
        logger.info(f'eval audio dump skipped: {e!r}')
    align = np.asarray(out['alignments'][0])
    plot_alignment(align, os.path.join(log_path, f'step-{step}-align.png'),
                   info=f'step={step}')
    plot_specs([mag_t, mag_p,
                np.asarray(batch['mel_targets'][0]).T,
                np.asarray(out['mel_outputs'][0]).T],
               os.path.join(log_path, f'step-{step}-specs.png'),
               titles=['mag target', 'mag pred', 'mel target', 'mel pred'])
    if sw is not None:
        sw.add_image('alignment', align[None], step)
        sw.add_image('E_text_sim', np.asarray(out['E_text_sim'])[None], step)
        # per-head self/cross-attention maps (reference ``tacotron.py:302-313``
        # logs every head; round 1 logged only the decoder alignment)
        for i, layer in enumerate(out.get('slf_attn', [])):
            for h, att in enumerate(layer):
                sw.add_image(f'attn_self/l{i}_h{h}',
                             np.asarray(att[0])[None], step)
        for j, att in enumerate(out.get('crx_attn', [])):
            name = ('f0', 'c0')[j] if j < 2 else str(j)
            sw.add_image(f'attn_cross/{name}', np.asarray(att[0])[None], step)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', required=True)
    p.add_argument('--log_path', required=True)
    p.add_argument('--config', default=None)
    p.add_argument('--max_steps', type=int, default=None)
    p.add_argument('--log_interval', type=int, default=10)
    p.add_argument('--summary_interval', type=int, default=500)
    p.add_argument('--checkpoint_interval', type=int, default=1000)
    p.add_argument('--train_split', default='train',
                   help="index name: 'train' or a voice bank like "
                        "'vbank_male' (stats/thchs30_gen_vbanks.py workflow)")
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
                        '(resume-from-latest continues the run).  Mitigates '
                        'remote-backend transfer leaks: the axon tunnel '
                        'client in this image retains every host->device '
                        'batch transfer (~batch bytes per step, '
                        'docs/PERF_NOTES.md), so unbounded runs OOM the '
                        'host.  0 = off.')
    p.add_argument('--prefetch', type=int, default=2,
                   help='async host->device batch pipeline depth (single-'
                        'device path; 0 disables).  See '
                        'data/feeder.py::DevicePrefetcher')
    p.add_argument('--wire_dtype', default=None,
                   choices=['float32', 'float16', 'bfloat16'],
                   help='narrow float32 feature arrays to 16 bits for the '
                        'host->device transfer (targets quantize ~1e-3 '
                        'relative; math stays float32 on device).  Halves '
                        'wire bytes and the remote tunnel host-memory '
                        'retention per step.  Single-device --prefetch '
                        'path only (ignored with a warning on the mesh '
                        'path or with --prefetch 0)')
    p.add_argument('--device_data', action='store_true', default=False,
                   help='upload the whole padded corpus to device HBM once '
                        'and gather batches on device (16-bit target store, '
                        '~1e-3 relative like --wire_dtype).  Removes the '
                        'per-step host->device wire entirely.  On a mesh '
                        'the corpus block-shards over the data axis; '
                        'single-process only, corpus must fit the HBM '
                        'budget (data/device_data.py::fits_in_hbm)')
    p.add_argument('--debug_nans', action='store_true', default=False)
    p.add_argument('--profile_dir', default=None)
    p.add_argument('--profile_start', type=int, default=20)
    p.add_argument('--profile_steps', type=int, default=10)
    train(p.parse_args())


if __name__ == '__main__':
    main()
