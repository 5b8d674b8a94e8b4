"""Real multi-process (multi-host) smoke run of the DP acoustic train step.

The reference is strictly single-process (SURVEY §2.4); our multi-host story
is JAX-native: ``jax.distributed.initialize`` + a two-level DCN x ICI mesh
(``parallel.make_mesh``) + per-process input slicing assembled with
``jax.make_array_from_process_local_data`` (``parallel.shard_batch``).  This
tool runs ONE process of an N-process group end-to-end through that exact
production plumbing and prints the step loss, so the cross-process paths are
exercised for real -- not just in the degenerate 1-process case.

On a real TPU pod slice, run it per host with the standard JAX env vars (or
``--coordinator``/``--num_processes``/``--process_id``).  On a single machine
it runs multi-process on CPU using JAX's gloo collectives backend::

    python -m transtacos_retunegan_tpu.tools.multihost_smoke \
        --cpu --coordinator 127.0.0.1:29517 --num_processes 2 --process_id 0 &
    python -m transtacos_retunegan_tpu.tools.multihost_smoke \
        --cpu --coordinator 127.0.0.1:29517 --num_processes 2 --process_id 1

Every process must print the SAME loss (the gradient all-reduce and the
replicated-loss output make it globally consistent); ``tests/test_parallel.py``
launches a 2-process CPU group and asserts this, and asserts the loss matches
a single-process run on the same global batch.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

GLOBAL_BATCH = 8
_SEED = 1234


def demo_config():
    """Tiny acoustic + vocoder config (shared with tests so reference runs
    match)."""
    from transtacos_retunegan_tpu.config import Config
    return dataclasses.replace(
        Config(),
        acoustic=dataclasses.replace(
            Config().acoustic, embed_depth=32, encoder_depth=32,
            decoder_depth=64, attention_depth=16, prenet_depths=(32,),
            posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
            prdsnet_depth=16, posenc_depth=8, batch_size=GLOBAL_BATCH),
        vocoder=dataclasses.replace(
            Config().vocoder, upsample_initial_channel=32,
            multi_stft_params=((512, 256, 60),), msd_layers=1,
            mpd_periods=(3,), disc_width_mult=0.125,
            batch_size=GLOBAL_BATCH))


def make_demo_gan_batch(b=GLOBAL_BATCH, seg=512):
    """Deterministic global GAN batch (mel + GL template + target wav)."""
    import numpy as np
    rng = np.random.RandomState(_SEED)
    return {
        'mel': rng.randn(b, seg // 256, 80).astype(np.float32),
        'tmpl': (rng.randn(b, seg) * 0.1).astype(np.float32),
        'wav': (rng.randn(b, seg) * 0.1).astype(np.float32),
    }


def make_demo_batch(cfg, b=GLOBAL_BATCH, n=12, t=20):
    """Deterministic global batch; every process builds the same one and
    feeds only its ``process_shard`` slice (mirroring the per-process
    feeder slicing in data/feeder.py)."""
    import numpy as np
    from transtacos_retunegan_tpu.text.symbols import get_vocab_size
    rng = np.random.RandomState(_SEED)
    vocab = get_vocab_size()
    return {
        'text': np.stack([rng.randint(4, vocab, (b, n)),
                          rng.randint(0, 6, (b, n))], -1).astype(np.int32),
        'text_lengths': np.full(b, n, np.int32),
        'prds': rng.randint(0, 6, (b, n)).astype(np.int32),
        'spec_lengths': np.full(b, t, np.int32),
        'mel_targets': rng.randn(b, t, 80).astype(np.float32),
        'mag_targets': rng.randn(b, t, 1024).astype(np.float32),
        'f0_targets': rng.randint(0, cfg.audio.n_f0_bins, (b, t)).astype(np.int32),
        'c0_targets': rng.randint(0, 32, (b, t)).astype(np.int32),
        'stop_token_targets': np.zeros((b, t), np.float32),
        'frame_loss_len': np.asarray(t, np.int32),
        'text_loss_len': np.asarray(n, np.int32),
    }


def run(argv=None) -> float:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--coordinator', default=None,
                    help='host:port of process 0 (or use JAX env vars)')
    ap.add_argument('--num_processes', type=int, default=None)
    ap.add_argument('--process_id', type=int, default=None)
    ap.add_argument('--cpu', action='store_true',
                    help='force CPU backend with gloo collectives '
                         '(single-machine multi-process validation)')
    ap.add_argument('--local_devices', type=int, default=2,
                    help='virtual CPU devices per process (with --cpu)')
    ap.add_argument('--data_dir', default=None,
                    help='preprocessed corpus dir: drive the REAL DataFeeder '
                         'under the process group (every rank computes the '
                         'same global batch plan and materializes its '
                         'strided slice) instead of the synthetic fixed '
                         'batch.  The printed loss must match a '
                         'single-process run on the same corpus/seed: the '
                         'loss is a masked batch mean, invariant to the '
                         'process-major row order of the assembled global '
                         'array.')
    ap.add_argument('--model', choices=['acoustic', 'gan'],
                    default='acoustic',
                    help='which sharded train step to run: the acoustic '
                         'step (DP + optional TP) or the vocoder GAN step '
                         '(Dx2+G, pure DP)')
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ['XLA_FLAGS'] = (
            f'--xla_force_host_platform_device_count={args.local_devices} '
            + os.environ.get('XLA_FLAGS', ''))
        os.environ.pop('PALLAS_AXON_POOL_IPS', None)  # axon plugin override
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    from transtacos_retunegan_tpu.parallel import (
        make_mesh, maybe_initialize_distributed, process_shard, replicate,
        shard_batch)
    maybe_initialize_distributed(args.coordinator, args.num_processes,
                                 args.process_id)

    import jax.numpy as jnp
    from transtacos_retunegan_tpu.train.acoustic_step import (init_state,
                                                              train_step)
    pid, nproc = jax.process_index(), jax.process_count()
    print(f'[p{pid}] processes={nproc} global_devices={jax.device_count()} '
          f'local_devices={jax.local_device_count()}', flush=True)

    cfg = demo_config()
    if args.model == 'gan':
        # vocoder GAN step under the real process group: identical-seed
        # init, all GANState fields replicated, batch rows assembled from
        # per-process slices.  Loss reductions are element means, so the
        # replicated loss is invariant to assembly row order and must match
        # a single-process run bit-for-bit up to reduction order.
        from transtacos_retunegan_tpu.train.vocoder_step import (
            gan_train_step, init_gan_state)
        batch = make_demo_gan_batch()
        sl = process_shard(GLOBAL_BATCH)
        local = {k: v[sl] for k, v in batch.items()}
        gstate = init_gan_state(cfg, jax.random.PRNGKey(0),
                                jax.tree.map(jnp.asarray, local),
                                steps_per_epoch=10)
        mesh = make_mesh()
        gstate = type(gstate)(gstate.step,
                              replicate(mesh, gstate.gen_params),
                              replicate(mesh, gstate.gen_opt),
                              replicate(mesh, gstate.disc_params),
                              replicate(mesh, gstate.disc_opt))
        sharded = shard_batch(mesh, local)
        gstate, gm = gan_train_step(cfg, gstate, sharded,
                                    jax.random.PRNGKey(42), 10)
        val = float(gm['loss_gen_all'])
        print(f'[p{pid}] RESULT {val:.6f}', flush=True)
        return val

    if args.data_dir:
        # production input path: the feeder computes the GLOBAL batch plan
        # on every rank and yields this rank's strided rows, padded to the
        # global batch's shapes (data/feeder.py)
        from transtacos_retunegan_tpu.data.feeder import (AcousticDataset,
                                                          DataFeeder)
        ds = AcousticDataset(args.data_dir, cfg, 'train')
        feeder = DataFeeder(ds, cfg, batches_per_group=2, seed=_SEED)
        feeder.start()
        local = feeder.get_batch(timeout=180)
        feeder.stop()
    else:
        batch = make_demo_batch(cfg)
        # per-process slice of the fixed global batch
        sl = process_shard(GLOBAL_BATCH)
        local = {k: (v[sl] if getattr(v, 'ndim', 0) > 0 else v)
                 for k, v in batch.items()}
    # identical-seed init on every process -> identical params (init does
    # not depend on batch content or local row count); replicate() then
    # places them with a replicated sharding over the global mesh
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(jnp.asarray, local))
    mesh = make_mesh()          # multi-process -> hybrid DCN x ICI layout
    # _replace keeps every other TrainState field (e.g. extra_vars carrying
    # CBHG BatchNorm stats) instead of silently resetting it
    state = state._replace(params=replicate(mesh, state.params),
                           opt_state=replicate(mesh, state.opt_state),
                           extra_vars=replicate(mesh, state.extra_vars))
    sharded = shard_batch(mesh, local)
    state, loss = train_step(cfg, state, sharded, jax.random.PRNGKey(42))
    val = float(loss['loss'])
    print(f'[p{pid}] RESULT {val:.6f}', flush=True)
    return val


if __name__ == '__main__':
    run(sys.argv[1:])
