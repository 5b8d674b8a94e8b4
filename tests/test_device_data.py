"""HBM-resident corpus (data/device_data.py): batch-semantics parity with
the host feeder, plan coverage, and the train-CLI integration flag."""

import dataclasses
import tempfile

import jax
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.data.device_data import (DevicePump,
                                                       DeviceResidentData,
                                                       corpus_nbytes,
                                                       fits_in_hbm)
from transtacos_retunegan_tpu.data.feeder import (AcousticDataset,
                                                  prepare_batch)


@pytest.fixture(scope='module')
def corpus():
    from transtacos_retunegan_tpu.tools.synth_corpus import build_corpus
    cfg = Config()
    cfg = dataclasses.replace(cfg, acoustic=dataclasses.replace(
        cfg.acoustic, embed_depth=32, encoder_depth=32, decoder_depth=64,
        attention_depth=16, prenet_depths=(32,), posnet_depth=64,
        var_embed_depth=16, var_prednet_depth=16, prdsnet_depth=16,
        posenc_depth=8, batch_size=4, frame_bucket=400, text_bucket=16))
    base = tempfile.mkdtemp(prefix='devdata_')
    data_dir = build_corpus(base, cfg, 10)
    ds = AcousticDataset(data_dir, cfg, 'train')
    return cfg, ds


class TestDeviceResidentData:
    def test_gather_matches_prepare_batch_semantics(self, corpus):
        """Same indices through the device gather and the host
        ``prepare_batch``: values equal to 16-bit store tolerance on the
        overlapping extent, and the reference loss-length scalars
        (``round_up(batch_max+1, r)``) are IDENTICAL."""
        cfg, ds = corpus
        drd = DeviceResidentData(ds, cfg)
        idx = np.asarray([0, 3, 5, 7], np.int32)
        db = drd.gather(idx)
        hb = prepare_batch([ds.load(i) for i in idx], cfg, shuffle=False)
        for k in hb:
            a = np.asarray(db[k], np.float32)
            b = np.asarray(hb[k], np.float32)
            if a.ndim >= 2 and a.shape != b.shape:
                sl = tuple(slice(0, min(x, y))
                           for x, y in zip(a.shape, b.shape))
                a, b = a[sl], b[sl]
            if a.size:
                d = np.max(np.abs(a - b))
                assert d <= 2e-3 * max(1.0, float(np.max(np.abs(b)))), (k, d)
        assert int(db['frame_loss_len']) == int(hb['frame_loss_len'])
        assert int(db['text_loss_len']) == int(hb['text_loss_len'])

    def test_pad_tail_semantics(self, corpus):
        """Rows beyond an item's true length carry the reference pad
        values: stop 1.0, spec at the sample min."""
        cfg, ds = corpus
        drd = DeviceResidentData(ds, cfg)
        db = drd.gather(np.asarray([0], np.int32))
        t = int(db['spec_lengths'][0])
        stop = np.asarray(db['stop_token_targets'][0])
        mel = np.asarray(db['mel_targets'][0])
        assert np.all(stop[t:] == 1.0)
        np.testing.assert_allclose(mel[t:], mel.min(), atol=2e-3)

    def test_sizing_and_gate(self, corpus):
        cfg, ds = corpus
        drd = DeviceResidentData(ds, cfg)
        est = corpus_nbytes(ds, cfg)
        assert abs(drd.nbytes() - est) <= 0.05 * est
        assert fits_in_hbm(ds, cfg)
        assert not fits_in_hbm(ds, cfg, budget_bytes=1024)

    def test_plan_covers_epoch(self, corpus):
        """Every example appears exactly once per epoch across the grouped
        shuffled stream (DataFeeder's contract)."""
        cfg, ds = corpus
        drd = DeviceResidentData(ds, cfg)
        pump = DevicePump(drd, seed=3)
        # 9 full groups of bs*bpg=16 = 144 indices = exactly 16 epochs of
        # the 9-item corpus; group boundaries align with the epoch stream
        # (batches are shuffled only WITHIN a group)
        group = cfg.acoustic.batch_size ** 2
        total = 9 * group
        seen = []
        while len(seen) < total:
            seen.extend(np.asarray(next(pump._it)).tolist())
        counts = np.bincount(np.asarray(seen[:total]), minlength=len(ds))
        assert counts.max() == counts.min() == total // len(ds), counts

    def test_train_step_runs_on_gathered_batch(self, corpus):
        from transtacos_retunegan_tpu.train.acoustic_step import (init_state,
                                                                  train_step)
        cfg, ds = corpus
        drd = DeviceResidentData(ds, cfg)
        batch = drd.gather(np.asarray([0, 1, 2, 3], np.int32))
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        state, losses = train_step(cfg, state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses['loss']))


class TestMeshDeviceResidentData:
    """DP-sharded corpus store: local gathers, global loss-lens, sharded
    train step (the pod-slice shape of DeviceResidentData)."""

    def _mesh_dd(self, corpus, dp=8):
        from transtacos_retunegan_tpu.data.device_data import \
            MeshDeviceResidentData
        from transtacos_retunegan_tpu.parallel import make_mesh
        cfg, ds = corpus
        cfg = dataclasses.replace(cfg, acoustic=dataclasses.replace(
            cfg.acoustic, batch_size=8))
        mesh = make_mesh(dp)
        return cfg, ds, mesh, MeshDeviceResidentData(ds, cfg, mesh)

    def test_gather_content_and_sharding(self, corpus):
        from transtacos_retunegan_tpu.data.device_data import \
            _build_host_arrays
        cfg, ds, mesh, mdd = self._mesh_dd(corpus)
        host = _build_host_arrays(ds, cfg, 'float16')
        n, blk = len(ds), mdd.blk
        idx = np.asarray([d % blk for d in range(8)], np.int32)
        b = mdd.gather(idx)
        for row in range(8):
            src = (row * blk + int(idx[row])) % n        # wrap-pad rows
            np.testing.assert_array_equal(np.asarray(b['text'][row]),
                                          host['text'][src])
            np.testing.assert_array_equal(
                np.asarray(b['spec_lengths'][row]),
                host['spec_lengths'][src])
        # batch arrives sharded over the data axis -- no host round trip
        assert 'data' in str(b['mel_targets'].sharding.spec)
        r = cfg.acoustic.outputs_per_step
        sl = np.asarray(b['spec_lengths'])
        assert int(b['frame_loss_len']) == -(-(int(sl.max()) + 1) // r) * r

    def test_sharded_train_step_runs(self, corpus):
        from transtacos_retunegan_tpu.data.device_data import DevicePump
        from transtacos_retunegan_tpu.parallel import (replicate,
                                                       shard_params_tp)
        from transtacos_retunegan_tpu.train.acoustic_step import (TrainState,
                                                                  init_state,
                                                                  train_step)
        cfg, ds, mesh, mdd = self._mesh_dd(corpus)
        pump = DevicePump(mdd, seed=3)
        first = pump.get_batch()
        state = init_state(cfg, jax.random.PRNGKey(0), first)
        state = TrainState(state.step, shard_params_tp(mesh, state.params),
                           replicate(mesh, state.opt_state),
                           replicate(mesh, state.extra_vars))
        state, losses = train_step(cfg, state, first, jax.random.PRNGKey(1))
        state, losses = train_step(cfg, state, pump.get_batch(),
                                   jax.random.PRNGKey(2))
        assert np.isfinite(float(losses['loss']))

    def test_plan_covers_each_block(self, corpus):
        """Every shard's plan covers its own block uniformly (sharded-
        dataset sampling semantics, like the multi-host feeder stride)."""
        cfg, ds, mesh, mdd = self._mesh_dd(corpus)
        it = mdd.plan(seed=5)
        per_shard = [[] for _ in range(mdd.dp)]
        bs_local = cfg.acoustic.batch_size // mdd.dp
        for _ in range(4 * mdd.blk * 8):     # several epochs of batches
            idx = next(it)
            for d in range(mdd.dp):
                per_shard[d].extend(
                    idx[d * bs_local:(d + 1) * bs_local].tolist())
        for d in range(mdd.dp):
            counts = np.bincount(np.asarray(per_shard[d]),
                                 minlength=mdd.blk)
            assert counts.min() > 0
            assert counts.max() - counts.min() <= counts.min(), counts
