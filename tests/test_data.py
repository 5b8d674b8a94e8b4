"""Data pipeline tests on a synthetic mini-corpus written to tmpdir."""

import dataclasses

import numpy as np
import pytest

from transtacos_retunegan_tpu.audio import features as F
from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.data import preprocess as P
from transtacos_retunegan_tpu.data.feeder import (AcousticDataset, DataFeeder,
                                                  prepare_batch)
from transtacos_retunegan_tpu.data.vocoder_data import (VocoderDataset,
                                                        VocoderLoader)

CFG = Config()

PINYINS = ['ni3 hao3 shi4 jie4', 'zhong1 guo2 ren2', 'wo3 men5 de5 jia1',
           'tian1 qi4 zhen1 hao3', 'xie4 xie4 da4 jia1', 'zai4 jian4 peng2 you3',
           'chi1 fan4 le5 ma5', 'jin1 tian1 xing1 qi1 ji3']


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    """Synthetic corpus: tone bursts + generic metadata."""
    base = tmp_path_factory.mktemp('corpus')
    wav_dp = base / 'wavs'
    wav_dp.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i, py in enumerate(PINYINS):
        n_syl = len(py.split(' '))
        dur = 22050 // 2 + i * 2000
        t = np.arange(dur) / 22050
        f0 = 150 + 30 * (i % 4)
        y = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.1 * np.sin(2 * np.pi * 3 * f0 * t)
             + 0.01 * rng.randn(dur)).astype(np.float32)
        name = f'utt{i:03d}'
        F.save_wav(y, str(wav_dp / f'{name}.wav'), CFG.audio)
        prds = ''.join(rng.choice(list('01234')) for _ in range(n_syl - 1)) + '4'
        rows.append(f'{name}|{py}|{prds}')
    meta = base / 'metadata.csv'
    meta.write_text('\n'.join(rows), encoding='utf-8')
    stats = P.preprocess_generic(str(base), 'processed', str(meta),
                                 wav_dir='wavs', num_workers=1)
    return base, stats


class TestPreprocess:
    def test_outputs_written(self, corpus):
        base, stats = corpus
        out = base / 'processed'
        assert (out / 'train.txt').exists() and (out / 'test.txt').exists()
        assert (out / 'stats.txt').exists() and (out / 'wav_path.txt').exists()
        assert (out / 'config.json').exists()
        assert stats['total_examples'] >= 6

    def test_feature_contract(self, corpus):
        base, _ = corpus
        out = base / 'processed'
        name = open(out / 'train.txt', encoding='utf-8').readline().split('|')[0]
        mel = np.load(out / f'mel-{name}.npy')
        mag = np.load(out / f'mag-{name}.npy')
        f0 = np.load(out / f'f0-{name}.npy')
        c0 = np.load(out / f'c0-{name}.npy')
        assert mel.shape[0] == 80 and mag.shape[0] == 1025
        assert mel.shape[1] == mag.shape[1] == len(f0) == len(c0)

    def test_databaker_label_parser(self, tmp_path):
        fp = tmp_path / 'labels.txt'
        fp.write_text('000001\t这是#1例子#4。\n\tzhe4 shi4 li4 zi5\n',
                      encoding='utf-8')
        labels = P.parse_databaker_labels(str(fp))
        assert labels['000001'][0] == 'zhe4 shi4 li4 zi5'
        assert labels['000001'][1] == '0104'


class TestAcousticFeeder:
    def test_batch_contract(self, corpus):
        base, _ = corpus
        ds = AcousticDataset(str(base / 'processed'), CFG, 'train')
        exs = [ds.load(i) for i in range(min(4, len(ds)))]
        batch = prepare_batch(exs, CFG)
        b = len(exs)
        r = CFG.acoustic.outputs_per_step
        assert batch['text'].shape[0] == b and batch['text'].shape[2] == 2
        assert batch['mel_targets'].shape[2] == 80
        assert batch['mag_targets'].shape[2] == 1024      # DC dropped
        t_pad = batch['mel_targets'].shape[1]
        assert t_pad % CFG.acoustic.frame_bucket == 0
        assert int(batch['frame_loss_len']) % r == 0
        assert int(batch['frame_loss_len']) <= t_pad
        # stop targets: 0 on real frames, 1.0 on padding
        i = int(np.argmax(batch['spec_lengths']))
        sl = int(batch['spec_lengths'][i])
        assert batch['stop_token_targets'][i, :sl].max() == 0.0
        assert batch['stop_token_targets'][i, sl:].min() == 1.0

    def test_feeder_thread(self, corpus):
        base, _ = corpus
        cfg = dataclasses.replace(
            CFG, acoustic=dataclasses.replace(CFG.acoustic, batch_size=2))
        ds = AcousticDataset(str(base / 'processed'), cfg, 'train')
        feeder = DataFeeder(ds, cfg, batches_per_group=2, queue_size=2)
        feeder.start()
        b1 = feeder.get_batch(timeout=60)
        b2 = feeder.get_batch(timeout=60)
        feeder.stop()
        assert b1['text'].shape[0] == 2
        assert b2['mel_targets'].dtype == np.float32

    def test_feeder_propagates_thread_errors(self, corpus):
        """A failing feeder thread must surface its exception through
        get_batch instead of dying silently and timing out opaquely
        (reference parity: transtacos/data.py:65-71)."""
        base, _ = corpus
        cfg = dataclasses.replace(
            CFG, acoustic=dataclasses.replace(CFG.acoustic, batch_size=2))
        ds = AcousticDataset(str(base / 'processed'), cfg, 'train')
        ds.load = lambda i: (_ for _ in ()).throw(OSError('disk gone'))
        feeder = DataFeeder(ds, cfg, batches_per_group=2, queue_size=2)
        feeder.start()
        with pytest.raises(RuntimeError, match='DataFeeder thread failed'):
            feeder.get_batch(timeout=30)
        feeder.stop()

    def test_length_helpers_match_loaded(self, corpus):
        """Header-read planning lengths == materialized example lengths."""
        base, _ = corpus
        ds = AcousticDataset(str(base / 'processed'), CFG, 'train')
        for i in range(len(ds)):
            fl, tl = ds.frame_len(i), ds.text_len(i)     # header/G2P only
            ex = ds.load(i)
            assert fl == ex[2].shape[0] and tl == len(ex[0])

    def test_multihost_shards_agree(self, corpus):
        """Two strided feeder shards produce batches whose shapes and
        loss-length scalars MATCH (a multi-host hard requirement: divergent
        pad shapes per rank would break global batch assembly in
        parallel.shard_batch), and whose rows interleave back into exactly
        the single-shard feeder's batch."""
        base, _ = corpus
        cfg = dataclasses.replace(
            CFG, acoustic=dataclasses.replace(CFG.acoustic, batch_size=4))
        data_dir = str(base / 'processed')

        def grab(num_shards, shard_index, n=3):
            ds = AcousticDataset(data_dir, cfg, 'train')
            f = DataFeeder(ds, cfg, batches_per_group=2, queue_size=n,
                           seed=7, num_shards=num_shards,
                           shard_index=shard_index)
            f.start()
            out = [f.get_batch(timeout=60) for _ in range(n)]
            f.stop()
            return out

        full = grab(1, 0)
        r0 = grab(2, 0)
        r1 = grab(2, 1)
        for bf, b0, b1 in zip(full, r0, r1):
            # identical global plan: equal pad shapes + loss-len scalars
            assert b0['text'].shape == b1['text'].shape == (2,) + bf['text'].shape[1:]
            assert (int(b0['frame_loss_len']) == int(b1['frame_loss_len'])
                    == int(bf['frame_loss_len']))
            assert (int(b0['text_loss_len']) == int(b1['text_loss_len'])
                    == int(bf['text_loss_len']))
            for k in bf:
                v = np.asarray(bf[k])
                if v.ndim == 0:
                    continue
                np.testing.assert_array_equal(v[0::2], b0[k])
                np.testing.assert_array_equal(v[1::2], b1[k])


class TestVocoderData:
    def test_scratch_mode_crop(self, corpus):
        base, _ = corpus
        ds = VocoderDataset('train', str(base / 'processed'), CFG, finetune=False)
        item = ds[0]
        seg = CFG.audio.segment_size
        assert item['wav'].shape == (seg,)
        assert item['tmpl'].shape == (seg,)
        assert item['mel'].shape == (seg // 256, 80)
        # cached: second access fast and consistent shapes
        item2 = ds[0]
        assert item2['wav'].shape == (seg,)

    def test_finetune_mode_matches_preproc_domain(self, corpus):
        base, _ = corpus
        ds = VocoderDataset('train', str(base / 'processed'), CFG, finetune=True)
        item = ds[0]
        assert np.isfinite(item['mel']).all()
        assert np.isfinite(item['tmpl']).all()
        assert len(item['wav']) == CFG.audio.segment_size

    def test_eval_full_length(self, corpus):
        base, _ = corpus
        ds = VocoderDataset('test', str(base / 'processed'), CFG, finetune=True,
                            limit=2)
        item = ds[0]
        assert len(item['wav']) == item['mel'].shape[0] * 256

    def test_loader(self, corpus):
        base, _ = corpus
        ds = VocoderDataset('train', str(base / 'processed'), CFG, finetune=False)
        loader = VocoderLoader(ds, batch_size=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(ds) // 2
        assert batches[0]['mel'].shape[0] == 2

    def test_loader_propagates_worker_errors(self, corpus):
        """A failing loader worker must surface its exception instead of
        leaving its batch index forever missing (iteration would spin)."""
        base, _ = corpus
        ds = VocoderDataset('train', str(base / 'processed'), CFG,
                            finetune=False)

        class Broken:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                raise OSError('disk gone')

        loader = VocoderLoader(Broken(), batch_size=2, num_workers=2)
        with pytest.raises(RuntimeError, match='VocoderLoader worker failed'):
            list(loader)

    def test_loader_multihost_equal_batch_counts(self, corpus):
        """Ranks must iterate the SAME number of batches even when the
        dataset size is not a multiple of the process count — an extra
        batch on one rank would issue a cross-host all-reduce the others
        never join.  Also checks __len__ agrees with actual iteration."""
        base, _ = corpus
        ds = VocoderDataset('train', str(base / 'processed'), CFG, finetune=False)
        assert len(ds) >= 3
        loaders = [VocoderLoader(ds, batch_size=2, num_workers=1, shuffle=True,
                                 seed=3, num_shards=2, shard_index=i)
                   for i in range(2)]
        b0, b1 = list(loaders[0]), list(loaders[1])
        assert len(b0) == len(b1) == len(loaders[0]) == len(loaders[1])
        for a, b in zip(b0, b1):
            assert a['mel'].shape == b['mel'].shape == (1,) + a['mel'].shape[1:]
