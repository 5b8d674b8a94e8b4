"""Smoke tests for the training CLIs on a synthetic corpus (tiny configs)."""

import dataclasses
import os
import types

import numpy as np
import pytest

from transtacos_retunegan_tpu.audio import features as F
from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.data import preprocess as P

PINYINS = ['ni3 hao3 shi4 jie4', 'zhong1 guo2 ren2', 'wo3 men5 de5 jia1',
           'tian1 qi4 zhen1 hao3', 'xie4 xie4 da4 jia1', 'zai4 jian4 peng2 you3']


def tiny_cfg(batch_size=2):
    cfg = Config()
    return dataclasses.replace(
        cfg,
        acoustic=dataclasses.replace(
            cfg.acoustic, embed_depth=32, encoder_depth=32, decoder_depth=64,
            attention_depth=16, prenet_depths=(32,), posnet_depth=64,
            var_embed_depth=16, var_prednet_depth=16, prdsnet_depth=16,
            posenc_depth=8, batch_size=batch_size, frame_bucket=40),
        vocoder=dataclasses.replace(
            cfg.vocoder, upsample_initial_channel=32, batch_size=batch_size,
            num_workers=1, d_train_times=1,
            multi_stft_params=((512, 256, 60),)),
    )


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp('cli_corpus')
    wav_dp = base / 'wavs'
    wav_dp.mkdir()
    rng = np.random.RandomState(0)
    cfg = Config()
    rows = []
    for i, py in enumerate(PINYINS):
        dur = 22050 // 2 + i * 1500
        t = np.arange(dur) / 22050
        y = (0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t)
             + 0.01 * rng.randn(dur)).astype(np.float32)
        name = f'utt{i:03d}'
        F.save_wav(y, str(wav_dp / f'{name}.wav'), cfg.audio)
        n_syl = len(py.split(' '))
        rows.append(f'{name}|{py}|{"0" * (n_syl - 1)}4')
    meta = base / 'metadata.csv'
    meta.write_text('\n'.join(rows), encoding='utf-8')
    P.preprocess_generic(str(base), 'processed', str(meta), wav_dir='wavs',
                         num_workers=1)
    return str(base / 'processed')


class TestAcousticCLI:
    def test_two_steps_and_checkpoint(self, corpus, tmp_path, monkeypatch):
        from transtacos_retunegan_tpu.train import train_acoustic
        cfg = tiny_cfg()
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            max_steps=2, log_interval=1, summary_interval=1,
            checkpoint_interval=2, debug_nans=False, profile_dir=None,
            profile_start=0, profile_steps=0)
        train_acoustic.train(args)
        files = os.listdir(tmp_path / 'run')
        assert any(f.startswith('ckpt_') for f in files)
        assert 'config.json' in files
        assert any(f.endswith('-align.png') for f in files)
        assert 'train.log' in files

    def test_resume(self, corpus, tmp_path):
        from transtacos_retunegan_tpu.train import train_acoustic
        cfg = tiny_cfg()
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            max_steps=2, log_interval=1, summary_interval=10,
            checkpoint_interval=2, debug_nans=False, profile_dir=None,
            profile_start=0, profile_steps=0)
        train_acoustic.train(args)
        # second invocation resumes at step 2 and exits immediately
        train_acoustic.train(args)


class TestMultiHostGate:
    def test_process_group_without_mesh_fails_loudly(self, corpus, tmp_path,
                                                     monkeypatch):
        """process_count > 1 with no --num_devices must abort: the feeder
        would slice the batch per process while mesh=None inserts no
        gradient all-reduce -- N hosts silently training diverging
        models."""
        import jax
        from transtacos_retunegan_tpu.train import train_acoustic
        monkeypatch.setattr(jax, 'process_count', lambda: 2)
        monkeypatch.setattr(jax, 'process_index', lambda: 0)
        cfg = tiny_cfg()
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            max_steps=1, log_interval=1, summary_interval=10,
            checkpoint_interval=1, debug_nans=False, profile_dir=None,
            profile_start=0, profile_steps=0)
        with pytest.raises(SystemExit, match='num_devices'):
            train_acoustic.train(args)


class TestRssGuard:
    def test_guard_checkpoints_and_resume_completes(self, corpus, tmp_path):
        """--rss_limit_gb: over-limit -> checkpoint + SystemExit(75); a
        resume without the limit finishes the run (the mitigation for the
        remote tunnel's per-transfer host-memory leak, PERF_NOTES.md)."""
        from transtacos_retunegan_tpu.train import train_acoustic
        cfg = tiny_cfg()
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        base = dict(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            max_steps=4, log_interval=1, summary_interval=100,
            checkpoint_interval=2, debug_nans=False, profile_dir=None,
            profile_start=0, profile_steps=0)
        with pytest.raises(SystemExit) as ei:
            train_acoustic.train(types.SimpleNamespace(
                **base, rss_limit_gb=0.05))   # any real process exceeds this
        assert ei.value.code == 75
        assert any(f.startswith('ckpt_')
                   for f in os.listdir(tmp_path / 'run'))
        train_acoustic.train(types.SimpleNamespace(**base, rss_limit_gb=0))
        log = (tmp_path / 'run' / 'train.log').read_text()
        assert 'training complete at step 4' in log


class TestVbankSplit:
    def test_acoustic_trains_on_vbank_index(self, corpus, tmp_path):
        """--train_split consumes a voice-bank index produced by
        corpus_stats.gen_vbanks (reference thchs30 vbank workflow)."""
        from transtacos_retunegan_tpu.train import train_acoustic
        rows = open(os.path.join(corpus, 'train.txt'),
                    encoding='utf-8').read().strip().split('\n')
        with open(os.path.join(corpus, 'vbank_test.txt'), 'w',
                  encoding='utf-8') as fh:
            fh.write('\n'.join(rows[:3]))
        cfg = tiny_cfg()
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            max_steps=1, log_interval=1, summary_interval=10,
            checkpoint_interval=1, debug_nans=False, profile_dir=None,
            profile_start=0, profile_steps=0, train_split='vbank_test')
        train_acoustic.train(args)
        assert any(f.startswith('ckpt_')
                   for f in os.listdir(tmp_path / 'run'))


class TestAcousticCLIMesh:
    def test_two_steps_dp_tp(self, corpus, tmp_path):
        """--num_devices wires the (data, model) mesh end-to-end through the
        CLI: TP-sharded params, DP-sharded feeder batches (SURVEY §7.7)."""
        from transtacos_retunegan_tpu.train import train_acoustic
        cfg = tiny_cfg(batch_size=4)
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            max_steps=2, log_interval=1, summary_interval=10,
            checkpoint_interval=2, debug_nans=False, profile_dir=None,
            profile_start=0, profile_steps=0, num_devices=8, model_parallel=2)
        train_acoustic.train(args)
        files = os.listdir(tmp_path / 'run')
        assert any(f.startswith('ckpt_') for f in files)


class TestVocoderCLIMesh:
    def test_one_epoch_dp(self, corpus, tmp_path):
        from transtacos_retunegan_tpu.train import train_vocoder
        cfg = tiny_cfg(batch_size=4)
        cfg = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder, disc_width_mult=0.25))
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            finetune=True, epochs=1, stdout_interval=1, summary_interval=100,
            validation_interval=100, checkpoint_interval=1, debug_nans=False,
            num_devices=4, model_parallel=1)
        train_vocoder.train(args)
        files = os.listdir(tmp_path / 'run')
        assert any(f.startswith('g_') for f in files)


class TestVocoderCLI:
    def test_one_epoch(self, corpus, tmp_path):
        from transtacos_retunegan_tpu.train import train_vocoder
        cfg = tiny_cfg()
        cfg_path = cfg.save(str(tmp_path / 'cfgdir'))
        args = types.SimpleNamespace(
            data_dir=corpus, log_path=str(tmp_path / 'run'), config=cfg_path,
            finetune=True, epochs=1, stdout_interval=1, summary_interval=100,
            validation_interval=100, checkpoint_interval=2, debug_nans=False)
        train_vocoder.train(args)
        files = os.listdir(tmp_path / 'run')
        assert any(f.startswith('g_') for f in files)
        assert any(f.startswith('do_') for f in files)
        assert 'rtg.log' in files
