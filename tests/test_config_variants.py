"""Coverage for non-default config branches: CBHG encoder, seq g2p,
force/random teacher forcing, relativistic GAN, env/sm losses, phase-input
MTD, split generators, dy templates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.text.symbols import get_vocab_size
from transtacos_retunegan_tpu.train.acoustic_step import init_state, train_step
from transtacos_retunegan_tpu.train.vocoder_step import (gan_train_step,
                                                         init_gan_state)

BASE = Config()


def acoustic_cfg(**kw):
    small = dict(embed_depth=32, encoder_depth=32, decoder_depth=64,
                 attention_depth=16, prenet_depths=(32,), posnet_depth=64,
                 var_embed_depth=16, var_prednet_depth=16, prdsnet_depth=16,
                 posenc_depth=8)
    small.update(kw)
    return dataclasses.replace(BASE, acoustic=dataclasses.replace(
        BASE.acoustic, **small))


def acoustic_batch(cfg, b=2, n=12, t=20, seed=0):
    rng = np.random.RandomState(seed)
    vocab = get_vocab_size(cfg.acoustic.g2p)
    return {
        'text': jnp.asarray(np.stack([rng.randint(4, vocab, (b, n)),
                                      rng.randint(0, 6, (b, n))], -1)),
        'text_lengths': jnp.asarray([n, n - 3]),
        'prds': jnp.asarray(rng.randint(0, 6, (b, n))),
        'spec_lengths': jnp.asarray([t, t - 5]),
        'mel_targets': jnp.asarray(rng.randn(b, t, 80).astype(np.float32)),
        'mag_targets': jnp.asarray(rng.randn(b, t, 1024).astype(np.float32)),
        'f0_targets': jnp.asarray(rng.randint(0, BASE.audio.n_f0_bins, (b, t))),
        'c0_targets': jnp.asarray(rng.randint(0, 32, (b, t))),
        'stop_token_targets': jnp.zeros((b, t), jnp.float32),
        'frame_loss_len': jnp.asarray(t),
        'text_loss_len': jnp.asarray(n),
    }


class TestAcousticVariants:
    @pytest.mark.parametrize('kw', [
        dict(encoder_type='cb'),
        dict(g2p='seq'),
        dict(tf_method='force'),
        dict(tf_method='random'),
        dict(encoder_fusenet=False),
        dict(decoder_sew_layer=True),
    ], ids=['cbhg', 'seq-g2p', 'tf-force', 'tf-random', 'no-fusenet', 'sew'])
    def test_train_step_runs(self, kw):
        cfg = acoustic_cfg(**kw)
        batch = acoustic_batch(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        state, losses = train_step(cfg, state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses['loss'])), kw

    def test_cbhg_infer(self):
        from transtacos_retunegan_tpu.train.acoustic_step import infer_step
        cfg = acoustic_cfg(encoder_type='cb', max_iters=4)
        batch = acoustic_batch(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        out = infer_step(cfg, state.params,
                         {'text': batch['text'],
                          'text_lengths': batch['text_lengths']}, 4,
                         state.extra_vars)
        assert out['mag_outputs'].shape == (2, 20, 1024)


def vocoder_cfg(**kw):
    small = dict(upsample_initial_channel=32,
                 multi_stft_params=((512, 256, 60),), d_train_times=1)
    small.update(kw)
    return dataclasses.replace(BASE, vocoder=dataclasses.replace(
        BASE.vocoder, **small))


def vocoder_batch(cfg, b=2, seg=2048, seed=0):
    rng = np.random.RandomState(seed)
    fr = seg // 256
    if cfg.vocoder.split_cv:
        return {
            'mel_c': jnp.asarray(rng.randn(b, fr, 80).astype(np.float32)),
            'mel_v': jnp.asarray(rng.randn(b, fr, 80).astype(np.float32)),
            'tmpl_c': jnp.asarray((rng.randn(b, seg) * .1).astype(np.float32)),
            'tmpl_v': jnp.asarray((rng.randn(b, seg) * .1).astype(np.float32)),
            'uv': jnp.asarray((rng.rand(b, seg) > .5).astype(np.float32)),
            'wav': jnp.asarray((rng.randn(b, seg) * .1).astype(np.float32)),
        }
    return {
        'mel': jnp.asarray(rng.randn(b, fr, 80).astype(np.float32)),
        'tmpl': jnp.asarray((rng.randn(b, seg) * .1).astype(np.float32)),
        'wav': jnp.asarray((rng.randn(b, seg) * .1).astype(np.float32)),
    }


class TestVocoderVariants:
    @pytest.mark.parametrize('kw', [
        dict(relative_gan_loss=True),
        dict(envelope_loss=True, strip_mirror_loss=True),
        dict(phd_input='phase'),
        dict(generator_ver='MelGANSplit'),
        dict(generator_ver='HiFiGAN'),
    ], ids=['relativistic', 'env-sm-losses', 'phd-phase', 'split-cv', 'hifigan'])
    def test_gan_step_runs(self, kw):
        cfg = vocoder_cfg(**kw)
        batch = vocoder_batch(cfg)
        state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, 10)
        state, m = gan_train_step(cfg, state, batch, jax.random.PRNGKey(1), 10)
        assert np.isfinite(float(m['loss_gen_all'])), kw
        assert np.isfinite(float(m['loss_disc_all'])), kw

    def test_dy_template_dataset(self, tmp_path):
        """ref_wav='dy' first-difference template mode (retunegan/data.py:82-84)."""
        import dataclasses as dc
        from transtacos_retunegan_tpu.audio import features as F
        from transtacos_retunegan_tpu.data import preprocess as P
        from transtacos_retunegan_tpu.data.vocoder_data import VocoderDataset
        cfg = dc.replace(BASE, audio=dc.replace(BASE.audio, ref_wav='dy'))
        base = tmp_path
        (base / 'wavs').mkdir()
        rng = np.random.RandomState(0)
        rows = []
        for i in range(3):
            t = np.arange(11025 + i * 999) / 22050
            y = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
            F.save_wav(y, str(base / 'wavs' / f'u{i}.wav'), cfg.audio)
            rows.append(f'u{i}|ni3 hao3|04')
        (base / 'meta.csv').write_text('\n'.join(rows))
        P.preprocess_generic(str(base), 'proc', str(base / 'meta.csv'),
                             wav_dir='wavs', num_workers=1)
        ds = VocoderDataset('train', str(base / 'proc'), cfg, finetune=False)
        item = ds[0]
        assert item['tmpl'].shape == (cfg.audio.segment_size,)
        assert np.isfinite(item['tmpl']).all()

    def test_finetune_template_disk_cache(self, tmp_path):
        """Finetune-mode GL templates disk-cache next to the features: a
        second dataset instance (fresh process in real runs) reloads the
        identical template without recomputing; a stale-length cache entry
        is recomputed, not trusted."""
        import dataclasses as dc
        import os
        from transtacos_retunegan_tpu.audio import features as F
        from transtacos_retunegan_tpu.data import preprocess as P
        from transtacos_retunegan_tpu.data.vocoder_data import VocoderDataset
        cfg = BASE
        base = tmp_path
        (base / 'wavs').mkdir()
        rows = []
        for i in range(2):
            t = np.arange(11025 + i * 999) / 22050
            y = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
            F.save_wav(y, str(base / 'wavs' / f'u{i}.wav'), cfg.audio)
            rows.append(f'u{i}|ni3 hao3|04')
        (base / 'meta.csv').write_text('\n'.join(rows))
        P.preprocess_generic(str(base), 'proc', str(base / 'meta.csv'),
                             wav_dir='wavs', num_workers=1)
        proc = str(base / 'proc')
        # test split: deterministic (no crop/aug), so items compare exactly
        ds1 = VocoderDataset('train', proc, cfg, finetune=True, train=False)
        a = ds1[0]['tmpl'].copy()
        caches = [f for f in os.listdir(proc) if f.startswith('tmpl')]
        assert caches, os.listdir(proc)
        ds2 = VocoderDataset('train', proc, cfg, finetune=True, train=False)
        np.testing.assert_array_equal(a, ds2[0]['tmpl'])
        # corrupt one cache with a wrong-length array: must recompute
        fp = os.path.join(proc, sorted(caches)[0])
        np.save(fp.removesuffix('.npy'), np.zeros(7, np.float32))
        ds3 = VocoderDataset('train', proc, cfg, finetune=True, train=False)
        np.testing.assert_array_equal(a, ds3[0]['tmpl'])


class TestProdPreset:
    def test_prod_preset_loads_by_name(self):
        """`--config prod` resolves to the measured bs64 recipe without a
        file on disk; everything else stays at reference defaults."""
        cfg = Config.load('prod')
        assert cfg.acoustic.batch_size == 64
        assert cfg.vocoder.batch_size == 64
        # bs64 GAN measurably needs the R1 stabilizer
        # (docs/convergence_r5/gan_bs64 vs gan_bs64_r1)
        assert cfg.vocoder.r1_gamma == 0.5
        base = Config()
        assert cfg.audio == base.audio
        assert dataclasses.replace(cfg.acoustic, batch_size=16) == base.acoustic
        assert dataclasses.replace(cfg.vocoder, batch_size=16,
                                   r1_gamma=0.0) == base.vocoder

    def test_prod_preset_round_trips_through_run_dir(self, tmp_path):
        """Training freezes the preset into the run dir; reloading the
        frozen file reproduces it (same contract as file configs)."""
        cfg = Config.load('prod')
        path = cfg.save(str(tmp_path))
        assert Config.load(path) == cfg
