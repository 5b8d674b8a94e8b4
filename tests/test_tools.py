"""Light tests for the tools package (corpus stats, param counts)."""

import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.tools import corpus_stats, param_counts

pytestmark = pytest.mark.smoke


class TestCorpusStats:
    def test_feature_ranges_and_durations(self, tmp_path):
        rng = np.random.RandomState(0)
        for i in range(3):
            np.save(tmp_path / f'f0-u{i}.npy',
                    (100 + 50 * rng.rand(40)).astype(np.float32))
            np.save(tmp_path / f'c0-u{i}.npy',
                    (0.01 + 0.2 * rng.rand(40)).astype(np.float32))
            np.save(tmp_path / f'mel-u{i}.npy',
                    rng.randn(80, 40 + i).astype(np.float32))
        # on-disk contract is name|prds|text (see preprocess.write_metadata)
        (tmp_path / 'train.txt').write_text(
            'u0|04|ni3 hao3\nu1|04|zhong1 guo2\n', encoding='utf-8')

        r = corpus_stats.feature_ranges(str(tmp_path))
        assert 100 <= r['f0min'] <= r['f0max'] <= 150
        assert r['n_utterances'] == 3

        d = corpus_stats.duration_stats(str(tmp_path), Config())
        assert d['n'] == 3 and d['min_frames'] == 40

        inv = corpus_stats.symbol_inventory(str(tmp_path))
        assert inv['pinyins']['ni3'] == 1
        assert 'zh' in inv['phones']


class TestGetLogger:
    def test_file_handler_repoints_per_run(self, tmp_path):
        """logging caches loggers by name; a second train run in the same
        process must get its own log file (was: second run's rtg.log never
        created -- flaky TestVocoderCLI failure when a mesh test ran first)."""
        import os
        from transtacos_retunegan_tpu.utils.logging import get_logger
        l1 = get_logger('vocoder_t', str(tmp_path / 'a' / 'run.log'))
        l1.info('one')
        l2 = get_logger('vocoder_t', str(tmp_path / 'b' / 'run.log'))
        l2.info('two')
        assert (tmp_path / 'a' / 'run.log').exists()
        assert (tmp_path / 'b' / 'run.log').exists()
        assert 'two' not in (tmp_path / 'a' / 'run.log').read_text()
        assert 'two' in (tmp_path / 'b' / 'run.log').read_text()


TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 0.4
            text = "ni3"
        intervals [2]:
            xmin = 0.4
            xmax = 1.0
            text = "hao3"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = "n"
        intervals [2]:
            xmin = 0.2
            xmax = 0.4
            text = "i"
        intervals [3]:
            xmin = 0.4
            xmax = 1.0
            text = "h"
'''


class TestTextGrid:
    def test_parse_and_stats(self, tmp_path):
        """First-party Praat parser + per-label duration stats
        (reference ``stats/DataBaker_gen_stat.py:1-33``)."""
        (tmp_path / 'utt0.TextGrid').write_text(TEXTGRID, encoding='utf-8')
        tiers = corpus_stats.read_textgrid(str(tmp_path / 'utt0.TextGrid'))
        assert set(tiers) == {'words', 'phones'}
        assert tiers['words'] == [(0.0, 0.4, 'ni3'), (0.4, 1.0, 'hao3')]

        stats = corpus_stats.textgrid_duration_stats(str(tmp_path), 'phones')
        assert stats['n']['freq'] == 1
        assert stats['h']['mean'] == pytest.approx(0.6)

        out_csv = tmp_path / 'stat-phones.csv'
        corpus_stats.write_duration_csv(stats, str(out_csv))
        lines = out_csv.read_text().strip().split('\n')
        assert lines[0] == ',freq,mean,std,min,max'
        assert len(lines) == 4


class TestVbanks:
    def test_speaker_split(self, tmp_path):
        """THCHS-30 voice-bank splits (``stats/thchs30_gen_vbanks.py``)."""
        rows = ['A8_17|000|ni3 hao3',       # male
                'B8_3|00|da4 jia1',         # male
                'A2_1|0|hao3',              # female_power
                'A13_9|00|zai4 jian4',      # child
                'Z9_1|0|wu2']               # unknown speaker: in no bank
        (tmp_path / 'train.txt').write_text('\n'.join(rows), encoding='utf-8')
        counts = corpus_stats.gen_vbanks(str(tmp_path))
        assert counts == {'male': 2, 'female_power': 1, 'female_soft': 0,
                          'child': 1}
        male = (tmp_path / 'vbank_male.txt').read_text().strip().split('\n')
        assert male == ['A8_17|000|ni3 hao3', 'B8_3|00|da4 jia1']
        assert (tmp_path / 'vbank_female_soft.txt').read_text() == ''


class TestParamCounts:
    def test_reference_parity(self):
        counts = param_counts.generator_counts(Config())
        for name, ref in param_counts.REFERENCE.items():
            assert abs(counts[name] - ref) / ref < 0.001, (name, counts[name], ref)

    def test_acoustic_count_plausible(self):
        n = param_counts.acoustic_count(Config())
        assert 5_000_000 < n < 20_000_000


class TestSpec2Wavset:
    def test_exact_bin_sinusoids_reconstruct(self):
        """Sinusoid-bank templates are amplitude-calibrated: carriers at
        exact bin centers reconstruct to a few % spectral error
        (reference ``retunegan/tools/spec2wavset.py:5-16``)."""
        from transtacos_retunegan_tpu.config import AudioConfig
        from transtacos_retunegan_tpu.tools import dsp_studies as D
        cfg = AudioConfig()
        sr = cfg.sample_rate
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * (20 * sr / 2048) * t)
             + 0.25 * np.sin(2 * np.pi * (41 * sr / 2048) * t))
        out = D.study_spec2wavset(cfg, y, fft_params=((2048, 1024, 256),))
        r = out['n_fft=2048']
        assert r['spectral_convergence'] < 0.1
        assert r['wav_rel_l1'] < 0.1
        assert r['peak_bin_fraction'] < 0.02     # sinusoid sets are sparse

    def test_speechlike_signal_spectrally_faithful(self):
        """Off-bin/AM content: spectrum stays close while the waveform
        decorrelates -- the study's documented design property."""
        from transtacos_retunegan_tpu.config import AudioConfig
        from transtacos_retunegan_tpu.tools import dsp_studies as D
        cfg = AudioConfig()
        out = D.study_spec2wavset(cfg, D._test_signal(cfg))
        for key in ('n_fft=2048', 'n_fft=1024', 'n_fft=512'):
            assert out[key]['spectral_convergence'] < 0.35, (key, out[key])


class TestAlignmentDiagonality:
    def test_diagonal_vs_flat(self):
        from transtacos_retunegan_tpu.eval.metrics import alignment_diagonality
        n, t = 12, 36
        diag = np.zeros((n, t))
        for j in range(t):
            diag[min(j * n // t, n - 1), j] = 1.0
        flat = np.full((n, t), 1.0 / n)
        d1, d2 = alignment_diagonality(diag), alignment_diagonality(flat)
        assert d1['diagonality'] > 0.98
        assert d1['focus'] == pytest.approx(1.0)
        assert d1['coverage'] == pytest.approx(1.0)
        assert d2['diagonality'] == 0.0
        assert d2['focus'] == pytest.approx(1.0 / n)

    def test_mass_coverage_sees_short_tokens_argmax_misses(self):
        """A token spoken for < 1 decode step never wins an argmax but its
        attention mass is still visible: mass_coverage must credit it."""
        from transtacos_retunegan_tpu.eval.metrics import alignment_diagonality
        n, t = 4, 6
        a = np.zeros((n, t))
        # tokens 0/1/3 each own two steps outright; short token 2 only ever
        # gets 40% of steps 3 and 4 (argmax goes to its neighbours)
        a[0, 0] = a[0, 1] = 1.0
        a[1, 2] = 1.0
        a[1, 3] = 0.6
        a[2, 3] = 0.4
        a[2, 4] = 0.4
        a[3, 4] = 0.6
        a[3, 5] = 1.0
        d = alignment_diagonality(a)
        assert d['coverage'] == pytest.approx(3 / 4)       # argmax misses #2
        assert d['mass_coverage'] == pytest.approx(1.0)    # mass 0.8 >= 0.25
        # a token with only leakage-level mass stays uncovered
        a[2, 3] = a[2, 4] = 0.05
        a[1, 3], a[3, 4] = 0.95, 0.95
        assert alignment_diagonality(a)['mass_coverage'] == pytest.approx(3 / 4)


class TestItemMaskedLosses:
    def test_excludes_pad_tail_the_batch_max_mask_charges(self):
        """Per-item masks stop at each row's round_up(len+1, r); the
        reference batch-max mask (compute_losses) charges short rows for the
        whole batch tail.  Poison the short row's tail and only the batch-max
        numbers may move."""
        import dataclasses

        import jax.numpy as jnp

        from transtacos_retunegan_tpu.config import Config
        from transtacos_retunegan_tpu.tools.convergence_session import (
            item_masked_losses)

        cfg = Config()
        r = cfg.acoustic.outputs_per_step
        b, t_pad, m = 2, 8 * r, 3
        spec_lengths = jnp.asarray([2 * r - 1, 8 * r - 1])  # short, long row
        batch = {
            'spec_lengths': spec_lengths,
            'mel_targets': jnp.zeros((b, t_pad, m)),
            'mag_targets': jnp.zeros((b, t_pad, m)),
            'stop_token_targets': jnp.ones((b, t_pad)),
        }
        out = {
            'mel_outputs': jnp.zeros((b, t_pad, m)),
            'mag_outputs': jnp.zeros((b, t_pad, m)),
            'stop_token_outputs': jnp.full((b, t_pad), 50.0),  # stop CE ~ 0
        }
        clean = item_masked_losses(out, batch, cfg)
        assert clean['mel_l1'] == pytest.approx(0.0, abs=1e-6)
        assert clean['stop_ce'] == pytest.approx(0.0, abs=1e-6)

        # poison the short row BEYOND its per-item mask (rows 2r..t_pad)
        out_bad = {
            'mel_outputs': out['mel_outputs'].at[0, 2 * r:].set(7.0),
            'mag_outputs': out['mag_outputs'],
            'stop_token_outputs': out['stop_token_outputs']
                .at[0, 2 * r:].set(-50.0),
        }
        poisoned = item_masked_losses(out_bad, batch, cfg)
        assert poisoned['mel_l1'] == pytest.approx(float(clean['mel_l1']),
                                                   abs=1e-6)
        assert poisoned['stop_ce'] == pytest.approx(float(clean['stop_ce']),
                                                    abs=1e-6)

        # the batch-max mask sees the poison (this is the 6k-vs-20k artifact)
        from transtacos_retunegan_tpu.models.acoustic import compute_losses
        full = dict(batch, frame_loss_len=jnp.asarray(t_pad),
                    text_loss_len=jnp.asarray(1),
                    text=jnp.zeros((b, 1, 2), jnp.int32),
                    prds=jnp.zeros((b, 1), jnp.int32))
        out_cl = dict(out_bad, E_text_sim=jnp.zeros((4, 4)),
                      E_prds_sim=jnp.zeros((cfg.audio.n_prds,
                                            cfg.audio.n_prds)),
                      prds_prob=jnp.zeros((b, 1, cfg.audio.n_prds)))
        hp = dataclasses.replace(cfg.acoustic, encoder_type='cbhg',
                                 encoder_fusenet=False)
        losses = compute_losses(out_cl, full, dataclasses.replace(
            cfg, acoustic=hp), {})
        assert float(losses['mag_loss']) > 1.0        # mel L1 (swapped name)
        assert float(losses['stop_token_loss']) > 10.0


class TestAdviceFixes:
    def test_pesq_proxy_short_signal_continuous(self):
        """<2 frames: nearly-identical clips must score near 4.5, not 1.0."""
        from transtacos_retunegan_tpu.eval import metrics
        rng = np.random.RandomState(0)
        y = rng.randn(400).astype(np.float64) * 0.1
        almost = y + 1e-6 * rng.randn(400)
        assert metrics.pesq_proxy(y, almost, 16000) > 4.0
        assert metrics.pesq_proxy(y, -y, 16000) < 3.0

    def test_scale_ch_widening(self):
        from transtacos_retunegan_tpu.models.discriminators import _scale_ch
        assert _scale_ch(64, 1.0, 4) == (64, 4)
        assert _scale_ch(64, 2.0, 4) == (128, 4)       # widen features only
        assert _scale_ch(64, 0.25, 4) == (16, 1)

    def test_get_logger_pathless_drops_file_handler(self, tmp_path):
        import logging
        from transtacos_retunegan_tpu.utils.logging import get_logger
        lg = get_logger('advice_t', str(tmp_path / 'a.log'))
        lg = get_logger('advice_t')                    # pathless follow-up
        assert not any(isinstance(h, logging.FileHandler) for h in lg.handlers)
