"""Calibration of the first-party ``pesq_proxy`` against degradation ladders.

Round-3 verdict weak item 5: the proxy (``eval/metrics.py::pesq_proxy``) had
never been validated to rank-order known degradations the way real PESQ does
(reference harness: ``retunegan/tools/test_pesq.py:17-34``).  These tests pin
monotonicity over three independent ladders on a speech-like utterance:

* additive white noise at 30/20/10/0 dB SNR (P.862's canonical sweep),
* Griffin-Lim phase reconstruction at 1/4/30 iterations,
* mu-law re-quantization at 8/5/3/2 bits.

They also pin that the PRIMARY metrics (mstft, MCD -- standard quantities)
rank the noise ladder the same way, so any future proxy regression is
caught against a trusted ordering.
"""

import numpy as np
import pytest

from transtacos_retunegan_tpu.audio import transforms as T
from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.eval.metrics import (mel_cepstral_distortion,
                                                   multi_stft_distance,
                                                   pesq_proxy)
from transtacos_retunegan_tpu.tools.synth_corpus import synth_utterance

MARGIN = 0.03          # adjacent rungs must differ by at least this much


@pytest.fixture(scope='module')
def cfg():
    return Config()


@pytest.fixture(scope='module')
def speech(cfg):
    """~2 s articulatory speech-like utterance (deterministic)."""
    y, _ = synth_utterance('ni3 hao3 shi4 jie4 zhong1 guo2', cfg,
                           np.random.RandomState(0))
    return y


def _add_noise(y, snr_db, seed=1):
    r = np.random.RandomState(seed)
    n = r.randn(len(y))
    n *= np.sqrt(np.mean(y ** 2) / np.mean(n ** 2) / 10 ** (snr_db / 10))
    return (y + n).astype(np.float32)


def _mulaw(y, bits):
    mu = 2 ** bits - 1
    c = np.sign(y) * np.log1p(mu * np.abs(np.clip(y, -1, 1))) / np.log1p(mu)
    q = np.round((c + 1) / 2 * mu) / mu * 2 - 1
    return (np.sign(q) * np.expm1(np.abs(q) * np.log1p(mu)) / mu
            ).astype(np.float32)


def _strictly_decreasing(scores):
    return all(a - b >= MARGIN for a, b in zip(scores, scores[1:]))


class TestPesqProxyCalibration:
    def test_identity_scores_max(self, cfg, speech):
        assert pesq_proxy(speech, speech, cfg.audio.sample_rate) >= 4.45

    def test_noise_ladder_monotone(self, cfg, speech):
        """30 > 20 > 10 > 0 dB SNR, all strictly below clean."""
        sr = cfg.audio.sample_rate
        scores = [pesq_proxy(speech, _add_noise(speech, snr), sr)
                  for snr in (30, 20, 10, 0)]
        assert _strictly_decreasing([4.5] + scores), scores
        # anchors from the docstring's intended curve shape
        assert scores[1] > 3.5 and scores[3] < 3.0     # 20 dB good, 0 dB bad

    def test_griffin_lim_ladder_monotone(self, cfg, speech):
        """More GL iterations -> better phase -> higher score."""
        au = cfg.audio
        mag = np.abs(T.stft_np(speech, au.n_fft, au.hop_length,
                               au.win_length, au.window_fn))
        scores = [pesq_proxy(
            speech,
            T.griffin_lim(mag, it, au, length=len(speech), seed=7),
            au.sample_rate) for it in (30, 4, 1)]
        assert all(a - b >= 0.02 for a, b in zip(scores, scores[1:])), scores

    def test_mulaw_ladder_monotone(self, cfg, speech):
        """Coarser quantization -> lower score."""
        sr = cfg.audio.sample_rate
        scores = [pesq_proxy(speech, _mulaw(speech, b), sr)
                  for b in (8, 5, 3, 2)]
        assert _strictly_decreasing(scores), scores

    def test_primary_metrics_agree_on_noise_ladder(self, cfg, speech):
        """mstft and MCD (the primary, standard metrics) must rank the same
        noise ladder in the same direction the proxy does."""
        degraded = [_add_noise(speech, snr) for snr in (30, 20, 10, 0)]
        mstfts = [multi_stft_distance(speech, d, cfg) for d in degraded]
        mcds = [mel_cepstral_distortion(speech, d, cfg.audio)
                for d in degraded]
        assert all(a < b for a, b in zip(mstfts, mstfts[1:])), mstfts
        assert all(a < b for a, b in zip(mcds, mcds[1:])), mcds
