"""Objective quality metrics: multi-res spectral distance, MCD, PESQ harness.

Capability rebuild of the reference's manual evaluation tooling
(``retunegan/tools/test_pesq.py`` and the validation mstft metric).  PESQ
itself needs the third-party ``pesq`` package (not in this image); the
harness uses it when importable and otherwise reports the first-party
metrics only.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from scipy import signal as sps

from ..audio import features as F
from ..audio import transforms as T
from ..config import AudioConfig, Config


def align_lengths(a: np.ndarray, b: np.ndarray):
    n = min(len(a), len(b))
    return a[:n], b[:n]


def multi_stft_distance(y: np.ndarray, y_hat: np.ndarray, cfg: Config) -> float:
    """Same quantity the vocoder validates on (mean L1 of mel + log-mel over
    the configured resolutions)."""
    y, y_hat = align_lengths(y, y_hat)
    total = 0.0
    for n_fft, win, hop in cfg.vocoder.multi_stft_params:
        basis = T._mel_basis(cfg.audio, n_fft)
        s_r = np.abs(F.stft_np(y, n_fft, hop, win, cfg.audio.window_fn)) + 1e-9
        s_g = np.abs(F.stft_np(y_hat, n_fft, hop, win, cfg.audio.window_fn)) + 1e-9
        m_r, m_g = basis @ s_r, basis @ s_g
        total += np.mean(np.abs(m_r - m_g))
        total += np.mean(np.abs(np.log(np.maximum(m_r, 1e-12))
                                - np.log(np.maximum(m_g, 1e-12))))
    return float(total / len(cfg.vocoder.multi_stft_params))


def mel_cepstral_distortion(y: np.ndarray, y_hat: np.ndarray,
                            cfg: AudioConfig, n_mfcc: int = 13) -> float:
    """MCD (dB) over mel-cepstra via DCT of log-mel."""
    y, y_hat = align_lengths(y, y_hat)

    def mfcc(w):
        m = T.get_mel(w, cfg)                      # [M, T] log-mel
        from scipy.fftpack import dct
        return dct(m, axis=0, norm='ortho')[1:n_mfcc + 1]

    c_r, c_g = mfcc(y), mfcc(y_hat)
    t = min(c_r.shape[1], c_g.shape[1])
    diff = c_r[:, :t] - c_g[:, :t]
    return float((10.0 / np.log(10)) * np.sqrt(2.0)
                 * np.mean(np.sqrt(np.sum(diff ** 2, axis=0))))


def snr_db(y: np.ndarray, y_hat: np.ndarray) -> float:
    y, y_hat = align_lengths(y, y_hat)
    noise = y - y_hat
    return float(10 * np.log10((np.sum(y ** 2) + 1e-12)
                               / (np.sum(noise ** 2) + 1e-12)))


def pesq_wb(y: np.ndarray, y_hat: np.ndarray, sr: int) -> Optional[float]:
    """Wideband PESQ at 16 kHz (reference ``test_pesq.py:11-34``); None when
    the ``pesq`` package is unavailable."""
    try:
        from pesq import pesq  # type: ignore
    except ImportError:
        return None
    y, y_hat = align_lengths(y, y_hat)
    if sr != 16000:
        g = np.gcd(sr, 16000)
        y = sps.resample_poly(y, 16000 // g, sr // g)
        y_hat = sps.resample_poly(y_hat, 16000 // g, sr // g)
    return float(pesq(16000, y, y_hat, 'wb'))


def evaluate_pair(y: np.ndarray, y_hat: np.ndarray, cfg: Config) -> Dict[str, float]:
    out = {
        'mstft': multi_stft_distance(y, y_hat, cfg),
        'mcd': mel_cepstral_distortion(y, y_hat, cfg.audio),
        'snr_db': snr_db(y, y_hat),
    }
    p = pesq_wb(y, y_hat, cfg.audio.sample_rate)
    if p is not None:
        out['pesq_wb'] = p
    return out


def evaluate_dirs(ref_dir: str, gen_dir: str, cfg: Optional[Config] = None,
                  suffix: str = '.gen.wav') -> Dict[str, float]:
    """Score generated wavs against same-named references (the
    ``test_pesq.py`` folder-sweep capability)."""
    cfg = cfg or Config()
    agg: Dict[str, list] = {}
    for fn in sorted(os.listdir(ref_dir)):
        if not fn.endswith('.wav'):
            continue
        gen_fp = os.path.join(gen_dir, fn.replace('.wav', suffix))
        if not os.path.exists(gen_fp):
            gen_fp = os.path.join(gen_dir, fn)
            if not os.path.exists(gen_fp):
                continue
        y = F.load_wav(os.path.join(ref_dir, fn), cfg.audio)
        y_hat = F.load_wav(gen_fp, cfg.audio)
        for k, v in evaluate_pair(y, y_hat, cfg).items():
            agg.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in agg.items()}
