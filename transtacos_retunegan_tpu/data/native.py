"""ctypes bindings for the native host DSP library (``native/ttsdsp.cpp``).

The vocoder data pipeline's CPU hot spot is per-utterance Griffin-Lim
template generation; ``libttsdsp.so`` provides a C++ radix-2-FFT
implementation with identical conventions.  Falls back to the numpy path
transparently when the library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from ..config import AudioConfig

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, 'native', 'libttsdsp.so'),
    os.path.join(os.path.dirname(__file__), 'libttsdsp.so'),
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.ttsdsp_stft_mag.restype = ctypes.c_int
            lib.ttsdsp_stft_mag.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_int, f32p]
            lib.ttsdsp_griffin_lim.restype = ctypes.c_int
            lib.ttsdsp_griffin_lim.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.c_int64,
                ctypes.c_uint64, f32p]
            lib.ttsdsp_rms.restype = ctypes.c_int
            lib.ttsdsp_rms.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_int, f32p]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def stft_mag(y: np.ndarray, n_fft: int, hop: int, win: int) -> Optional[np.ndarray]:
    """|STFT| as [F, T] float32, or None when the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, np.float32)
    nf = 1 + len(y) // hop
    half = n_fft // 2 + 1
    out = np.empty((nf, half), np.float32)
    got = lib.ttsdsp_stft_mag(_fptr(y), len(y), n_fft, hop, win, _fptr(out))
    assert got == nf, (got, nf)
    return out.T


def griffin_lim(mag: np.ndarray, n_iter: int, cfg: AudioConfig,
                momentum: float = 0.0, length: Optional[int] = None,
                seed: int = 114514) -> Optional[np.ndarray]:
    """mag [F, T] (already power-raised) -> waveform float32, or None."""
    lib = _load()
    if lib is None:
        return None
    half, nf = mag.shape
    if length is None:
        length = cfg.hop_length * (nf - 1)
    magc = np.ascontiguousarray(mag.T, np.float32)   # frame-major
    out = np.empty(length, np.float32)
    lib.ttsdsp_griffin_lim(_fptr(magc), nf, 2 * (half - 1), cfg.hop_length,
                           cfg.win_length, n_iter, momentum, length,
                           seed, _fptr(out))
    return out


def inv_log_mag(log_mag: np.ndarray, cfg: AudioConfig,
                length: Optional[int] = None) -> Optional[np.ndarray]:
    """Native fast path for ``transforms.inv_log_mag`` (vocoder GL template)."""
    lib = _load()
    if lib is None:
        return None
    s = np.exp(log_mag.astype(np.float64))
    if s.shape[0] == cfg.n_freq - 1:
        s = np.concatenate([np.zeros([1, s.shape[1]]), s], axis=0)
    s = (s ** cfg.gl_power).astype(np.float32)
    y = griffin_lim(s, cfg.gl_iters_vocoder, cfg, momentum=cfg.gl_momentum,
                    length=length, seed=cfg.randseed)
    return y


def rms(y: np.ndarray, frame: int, hop: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, np.float32)
    nf = 1 + len(y) // hop
    out = np.empty(nf, np.float32)
    lib.ttsdsp_rms(_fptr(y), len(y), frame, hop, _fptr(out))
    return out
