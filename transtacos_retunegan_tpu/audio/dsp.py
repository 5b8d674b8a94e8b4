"""Batched, jittable JAX DSP: STFT / iSTFT / Griffin-Lim / companding.

This is the TPU-native replacement for the reference's librosa/scipy/torch DSP
(``transtacos/audio.py``, ``retunegan/audio.py:116-170``).  Everything here is
pure-functional, static-shape and batched, so the full synthesis path
(text -> spec -> Griffin-Lim template -> vocoder -> wav) compiles into one XLA
program.

TPU-first design note: XLA's FFT op and complex dtypes are NOT available on
the TPU backend in this environment, so the (i)STFT is expressed as
real-valued windowed-DFT *matmuls* -- ``frames @ [n_fft, n_freq]`` -- which
map straight onto the MXU systolic array and fuse with neighboring elementwise
work.  Spectra are carried as ``(real, imag)`` float pairs.

Conventions match librosa/torch.stft with ``center=True`` and reflect padding:
``n_frames = 1 + T // hop``.  Waveforms are ``[..., T]``; spectrograms are
``[..., F, n_frames]`` (freq-major, like the reference's numpy layout).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mel as melmod
from ..config import AudioConfig

EPS_AMP = 1e-5   # amplitude floor (reference ``transtacos/audio.py:13,184``)

RI = Tuple[jnp.ndarray, jnp.ndarray]   # (real, imag) spectrum pair


# ---------------------------------------------------------------------------
# DFT matrices (compile-time constants; window folded in)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _padded_window(kind: str, win_length: int, n_fft: int) -> np.ndarray:
    """Analysis window center-padded to n_fft (librosa pad_center semantics)."""
    w = melmod.window(kind, win_length)
    lpad = (n_fft - win_length) // 2
    return np.pad(w, (lpad, n_fft - win_length - lpad)).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _dft_mats(n_fft: int, win_length: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Forward windowed rDFT as two ``[n_fft, n_freq]`` matrices (cos, -sin)."""
    w = _padded_window(window, win_length, n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    fwd_cos = (w[:, None] * np.cos(ang)).astype(np.float32)
    fwd_sin = (-w[:, None] * np.sin(ang)).astype(np.float32)
    return fwd_cos, fwd_sin


@functools.lru_cache(maxsize=16)
def _idft_mats(n_fft: int, win_length: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT + synthesis window as two ``[n_freq, n_fft]`` matrices."""
    w = _padded_window(window, win_length, n_fft).astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full(n_fft // 2 + 1, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    inv_cos = ((c[:, None] / n_fft) * np.cos(ang) * w[None, :]).astype(np.float32)
    inv_sin = ((-c[:, None] / n_fft) * np.sin(ang) * w[None, :]).astype(np.float32)
    return inv_cos, inv_sin


def n_frames_for(num_samples: int, hop_length: int) -> int:
    return 1 + num_samples // hop_length


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad (reflect) and frame: ``[..., T] -> [..., n_frames, n_fft]``.

    Implemented as hop-aligned reshape + static slices (no generic gather):
    frame starts are multiples of ``hop``, so the padded signal reshapes into
    hop-sized blocks and each frame is a static window of ``m`` blocks.  This
    compiles to cheap slices on both CPU and TPU.
    """
    pad = n_fft // 2
    t = y.shape[-1]
    nf = n_frames_for(t, hop_length)
    m = -(-n_fft // hop_length)          # blocks per frame (ceil)
    ypad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode='reflect')
    need = hop_length * (nf - 1) + m * hop_length
    extra = need - ypad.shape[-1]
    if extra > 0:
        ypad = jnp.pad(ypad, [(0, 0)] * (y.ndim - 1) + [(0, extra)])
    blocks = ypad[..., :need].reshape(y.shape[:-1] + (nf - 1 + m, hop_length))
    frames = jnp.concatenate([blocks[..., j:j + nf, :] for j in range(m)], axis=-1)
    return frames[..., :n_fft]


# ---------------------------------------------------------------------------
# STFT / iSTFT (real-valued matmul formulation)
# ---------------------------------------------------------------------------

def stft_ri(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
            window: str = 'hann',
            precision=jax.lax.Precision.HIGHEST) -> RI:
    """STFT as (real, imag) pair: ``[..., T] -> 2 x [..., n_fft//2+1, n_frames]``.

    Matches ``librosa.stft``/``torch.stft`` (center=True, reflect pad,
    one-sided, unnormalized).  Reference: ``transtacos/audio.py:143-144``,
    ``retunegan/audio.py:161-163``.

    Default HIGHEST precision: the TPU MXU's single-pass bf16 is too coarse
    for a 2048-tap DFT where analysis parity matters (~1e-4 relative with
    3-pass f32).  Pass ``Precision.DEFAULT`` on rough paths (e.g. the 4-iter
    Griffin-Lim template) for ~3x MXU throughput.
    """
    cmat, smat = _dft_mats(n_fft, win_length, window)
    frames = frame_signal(y, n_fft, hop_length)
    re = jnp.einsum('...tn,nk->...kt', frames, jnp.asarray(cmat),
                    precision=precision)
    im = jnp.einsum('...tn,nk->...kt', frames, jnp.asarray(smat),
                    precision=precision)
    return re, im


def stft_mag(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
             window: str = 'hann') -> jnp.ndarray:
    """|STFT| magnitude ``[..., F, n_frames]``."""
    re, im = stft_ri(y, n_fft, hop_length, win_length, window)
    return jnp.sqrt(re * re + im * im)


@functools.lru_cache(maxsize=32)
def _ola_norm(n_frames: int, n_fft: int, hop_length: int, win_length: int,
              window: str) -> np.ndarray:
    """Sum of squared synthesis windows over the overlap-add span (constant)."""
    w2 = _padded_window(window, win_length, n_fft).astype(np.float64) ** 2
    length = n_fft + hop_length * (n_frames - 1)
    acc = np.zeros(length)
    for i in range(n_frames):
        acc[i * hop_length:i * hop_length + n_fft] += w2
    return acc.astype(np.float32)


def istft_ri(re: jnp.ndarray, im: jnp.ndarray, hop_length: int, win_length: int,
             window: str = 'hann', length: Optional[int] = None,
             precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Inverse STFT ``[..., F, n_frames] x2 -> [..., T]`` (librosa semantics).

    Applies the synthesis window, overlap-adds, divides by the window-square
    envelope and trims the center padding.  Default output length is
    ``hop * (n_frames - 1)``.
    """
    n_fft = 2 * (re.shape[-2] - 1)
    nf = re.shape[-1]
    icos, isin = _idft_mats(n_fft, win_length, window)
    frames = (jnp.einsum('...kt,kn->...tn', re, jnp.asarray(icos),
                         precision=precision)
              + jnp.einsum('...kt,kn->...tn', im, jnp.asarray(isin),
                           precision=precision))

    # hop-aligned overlap-add: pad frames to m blocks of hop samples, then
    # accumulate block j of frame i at block row i+j (static slice adds).
    m = -(-n_fft // hop_length)
    total = n_fft + hop_length * (nf - 1)
    fpad = m * hop_length - n_fft
    if fpad > 0:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, fpad)])
    fb = frames.reshape(frames.shape[:-1] + (m, hop_length))
    acc = jnp.zeros(frames.shape[:-2] + (nf - 1 + m, hop_length), dtype=frames.dtype)
    for j in range(m):
        acc = acc.at[..., j:j + nf, :].add(fb[..., :, j, :])
    out = acc.reshape(frames.shape[:-2] + ((nf - 1 + m) * hop_length,))[..., :total]

    norm = _ola_norm(nf, n_fft, hop_length, win_length, window)
    norm = np.where(norm > 1e-11, norm, 1.0).astype(np.float32)
    out = out / jnp.asarray(norm)

    pad = n_fft // 2
    out = out[..., pad:]
    if length is None:
        length = hop_length * (nf - 1)
    return out[..., :length]


# ---------------------------------------------------------------------------
# Griffin-Lim (two flavors, both jittable, complex-free)
# ---------------------------------------------------------------------------

def griffin_lim(mag: jnp.ndarray, n_iter: int, hop_length: int, win_length: int,
                window: str = 'hann', momentum: float = 0.0,
                length: Optional[int] = None,
                key: Optional[jax.Array] = None,
                precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Phase reconstruction from magnitude ``[..., F, n_frames] -> [..., T]``.

    ``momentum=0`` reproduces the acoustic-side plain alternating projection
    (``transtacos/audio.py:130-140``); ``momentum=0.7`` reproduces the fast
    librosa flavor used for the vocoder's reference waveform
    (``retunegan/audio.py:131-136``).  Random phase init, seeded.
    Phase is carried as a (cos, sin) unit pair -- no complex dtype on TPU.
    """
    if key is None:
        key = jax.random.PRNGKey(114514)
    mag = jnp.abs(mag)
    n_fft = 2 * (mag.shape[-2] - 1)
    theta = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape)
    pr, pi = jnp.cos(theta), jnp.sin(theta)
    alpha = momentum / (1.0 + momentum)

    def body(_, carry):
        pr, pi, tr, ti = carry
        y = istft_ri(mag * pr, mag * pi, hop_length, win_length, window, length,
                     precision=precision)
        rr, ri = stft_ri(y, n_fft, hop_length, win_length, window,
                         precision=precision)
        ur = rr - alpha * tr
        ui = ri - alpha * ti
        inv = 1.0 / (jnp.sqrt(ur * ur + ui * ui) + 1e-16)
        return ur * inv, ui * inv, rr, ri

    zero = jnp.zeros_like(mag)
    pr, pi, _, _ = jax.lax.fori_loop(0, n_iter, body, (pr, pi, zero, zero))
    return istft_ri(mag * pr, mag * pi, hop_length, win_length, window, length,
                    precision=precision)


# ---------------------------------------------------------------------------
# pre-emphasis (FIR forward, IIR inverse via associative scan)
# ---------------------------------------------------------------------------

def preemphasis(y: jnp.ndarray, k: float = 0.97) -> jnp.ndarray:
    """``y[i] - k * y[i-1]`` (reference ``transtacos/audio.py:64-66``)."""
    prev = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(1, 0)])[..., :-1]
    return y - k * prev


def inv_preemphasis(y: jnp.ndarray, k: float = 0.97) -> jnp.ndarray:
    """IIR inverse ``o[i] = y[i] + k * o[i-1]`` as a parallel prefix scan.

    The reference runs ``scipy.signal.lfilter([1], [1, -k])`` on host
    (``transtacos/audio.py:69-70``); here the linear recurrence is an
    ``associative_scan`` so it stays on-device inside the jitted synth path.
    """
    a = jnp.full_like(y, k)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, out = jax.lax.associative_scan(combine, (a, y), axis=-1)
    return out


# ---------------------------------------------------------------------------
# companding / normalization (reference ``transtacos/audio.py:177-196``)
# ---------------------------------------------------------------------------

def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(EPS_AMP, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(s: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    return (2 * cfg.max_abs_value * ((s - cfg.min_level_db) / -cfg.min_level_db)
            - cfg.max_abs_value)


def denormalize_db(s: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    return (((s + cfg.max_abs_value) * -cfg.min_level_db) / (2 * cfg.max_abs_value)
            + cfg.min_level_db)


def spec_to_natural_scale(spec: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Normalized model scale -> raw |STFT| scale (``transtacos/audio.py:80-82``)."""
    return db_to_amp(denormalize_db(spec, cfg) + cfg.ref_level_db)


def fix_zero_dc(s: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Re-prepend a near-zero DC row if it was dropped (``audio.py:85-90``)."""
    if s.shape[-2] == cfg.n_freq - 1:
        dc = jnp.min(s, axis=(-2, -1), keepdims=True) * 1e-2
        dc = jnp.broadcast_to(dc, s.shape[:-2] + (1, s.shape[-1]))
        s = jnp.concatenate([dc, s], axis=-2)
    return s


# ---------------------------------------------------------------------------
# composite transforms (acoustic-side; reference ``transtacos/audio.py``)
# ---------------------------------------------------------------------------

def _mel_basis_j(cfg: AudioConfig, n_fft: Optional[int] = None) -> jnp.ndarray:
    return jnp.asarray(melmod.mel_basis(cfg.sample_rate, n_fft or cfg.n_fft,
                                        cfg.n_mel, cfg.fmin, cfg.fmax,
                                        htk=cfg.mel_scale == 'htk'))


def get_specs(y: jnp.ndarray, cfg: AudioConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform -> (normalized linear spec, normalized mel spec), both [..., F/M, T].

    Reference ``transtacos/audio.py:73-77``: preemphasis -> |STFT| ->
    amp_to_db - ref_level -> normalize to [-4, 4].
    """
    d = stft_mag(preemphasis(y, cfg.preemphasis), cfg.n_fft, cfg.hop_length,
                 cfg.win_length, cfg.window_fn)
    s = amp_to_db(d) - cfg.ref_level_db
    m = amp_to_db(jnp.einsum('mf,...ft->...mt', _mel_basis_j(cfg), d)) - cfg.ref_level_db
    return normalize_db(s, cfg), normalize_db(m, cfg)


def inv_spec(spec: jnp.ndarray, cfg: AudioConfig,
             key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Normalized linear spec -> waveform via 30-iter Griffin-Lim.

    Reference ``transtacos/audio.py:93-97`` (the vocoder-free synthesis path).
    """
    s = spec_to_natural_scale(spec, cfg)
    s = fix_zero_dc(s, cfg)
    y = griffin_lim(s ** cfg.gl_power, cfg.gl_iters_acoustic, cfg.hop_length,
                    cfg.win_length, cfg.window_fn, momentum=0.0, key=key)
    return inv_preemphasis(y, cfg.preemphasis)


def inv_mel(ml: jnp.ndarray, cfg: AudioConfig,
            key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Normalized mel -> waveform via pseudo-inverse basis + Griffin-Lim
    (reference ``transtacos/audio.py:100-104``)."""
    m = spec_to_natural_scale(ml, cfg)
    inv = jnp.asarray(melmod.mel_pseudo_inverse(cfg.sample_rate, cfg.n_fft, cfg.n_mel,
                                                cfg.fmin, cfg.fmax,
                                                htk=cfg.mel_scale == 'htk'))
    s = jnp.einsum('fm,...mt->...ft', inv, m)
    y = griffin_lim(s ** cfg.gl_power, cfg.gl_iters_acoustic, cfg.hop_length,
                    cfg.win_length, cfg.window_fn, momentum=0.0, key=key)
    return inv_preemphasis(y, cfg.preemphasis)


# ---------------------------------------------------------------------------
# vocoder-side transforms (reference ``retunegan/audio.py``)
# ---------------------------------------------------------------------------

def get_mag(y: jnp.ndarray, cfg: AudioConfig, clamp_low: bool = True) -> jnp.ndarray:
    """log-magnitude spectrogram (``retunegan/audio.py:116-120``)."""
    s = stft_mag(y, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.window_fn)
    return jnp.log(jnp.clip(s, min=EPS_AMP) if clamp_low else s)


def mag_to_mel(mag_natural: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Natural-scale |STFT| -> natural-scale mel (``retunegan/audio.py:21``)."""
    return jnp.einsum('mf,...ft->...mt', _mel_basis_j(cfg), mag_natural)


def get_mel(y: jnp.ndarray, cfg: AudioConfig, clamp_low: bool = True) -> jnp.ndarray:
    """log-mel spectrogram, power=1 (``retunegan/audio.py:123-128``)."""
    s = stft_mag(y, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.window_fn)
    m = mag_to_mel(s, cfg)
    return jnp.log(jnp.clip(m, min=EPS_AMP) if clamp_low else m)


def inv_log_mag(log_mag: jnp.ndarray, cfg: AudioConfig,
                length: Optional[int] = None,
                key: Optional[jax.Array] = None) -> jnp.ndarray:
    """log-magnitude -> waveform via fast (4-iter, momentum) Griffin-Lim.

    Reference ``retunegan/audio.py:139-147`` (``inv_mag``): exp, re-prepend a
    *zero* DC row if dropped, power-law, momentum GL with length constraint.
    The template is a deliberately rough phase estimate, so the DFT matmuls
    run at DEFAULT (bf16 MXU) precision -- ~3x faster, inaudible here.
    """
    s = jnp.exp(log_mag)
    if s.shape[-2] == cfg.n_freq - 1:
        zeros = jnp.zeros(s.shape[:-2] + (1, s.shape[-1]), s.dtype)
        s = jnp.concatenate([zeros, s], axis=-2)
    return griffin_lim(s ** cfg.gl_power, cfg.gl_iters_vocoder, cfg.hop_length,
                       cfg.win_length, cfg.window_fn, momentum=cfg.gl_momentum,
                       length=length, key=key,
                       precision=jax.lax.Precision.DEFAULT)


def stft_mag_mel_phase(y: jnp.ndarray, cfg: AudioConfig, n_fft: int,
                       win_length: int, hop_length: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable (|S|, mel, phase) triple for the multi-STFT loss.

    Reference ``retunegan/audio.py:150-170`` (``get_stft_torch``): raw mel
    values, no floor and no log here.  ``|D + 1e-9|`` epsilon kept so the
    magnitude (and its gradient) never hit exactly zero.
    """
    re, im = stft_ri(y, n_fft, hop_length, win_length, cfg.window_fn)
    re_eps = re + 1e-9
    s = jnp.sqrt(re_eps * re_eps + im * im)
    m = jnp.einsum('mf,...ft->...mt', _mel_basis_j(cfg, n_fft), s)
    p = jnp.arctan2(im, re)
    return s, m, p
