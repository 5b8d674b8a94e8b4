"""Vocoder batch-inference CLI (capability rebuild of ``retunegan/infer.py``).

Iterates a folder: ``.npy`` files are treated as normalized mag features from
the acoustic preprocessor (``mag-*.npy``) and vocoded; ``.wav`` files go
through an analysis->resynthesis round trip.  Loads the frozen config
snapshot from the run dir (``config.json``, the reference re-imported the
copied hparam.py -- ``infer.py:74-75``) and the newest ``g_*`` checkpoint.

NOTE the reference file itself is broken as a script (bad package import,
undefined names, ``infer.py:5,21-23``); this implements the intended
capability.

Usage:
  python -m transtacos_retunegan_tpu.serve.infer_vocoder \
      --run_dir runs/vocoder --input_dir specs/ --output_dir wavs/
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import features, transforms as T
from ..config import Config
from ..models.generators import make_generator
from ..train import checkpoint as ckpt


def load_generator(run_dir: str, cfg: Config):
    gen = make_generator(cfg)
    fps = cfg.audio.frames_per_segment
    variables = jax.jit(lambda m, t: gen.init(
        {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)},
        m, t, train=False))(
            jnp.zeros((1, fps, cfg.audio.n_mel)),
            jnp.zeros((1, fps * cfg.audio.hop_length, 1)))
    params = ckpt.restore_generator_params(run_dir, variables['params'])
    if params is None:
        print(f'warning: no g_* checkpoint under {run_dir}; using random init')
        params = variables['params']
    return gen, params


def vocode_mag_norm(gen, params, mag_norm: np.ndarray, cfg: Config) -> np.ndarray:
    """Normalized mag [F, T] (preprocessor domain) -> waveform."""
    mag_nat = T.spec_to_natural_scale(mag_norm, cfg.audio)
    mag_nat = T.fix_zero_dc(mag_nat, cfg.audio)
    log_mag = np.log(np.maximum(mag_nat, 1e-5)).astype(np.float32)
    mel = np.log(np.maximum(T.mag_to_mel(mag_nat.astype(np.float32), cfg.audio),
                            1e-5)).astype(np.float32)
    wavlen = cfg.audio.hop_length * mag_norm.shape[1]
    tmpl = T.inv_log_mag(log_mag, cfg.audio, length=wavlen - 1)
    tmpl = np.pad(tmpl, (0, 1))
    wav = gen.apply({'params': params}, jnp.asarray(mel.T)[None],
                    jnp.asarray(tmpl)[None, :, None], train=False)
    return np.asarray(wav[0, :, 0], np.float32)


def roundtrip_wav(gen, params, wav: np.ndarray, cfg: Config) -> np.ndarray:
    """wav -> analysis -> vocoder -> wav (quality sanity path)."""
    wav = features.align_wav(wav, cfg.audio.hop_length)
    log_mag = T.get_mag(wav[:-1], cfg.audio)
    mel = np.log(np.maximum(T.mag_to_mel(np.exp(log_mag), cfg.audio), 1e-5))
    tmpl = T.inv_log_mag(log_mag, cfg.audio, length=len(wav) - 1)
    tmpl = np.pad(tmpl, (0, 1))
    out = gen.apply({'params': params}, jnp.asarray(mel.T.astype(np.float32))[None],
                    jnp.asarray(tmpl)[None, :, None], train=False)
    return np.asarray(out[0, :, 0], np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--run_dir', required=True)
    p.add_argument('--input_dir', required=True)
    p.add_argument('--output_dir', required=True)
    args = p.parse_args()

    cfg_path = os.path.join(args.run_dir, 'config.json')
    cfg = Config.load(cfg_path) if os.path.exists(cfg_path) else Config()
    os.makedirs(args.output_dir, exist_ok=True)
    gen, params = load_generator(args.run_dir, cfg)

    for fn in sorted(os.listdir(args.input_dir)):
        fp = os.path.join(args.input_dir, fn)
        base = os.path.splitext(fn)[0]
        out_fp = os.path.join(args.output_dir, base + '.gen.wav')
        start = time.time()
        if fn.endswith('.npy'):
            wav = vocode_mag_norm(gen, params, np.load(fp), cfg)
        elif fn.endswith('.wav'):
            wav = roundtrip_wav(gen, params, features.load_wav(fp, cfg.audio), cfg)
        else:
            continue
        features.save_wav(wav, out_fp, cfg.audio)
        print(f'{fn} -> {out_fp} ({time.time() - start:.2f}s, {len(wav)} samples)')


if __name__ == '__main__':
    main()
