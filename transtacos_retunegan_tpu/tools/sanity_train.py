"""End-to-end learning sanity: synthesize a tiny tonal corpus, train the
acoustic model a few hundred steps through the real CLI path, and verify the
loss drops and a trained checkpoint synthesizes audio in the corpus's
spectral neighborhood.  A second leg trains the vocoder GAN through its CLI
and verifies the mstft reconstruction loss drops while the discriminator
real/fake scores separate (LSGAN: real -> 1, fake -> 0).

This automates the manual convergence checks the reference relied on
(eval-artifact eyeballing, ``transtacos/train.py:97-127``; validation-metric
watching, ``retunegan/train.py:275-322``) into a runnable go/no-go.
Run time ~15 min on CPU with the default tiny configs.

Usage: python -m transtacos_retunegan_tpu.tools.sanity_train \
    [--steps 300] [--gan_steps 150] [--skip_acoustic] [--skip_gan]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

from ..audio import features as F
from ..config import Config
from ..data import preprocess as P

PINYINS = ['ni3 hao3 shi4 jie4', 'zhong1 guo2 ren2', 'wo3 men5 de5 jia1',
           'tian1 qi4 zhen1 hao3', 'xie4 xie4 da4 jia1', 'zai4 jian4 peng2 you3',
           'chi1 fan4 le5 ma5', 'jin1 tian1 xing1 qi1 ji3']


def build_corpus(base: str, cfg: Config) -> str:
    os.makedirs(f'{base}/wavs', exist_ok=True)
    rows = []
    for i, py in enumerate(PINYINS):
        dur = 11025 + (i % 4) * 2200
        t = np.arange(dur) / cfg.audio.sample_rate
        f0 = 160 + 25 * (i % 3)
        env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
        y = (env * (0.4 * np.sin(2 * np.pi * f0 * t)
                    + 0.15 * np.sin(2 * np.pi * 2 * f0 * t))).astype(np.float32)
        F.save_wav(y, f'{base}/wavs/u{i}.wav', cfg.audio)
        rows.append(f'u{i}|{py}|{"0" * (len(py.split()) - 1)}4')
    with open(f'{base}/metadata.csv', 'w', encoding='utf-8') as fh:
        fh.write('\n'.join(rows))
    P.preprocess_generic(base, 'processed', f'{base}/metadata.csv',
                         wav_dir='wavs', num_workers=1)
    return f'{base}/processed'


def tiny_config(cfg: Config) -> Config:
    return dataclasses.replace(cfg, acoustic=dataclasses.replace(
        cfg.acoustic, embed_depth=64, encoder_depth=64, decoder_depth=128,
        attention_depth=32, prenet_depths=(64,), posnet_depth=128,
        var_embed_depth=32, var_prednet_depth=32, prdsnet_depth=32,
        posenc_depth=16, batch_size=4, frame_bucket=40))


def tiny_vocoder_config(cfg: Config) -> Config:
    """Reduced widths for CPU runtime; keeps the reference's GAN dynamics
    (d_train_times=2, all three discriminator families, loss weights)."""
    return dataclasses.replace(cfg, vocoder=dataclasses.replace(
        cfg.vocoder, upsample_initial_channel=64, batch_size=4,
        num_workers=1, disc_width_mult=0.5,
        multi_stft_params=((1024, 512, 120), (512, 256, 60))))


def gan_leg(base: str, data_dir: str, gan_steps: int) -> None:
    """Vocoder GAN sanity: mstft drops, D real/fake scores separate."""
    cfg_path = tiny_vocoder_config(Config()).save(f'{base}/vcfg')
    steps_per_epoch = 2                      # 8 utts / batch 4
    epochs = max(1, gan_steps // steps_per_epoch)
    r = subprocess.run(
        [sys.executable, '-m', 'transtacos_retunegan_tpu.train.train_vocoder',
         '--data_dir', data_dir, '--log_path', f'{base}/vrun',
         '--config', cfg_path, '--finetune', '--epochs', str(epochs),
         '--stdout_interval', '2', '--checkpoint_interval', str(gan_steps),
         '--validation_interval', str(gan_steps), '--summary_interval',
         str(gan_steps)],
        capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise SystemExit(f'vocoder training failed: exit {r.returncode}')

    mstft = [float(x) for x in re.findall(r'mstft: (\d+\.\d+)', r.stdout)]
    sc_r = [float(x) for x in re.findall(r'sc_s_r: (-?\d+\.\d+)', r.stdout)]
    sc_g = [float(x) for x in re.findall(r'sc_s_g: (-?\d+\.\d+)', r.stdout)]
    assert len(mstft) >= 10, f'only {len(mstft)} mstft lines in trainer output'
    k = max(2, len(mstft) // 5)
    early, late = np.mean(mstft[:k]), np.mean(mstft[-k:])
    drop = 1 - late / early
    print(f'gan mstft {early:.3f} -> {late:.3f} ({drop:.0%} drop)')
    assert drop > 0.15, f'mstft dropped only {drop:.0%} over {gan_steps} steps'
    sep_early = np.mean(np.asarray(sc_r[:k]) - np.asarray(sc_g[:k]))
    sep_late = np.mean(np.asarray(sc_r[-k:]) - np.asarray(sc_g[-k:]))
    print(f'D score separation (real-fake) {sep_early:.3f} -> {sep_late:.3f}')
    assert sep_late > 0.15, \
        f'D real/fake scores did not separate ({sep_late:.3f})'
    print('SANITY GAN: OK')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--gan_steps', type=int, default=150)
    p.add_argument('--skip_acoustic', action='store_true', default=False)
    p.add_argument('--skip_gan', action='store_true', default=False)
    p.add_argument('--workdir', default=None)
    args = p.parse_args()

    cfg = Config()
    base = args.workdir or tempfile.mkdtemp(prefix='sanity_train_')
    data_dir = build_corpus(base, cfg)
    cfg_path = tiny_config(cfg).save(f'{base}/cfg')

    if not args.skip_gan:
        gan_leg(base, data_dir, args.gan_steps)
    if args.skip_acoustic:
        return

    r = subprocess.run(
        [sys.executable, '-m', 'transtacos_retunegan_tpu.train.train_acoustic',
         '--data_dir', data_dir, '--log_path', f'{base}/run',
         '--config', cfg_path, '--max_steps', str(args.steps),
         '--log_interval', '25', '--checkpoint_interval', str(args.steps)],
        capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise SystemExit(f'training failed: exit {r.returncode}')

    losses = [float(x) for x in re.findall(r'loss (\d+\.\d+)', r.stdout)]
    assert losses, 'no loss lines in trainer output'
    drop = 1 - losses[-1] / losses[0]
    print(f'loss {losses[0]:.3f} -> {losses[-1]:.3f} ({drop:.0%} drop)')
    assert drop > 0.3, f'loss dropped only {drop:.0%} over {args.steps} steps'

    # synthesize from the trained checkpoint
    from ..serve.pipeline import Synthesizer
    synth = Synthesizer(Config.load(f'{base}/run/config.json'),
                        acoustic_dir=f'{base}/run', max_iters=40)
    wav = synth.synthesize_wav('ni3 hao3 shi4 jie4', trim=False)
    assert len(wav) > 0 and np.isfinite(wav).all()
    mag = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freqs = np.fft.rfftfreq(len(wav), 1 / cfg.audio.sample_rate)
    band = (freqs > 80) & (freqs < 1000)
    peak = freqs[band][np.argmax(mag[band])]
    print(f'synthesized {len(wav)} samples; dominant frequency {peak:.0f} Hz '
          f'(corpus fundamentals 160-210 Hz + harmonics)')
    assert 100 < peak < 600, f'dominant frequency {peak} outside corpus band'
    print('SANITY TRAIN: OK')


if __name__ == '__main__':
    main()
