"""Round-5 evidence: train THROUGH the teacher-forcing decay, at batch 64.

The reference's 'mix' teacher-forcing mode blends ground truth with the
model's own predictions inside the decode loop under a cosine decay that
engages at ``tf_start_decay`` (reference ``custom_decoder.py:106-151``,
``transtacos/hparam.py:73-81``).  Every prior convergence run here stopped
exactly where the decay begins, so the feed-own-predictions training dynamic
existed only as unit tests.  This session drives a full compressed-schedule
run at the measured bs64 operating point (``docs/train_scaling.json``) and
evaluates the SAME checkpoint repeatedly as tf_ratio anneals 1.0 -> 0.0:

1. build/reuse the round-4 evidence corpus (speaker bank, 4-16 syllables);
2. train ``train_acoustic`` in segments whose boundaries are the eval
   points (resume-from-latest between segments; the run switches from the
   hoisted-force program to the stock scan program exactly at
   ``tf_start_decay`` -- visible in the train log);
3. at each boundary: held-out teacher-forced losses (per-item masks) +
   free-running synthesis alignment metrics (argmax coverage vs the 0.95
   bar, mass coverage, diagonality) with per-utterance rows kept for
   straggler diagnosis;
4. write an incremental ``decay_table.json`` + ``README.md`` so partial
   sessions still leave committed evidence.

Usage:
  python -m transtacos_retunegan_tpu.tools.decay_session \
      --out_dir docs/convergence_r5 --workdir /tmp/r5 \
      --eval_steps 10000,14000,18000,22000,26000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re

import numpy as np

from ..config import Config
from .convergence_session import (eval_teacher_forced, held_out_texts,
                                  parse_series, run_cli)
from .synth_corpus import build_corpus


def eval_synthesis_alignment(cfg: Config, data_dir: str, ac_run: str,
                             out_dir: str, vocoder_dir: str | None = None,
                             max_texts: int = 10, tag: str = '') -> dict:
    """Free-running held-out synthesis -> alignment metrics per utterance.

    Unlike ``convergence_session.eval_synthesis`` this does not require a
    trained vocoder (alignment metrics are an acoustic-model property); when
    one IS given, the worst-coverage utterance is also rendered to wav for
    listening-based straggler diagnosis (round-4 verdict: nobody listened
    to the 0.824-coverage outlier).
    """
    from ..audio import features as F
    from ..eval.metrics import alignment_diagonality
    from ..serve.pipeline import Synthesizer
    from ..utils.plotting import plot_alignment

    synth = Synthesizer(cfg, acoustic_dir=ac_run, vocoder_dir=vocoder_dir)
    rows, worst = [], None
    for name, text, _ in held_out_texts(data_dir)[:max_texts]:
        out = synth.synthesize_with_alignment(text)
        d = alignment_diagonality(out['alignment'])
        d['name'] = name
        d['n_frames'] = out['n_frames']
        rows.append(d)
        if worst is None or d['coverage'] < worst[0]:
            worst = (d['coverage'], name, text, out['alignment'])
    if worst is not None and tag:
        plot_alignment(worst[3],
                       os.path.join(out_dir, f'align_worst_{tag}.png'),
                       info=f'{worst[1]} coverage={worst[0]:.3f} @{tag}')
        if vocoder_dir is not None:
            wav = synth.tts(worst[2])
            F.save_wav(wav, os.path.join(out_dir, f'worst_{tag}_{worst[1]}.wav'),
                       cfg.audio)
    return {
        'per_utt': rows,
        'mean_diagonality': float(np.mean([r['diagonality'] for r in rows])),
        'mean_focus': float(np.mean([r['focus'] for r in rows])),
        'mean_coverage': float(np.mean([r['coverage'] for r in rows])),
        'mean_mass_coverage': float(np.mean([r['mass_coverage']
                                             for r in rows])),
        'min_coverage': float(min(r['coverage'] for r in rows)),
    }


def tf_ratio_at(step: int, hp) -> float:
    """Host-side mirror of ``schedules.teacher_forcing_ratio``."""
    if step < hp.tf_start_decay:
        return float(hp.tf_init)
    t = min(max(step - hp.tf_start_decay, 0), hp.tf_decay)
    return float(hp.tf_init * 0.5 * (1.0 + np.cos(np.pi * t / hp.tf_decay)))


def auto_buckets(data_dir: str, cfg: Config) -> tuple:
    """(frame_bucket, text_bucket) covering every corpus utterance, so the
    whole run jits ONE decode geometry.  Both are padding MULTIPLES; set to
    the (rounded-up) corpus max they collapse the shape space to a single
    (B, T_pad, N_pad) compile key -- on this image's tunnel every extra
    bucket is a ~20 min remote compile of the big scan program."""
    from ..data.feeder import AcousticDataset
    r = cfg.acoustic.outputs_per_step
    mxf = mxt = 0
    for split in ('train', 'test'):
        ds = AcousticDataset(data_dir, cfg, split)
        mxf = max(mxf, max(ds.frame_len(i) for i in range(len(ds))))
        mxt = max(mxt, max(ds.text_len(i) for i in range(len(ds))))
    fb = -(-(mxf + 1) // r) * r
    tb = -(-mxt // cfg.acoustic.text_bucket) * cfg.acoustic.text_bucket
    return fb, tb


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out_dir', default='docs/convergence_r5')
    p.add_argument('--workdir', required=True)
    p.add_argument('--n_utts', type=int, default=2600)
    p.add_argument('--n_speakers', type=int, default=6)
    p.add_argument('--min_syl', type=int, default=4)
    p.add_argument('--max_syl', type=int, default=16)
    p.add_argument('--batch_size', type=int, default=64)
    p.add_argument('--tf_start_decay', type=int, default=10000)
    p.add_argument('--tf_decay', type=int, default=12000,
                   help='cosine decay LENGTH in steps (tf reaches 0 at '
                        'tf_start_decay + tf_decay, then trains free-running '
                        '-- the compressed mirror of the reference 20k->220k '
                        'over a 320k budget)')
    p.add_argument('--eval_steps', default='10000,14000,18000,22000,26000')
    p.add_argument('--checkpoint_interval', type=int, default=2000)
    p.add_argument('--vocoder_dir', default=None,
                   help='optional trained generator run dir: render the '
                        'worst-coverage utterance to wav at each eval point')
    p.add_argument('--max_texts', type=int, default=20)
    p.add_argument('--device_data', action='store_true', default=True,
                   help='HBM-resident corpus (data/device_data.py): the '
                        'streaming feeder is wire-bound at ~60 MB/s on this '
                        'tunnel (2.3 s/step measured at bs64)')
    p.add_argument('--no_device_data', dest='device_data',
                   action='store_false')
    p.add_argument('--skip_train', action='store_true', default=False)
    p.add_argument('--redo', action='store_true', default=False,
                   help='re-evaluate steps already in decay_table.json '
                        '(e.g. the final checkpoint with --vocoder_dir set '
                        'for the listening wav)')
    args = p.parse_args()

    cfg = Config()
    os.makedirs(args.out_dir, exist_ok=True)
    os.makedirs(args.workdir, exist_ok=True)
    processed = os.path.join(args.workdir, 'processed')
    if os.path.exists(os.path.join(processed, 'train.txt')):
        data_dir = processed
    else:
        data_dir = build_corpus(args.workdir, cfg, args.n_utts,
                                n_speakers=args.n_speakers,
                                min_syl=args.min_syl, max_syl=args.max_syl)
    print(f'# corpus at {data_dir}', flush=True)

    fb, tb = auto_buckets(data_dir, cfg)
    acfg = dataclasses.replace(
        cfg, acoustic=dataclasses.replace(
            cfg.acoustic, batch_size=args.batch_size, frame_bucket=fb,
            text_bucket=tb,
            tf_start_decay=args.tf_start_decay, tf_decay=args.tf_decay))
    print(f'# frame_bucket {fb}, text_bucket {tb}, batch {args.batch_size}, '
          f'tf decay {args.tf_start_decay}..'
          f'{args.tf_start_decay + args.tf_decay}', flush=True)
    cfg_path = acfg.save(os.path.join(args.workdir, 'cfg'))
    ac_run = os.path.join(args.workdir, 'ac_run')

    table_path = os.path.join(args.out_dir, 'decay_table.json')
    table = json.load(open(table_path)) if os.path.exists(table_path) else {
        'recipe': {'batch_size': args.batch_size, 'frame_bucket': fb,
                   'text_bucket': tb,
                   'tf_start_decay': args.tf_start_decay,
                   'tf_decay': args.tf_decay, 'n_utts': args.n_utts,
                   'n_speakers': args.n_speakers,
                   'lr_schedule': 'reference Noam (1e-3 peak, 4k warmup) '
                                  'held fixed at 4x batch; see '
                                  'docs/convergence_r5/README.md'},
        'rows': []}
    done_steps = (set() if args.redo
                  else {r['step'] for r in table['rows']})

    csv_path = os.path.join(args.out_dir, 'acoustic_loss.csv')
    if not os.path.exists(csv_path):
        with open(csv_path, 'w') as fh:
            fh.write('step,s_per_step,loss,mel_loss,stop_loss,tfr\n')

    for target in [int(x) for x in args.eval_steps.split(',')]:
        if not args.skip_train:
            out = run_cli(
                'transtacos_retunegan_tpu.train.train_acoustic',
                ['--data_dir', data_dir, '--log_path', ac_run,
                 '--config', cfg_path, '--max_steps', str(target),
                 '--log_interval', '20',
                 # TB histogram summaries pull the full batch + grads to the
                 # host (~40 s each over the tunnel); keep them sparse
                 '--summary_interval', '2000',
                 '--checkpoint_interval', str(args.checkpoint_interval),
                 '--rss_limit_gb', '95']
                + (['--device_data'] if args.device_data else []))
            steps = [int(x) for x in re.findall(r'step (\d+) \[', out)]
            spst = parse_series(out, r'\[(\d+\.\d+) s/step')
            loss = parse_series(out, r'loss (\d+\.\d+),')
            mel = parse_series(out, r'mel (\d+\.\d+)')
            stop = parse_series(out, r'stop (\d+\.\d+)')
            tfr = parse_series(out, r'tfr (\d+\.\d+)')
            with open(csv_path, 'a') as fh:
                for i in range(min(len(steps), len(loss), len(mel),
                                   len(stop), len(tfr), len(spst))):
                    fh.write(f'{steps[i]},{spst[i]},{loss[i]},{mel[i]},'
                             f'{stop[i]},{tfr[i]}\n')
            if steps:
                print(f'# segment -> step {steps[-1]}: loss {loss[-1]:.3f} '
                      f'tfr {tfr[-1]:.3f} ({spst[-1]:.3f} s/step)',
                      flush=True)
        if target in done_steps:
            continue
        tf = eval_teacher_forced(acfg, data_dir, ac_run)
        sy = eval_synthesis_alignment(acfg, data_dir, ac_run, args.out_dir,
                                      vocoder_dir=args.vocoder_dir,
                                      max_texts=args.max_texts,
                                      tag=str(target))
        row = {'step': target,
               'tf_ratio': round(tf_ratio_at(target, acfg.acoustic), 4),
               'held_out_mel_l1_item': tf['held_out_mel_l1_item'],
               'held_out_stop_ce_item': tf['held_out_stop_ce_item'],
               'held_out_prds_accuracy': tf.get('held_out_prds_accuracy'),
               'coverage': sy['mean_coverage'],
               'mass_coverage': sy['mean_mass_coverage'],
               'diagonality': sy['mean_diagonality'],
               'focus': sy['mean_focus'],
               'min_coverage': sy['min_coverage'],
               'per_utt': sy['per_utt']}
        table['rows'] = [r for r in table['rows'] if r['step'] != target]
        table['rows'].append(row)
        table['rows'].sort(key=lambda r: r['step'])
        with open(table_path, 'w') as fh:
            json.dump(table, fh, indent=2)
        _write_report(args, table)
        print(f"# eval @{target}: tf={row['tf_ratio']:.3f} "
              f"coverage={row['coverage']:.3f} "
              f"(min {row['min_coverage']:.3f}) "
              f"mass={row['mass_coverage']:.3f} "
              f"diag={row['diagonality']:.3f} "
              f"mel_l1={row['held_out_mel_l1_item']:.4f}", flush=True)
    print(f'# wrote {table_path}', flush=True)


def _write_report(args, table):
    md = [
        '# Training through the teacher-forcing decay (round 5)',
        '',
        'The reference anneals teacher forcing with a cosine decay inside the',
        "decode loop ('mix' mode: each step feeds a tf_ratio-weighted blend of",
        'ground truth and the previous prediction, reference',
        '`custom_decoder.py:106-151`).  This run compresses the reference',
        'schedule (20k->220k of a 320k budget) to the evidence corpus scale',
        f"(decay {table['recipe']['tf_start_decay']}->"
        f"{table['recipe']['tf_start_decay'] + table['recipe']['tf_decay']})"
        ' and trains at the measured bs64 operating point',
        '(`docs/train_scaling.json`), covering both round-4 verdict items 1+2:',
        'the feed-own-predictions dynamic trains in production for the first',
        'time, at the batch size the scaling study recommends.',
        '',
        '**LR policy at 4x batch:** the reference Noam schedule (peak 1e-3,',
        '4k warmup) is deliberately held fixed, so the recipe differs from the',
        'reference in batch size only; the convergence table below is the',
        'evidence this is stable.  (Linear LR scaling was rejected: the Noam',
        'peak already sits near the edge of the explosion guard on this',
        'corpus, and at 4x batch each step sees 4x the data, so equal-step',
        'comparisons against the bs16 run are already an epoch-count',
        'handicap *against* bs64.)',
        '',
        'The train step switches from the hoisted-force program to the stock',
        'scan program exactly at the decay boundary (`hoist_force_eligible`);',
        'see `acoustic_loss.csv` s/step column for the measured cost of each',
        'regime.',
        '',
        '| step | tf ratio | argmax cov | min cov | mass cov | diagonality |'
        ' mel L1 (item) | stop CE | prds acc |',
        '|---|---|---|---|---|---|---|---|---|',
    ]
    for r in table['rows']:
        prds = r.get('held_out_prds_accuracy')
        md.append(
            f"| {r['step']} | {r['tf_ratio']:.3f} | **{r['coverage']:.3f}** |"
            f" {r['min_coverage']:.3f} | {r['mass_coverage']:.3f} |"
            f" {r['diagonality']:.3f} | {r['held_out_mel_l1_item']:.4f} |"
            f" {r['held_out_stop_ce_item']:.4f} |"
            f" {prds if prds is None else format(prds, '.3f')} |")
    md += ['',
           'Per-utterance alignment rows live in `decay_table.json`; the',
           'worst-coverage utterance at each eval point is committed as',
           '`align_worst_<step>.png` (and as wav when a trained vocoder is',
           'passed via `--vocoder_dir`).', '']
    with open(os.path.join(args.out_dir, 'README.md'), 'w') as fh:
        fh.write('\n'.join(md))


if __name__ == '__main__':
    main()
