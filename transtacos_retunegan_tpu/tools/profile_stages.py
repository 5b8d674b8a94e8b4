"""Steady-state stage profiler for the synthesis + training hot paths.

Measures each pipeline stage on the current device with the methodology this
backend requires (see docs/SERVING.md): materialize via ``float(jnp.sum())``
(``block_until_ready`` alone does not guarantee completion over the remote
tunnel), and run a throwaway warmup loop per compiled program first (the
first ~20 executions after a compile run up to ~7x slower than steady
state).  Prints one line per stage; use it before/after kernel work so
optimizations are judged on steady-state numbers.

Usage:
  python -m transtacos_retunegan_tpu.tools.profile_stages [--reps 24]
"""

from __future__ import annotations

import argparse
import os
import time

import jax

_CACHE = os.path.join(os.getcwd(), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(name, f, args, reduce_out, reps, warmup=8):
    t0 = time.time()
    out = f(*args)
    float(reduce_out(out))                       # compile + materialize
    compile_s = time.time() - t0
    warm = [f(*args) for _ in range(warmup)]
    float(sum(reduce_out(o) for o in warm))      # steady-state warmup
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(reps)]
    float(sum(reduce_out(o) for o in outs))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f'{name:<44s} {ms:8.2f} ms   (compile {compile_s:.0f}s)', flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reps', type=int, default=24)
    args_cli = p.parse_args()
    reps = args_cli.reps

    from ..audio import dsp
    from ..config import Config
    from ..models.acoustic import Tacotron, posnet_apply
    from ..models.generators import make_generator
    from ..ops.fused_decoder import fused_decode
    from ..text import frontend
    from ..train.acoustic_step import init_state, train_step
    from ..train.vocoder_step import gan_train_step, init_gan_state
    from ..text.symbols import get_vocab_size

    cfg = Config()
    au = cfg.audio
    r = cfg.acoustic.outputs_per_step
    max_iters, t_frames = 80, 400
    print(f'device: {jax.devices()[0]}')

    # ---- serving stages (batch 1)
    pinyin = ('zhe4 shi4 yi2 ge4 yong4 lai2 ce4 shi4 he2 cheng2 su4 du4 de5 '
              'chang2 ju4 zi5 ni3 hao3 shi4 jie4')
    seq = frontend.serialize_inference(pinyin)
    n_pad = 80
    text = np.zeros((1, n_pad, 2), np.int32)
    text[0, :seq.shape[0]] = seq
    tj, lj = jnp.asarray(text), jnp.asarray([seq.shape[0]])
    dummy = {'text': tj, 'text_lengths': lj,
             'prds': jnp.zeros((1, n_pad), jnp.int32),
             'spec_lengths': jnp.asarray([4 * r]),
             'mel_targets': jnp.zeros((1, 4 * r, au.n_mel)),
             'f0_targets': jnp.zeros((1, 4 * r), jnp.int32),
             'c0_targets': jnp.zeros((1, 4 * r), jnp.int32)}
    params = init_state(cfg, jax.random.PRNGKey(0), dummy).params
    interp = jax.default_backend() != 'tpu'

    @jax.jit
    def acoustic(params, text, lens):
        model = Tacotron(cfg)
        enc = model.apply({'params': params}, text, lens, train=False,
                          encoder_only=True)
        out = fused_decode(params['decoder_cell'], cfg, enc['keys'],
                           enc['values'], enc['mask'], max_iters,
                           interpret=interp)
        return posnet_apply(params, out['mel_outputs'], cfg)

    bench('acoustic: encoder + fused decode + posnet', acoustic,
          (params, tj, lj), jnp.sum, reps)

    gen = make_generator(cfg)
    gen_params = jax.jit(lambda m, t: gen.init(
        {'params': jax.random.PRNGKey(1), 'noise': jax.random.PRNGKey(2)},
        m, t, train=False))(jnp.zeros((1, t_frames, au.n_mel)),
                            jnp.zeros((1, t_frames * au.hop_length, 1)))['params']
    rng0 = np.random.RandomState(0)
    mag = jnp.asarray(np.abs(rng0.randn(au.n_freq - 1, t_frames)).astype(np.float32) * 0.01)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def prep(mag, key):
        s = dsp.spec_to_natural_scale(mag, au)
        s = dsp.fix_zero_dc(s, au)
        mel = jnp.log(jnp.clip(dsp.mag_to_mel(s, au), min=dsp.EPS_AMP))
        log_mag = jnp.log(jnp.clip(s, min=dsp.EPS_AMP))
        tmpl = dsp.inv_log_mag(log_mag, au, length=au.hop_length * t_frames - 1,
                               key=key)
        return mel, jnp.pad(tmpl, (0, 1))

    mel, tmpl = prep(mag, key)
    bench('vocoder: natural-scale -> mel + GL template', prep, (mag, key),
          lambda o: jnp.sum(o[1]), reps)

    @jax.jit
    def gen_fwd(p, mel, tmpl):
        return gen.apply({'params': p}, mel.T[None], tmpl[None, :, None],
                         train=False)
    bench('vocoder: generator forward', gen_fwd, (gen_params, mel, tmpl),
          jnp.sum, reps)

    # ---- training steps (reference batch geometry)
    b, seg = cfg.vocoder.batch_size, au.segment_size
    vb = {'mel': jnp.asarray(rng0.randn(b, seg // au.hop_length, au.n_mel)
                             .astype(np.float32)),
          'tmpl': jnp.asarray((rng0.randn(b, seg) * 0.1).astype(np.float32)),
          'wav': jnp.asarray((rng0.randn(b, seg) * 0.1).astype(np.float32))}
    gstate = init_gan_state(cfg, jax.random.PRNGKey(0), vb, 568)

    def gan_one(i):
        nonlocal gstate
        gstate, m = gan_train_step(cfg, gstate, vb, jax.random.PRNGKey(i), 568)
        return m
    bench('train: GAN step (D x2 + G, bs 16)', gan_one, (0,),
          lambda m: m['loss_gen_all'], max(5, reps // 2))

    n_txt, t = 32, 400
    ab = {'text': jnp.asarray(np.stack(
              [rng0.randint(4, get_vocab_size(), (b, n_txt)),
               rng0.randint(0, 6, (b, n_txt))], -1).astype(np.int32)),
          'text_lengths': jnp.full((b,), n_txt, jnp.int32),
          'prds': jnp.asarray(rng0.randint(0, 6, (b, n_txt)).astype(np.int32)),
          'spec_lengths': jnp.full((b,), t, jnp.int32),
          'mel_targets': jnp.asarray(rng0.randn(b, t, au.n_mel).astype(np.float32)),
          'mag_targets': jnp.asarray(rng0.randn(b, t, au.n_freq - 1).astype(np.float32)),
          'f0_targets': jnp.asarray(rng0.randint(0, au.n_f0_bins, (b, t)).astype(np.int32)),
          'c0_targets': jnp.asarray(rng0.randint(0, 32, (b, t)).astype(np.int32)),
          'stop_token_targets': jnp.zeros((b, t), jnp.float32),
          'frame_loss_len': jnp.asarray(t, jnp.int32),
          'text_loss_len': jnp.asarray(n_txt, jnp.int32)}
    astate = init_state(cfg, jax.random.PRNGKey(5), ab)

    def ac_one(i):
        nonlocal astate
        astate, al = train_step(cfg, astate, ab, jax.random.PRNGKey(i))
        return al
    bench('train: acoustic step (bs 16 x 400 frames)', ac_one, (0,),
          lambda m: m['loss'], max(5, reps // 2))


if __name__ == '__main__':
    main()
