"""Serving pipeline: text -> syl4 -> mag -> (mel, GL template) -> wav.

Collapses the reference's three-process pickle-over-HTTP chain
(``app.py`` -> ``transtacos/server.py`` -> ``retunegan/server.py``) into one
process with jitted stages.  Three call surfaces mirror the reference:

* ``synthesize_spec(pinyin)`` -- natural-scale linear spec with DC restored
  (acoustic service payload, reference ``transtacos/synth.py:84-87``)
* ``synthesize_wav(pinyin)``  -- internal 30-iter Griffin-Lim vocoding
  (reference ``synth.py:80-83``)
* ``vocode(spec)``            -- neural vocoder on an externally supplied
  spec (reference ``retunegan/server.py:33-62``)
* ``tts(text)``               -- the fused end-to-end path (one device
  round-trip per stage; no pickle hops)

Static-shape bucketing: text length pads to multiples of ``text_bucket`` and
decode length is fixed at ``max_iters``; each bucket compiles once and is
cached.
"""

from __future__ import annotations

import functools
import itertools
import zlib
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import dsp, features
from ..config import Config
from ..models.acoustic import Tacotron
from ..models.generators import make_generator
from ..models.precision import compute_dtype
from ..text import frontend
from ..train import checkpoint as ckpt
from ..train.acoustic_step import init_state


def _round_up(x: int, m: int) -> int:
    return x if x % m == 0 else x + m - x % m


def default_fused_decoder() -> bool:
    """Production decode-path selection: the pallas fused decoder on TPU
    (~28x the flax scan), the flax scan elsewhere (compiled pallas is
    TPU-only and interpret mode is slower than the scan).  Shared by
    ``Synthesizer``, ``bench.py`` and ``__graft_entry__`` so the driver's
    compile check and the benchmark exercise the same path production
    serving takes."""
    return jax.default_backend() == 'tpu'


class Synthesizer:
    """End-to-end TTS with jitted acoustic, Griffin-Lim and vocoder stages."""

    def __init__(self, cfg: Optional[Config] = None,
                 acoustic_dir: Optional[str] = None,
                 vocoder_dir: Optional[str] = None,
                 kanji_table: Optional[str] = None,
                 max_iters: Optional[int] = None,
                 fused_decoder: Optional[bool] = None,
                 infer_dtype: str = 'auto',
                 mesh=None,
                 seed: int = 114514):
        self.cfg = cfg or Config()
        self.max_iters = max_iters or self.cfg.acoustic.max_iters
        if fused_decoder is None:
            fused_decoder = default_fused_decoder()
        self.fused_decoder = fused_decoder
        # vocoder inference precision.  'auto' = bf16 on TPU (1.22x the
        # f32 forward; a bf16-trained-and-evaluated vocoder beats its GL
        # template on every spectral metric -- docs/convergence/bf16/),
        # cfg value elsewhere; 'float32'/'bfloat16' force.  Training
        # numerics are untouched (train CLIs read cfg, not this).
        if infer_dtype == 'auto':
            infer_dtype = ('bfloat16' if jax.default_backend() == 'tpu'
                           else self.cfg.vocoder.compute_dtype)
        self.infer_dtype = infer_dtype
        # optional data-parallel serving: a jax.sharding.Mesh with a 'data'
        # axis shards the BATCHED surfaces (synthesize_spec_batch /
        # vocode_batch / tts_batch) over chips via GSPMD -- params
        # replicated, batch dim split, XLA inserts the collectives.  The
        # fused pallas decoder is a custom call GSPMD cannot partition, so
        # the SHARDED acoustic stage falls back to the flax scan; the
        # single-request paths (tts_fused, vocode, GL) keep the fused
        # kernel and stay unsharded -- a batch of 1 cannot split 8 ways,
        # and disabling the kernel there would cost ~28x latency for zero
        # parallelism.  Per-surface selection happens in _build_infer.
        self.mesh = mesh
        self._dp = int(mesh.shape['data']) if mesh is not None else 1
        # Request RNG, concurrency-safe: the old ``self._rng, key =
        # jax.random.split(self._rng)`` read-modify-write races under
        # ThreadingHTTPServer (two requests could read the same key or lose
        # an update).  Instead each request folds a fresh counter value into
        # a fixed base key: ``next()`` on itertools.count is atomic under
        # the GIL and fold_in is pure, so no lock is needed.
        self._rng_base = jax.random.PRNGKey(seed)
        self._rng_count = itertools.count()
        self.kanji2pinyin = frontend.KanjiPinyin(kanji_table)

        # acoustic params
        dummy = self._dummy_batch()
        state = init_state(self.cfg, jax.random.PRNGKey(0), dummy)
        if acoustic_dir:
            restored = ckpt.restore_acoustic(acoustic_dir, state)
            if restored is not None:
                state = restored
        self.acoustic_params = state.params

        # vocoder params (jitted init; see acoustic_step.init_state)
        gen = make_generator(self.cfg)
        fps = self.cfg.audio.frames_per_segment
        mel0 = jnp.zeros((1, fps, self.cfg.audio.n_mel))
        tmpl0 = jnp.zeros((1, fps * self.cfg.audio.hop_length, 1))
        gvars = jax.jit(lambda m, t: gen.init(
            {'params': jax.random.PRNGKey(1),
             'noise': jax.random.PRNGKey(2)}, m, t, train=False))(mel0, tmpl0)
        self.gen_params = gvars['params']
        if vocoder_dir:
            restored = ckpt.restore_generator_params(vocoder_dir, self.gen_params)
            if restored is not None:
                self.gen_params = restored

        self._infer_fn = functools.lru_cache(maxsize=16)(self._build_infer)
        self._vocode_fn = functools.lru_cache(maxsize=32)(self._build_vocode)
        self._vocode_batch_fn = functools.lru_cache(maxsize=16)(
            self._build_vocode_batch)
        self._tts_fused_fn = functools.lru_cache(maxsize=16)(
            self._build_tts_fused)
        self._gl_fn = functools.lru_cache(maxsize=32)(self._build_gl)

    # ------------------------------------------------------------------
    # request RNG
    # ------------------------------------------------------------------
    def _next_key(self):
        """Fresh per-request PRNG key; safe under concurrent callers."""
        return jax.random.fold_in(self._rng_base, next(self._rng_count))

    def content_key(self, data: bytes):
        """PRNG key derived from request CONTENT (not arrival order): the
        same payload always synthesizes the same audio, so a batching
        server's output is independent of how requests coalesce."""
        return jax.random.fold_in(self._rng_base, zlib.crc32(data))

    # ------------------------------------------------------------------
    # jitted stage builders (cached per shape bucket)
    # ------------------------------------------------------------------
    def _jit_sharded(self, fn, batch_argnums, n_args):
        """jit with mesh-DP shardings: batch args split on 'data', params
        replicated.  Falls back to plain jit when no mesh is configured.
        Single-request paths (tts_fused, vocode, _build_gl) stay unsharded
        on purpose -- a batch of 1 cannot split over the data axis."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P('data'))
        in_sh = tuple(dat if i in batch_argnums else rep
                      for i in range(n_args))
        return jax.jit(fn, in_shardings=in_sh)

    def _select_fused(self, sharded: bool) -> bool:
        """Pallas fused decoder vs flax scan for an acoustic program: the
        fused kernel is a custom call GSPMD cannot partition, so sharded
        (mesh-DP batched) programs fall back to the flax scan; everything
        else follows the constructor's ``fused_decoder`` choice."""
        return self.fused_decoder and not (sharded and self.mesh is not None)

    def _pad_rows(self, b: int) -> int:
        """Batch rows to allocate so the compile-key space stays small
        (power of two) and, under mesh DP, every shard gets equal rows."""
        b_pad = 1 << (b - 1).bit_length()
        if self._dp > 1:
            b_pad = _round_up(b_pad, self._dp)
        return b_pad

    def _dummy_batch(self) -> Dict[str, jnp.ndarray]:
        r = self.cfg.acoustic.outputs_per_step
        t = 4 * r
        return {
            'text': jnp.zeros((1, 8, 2), jnp.int32),
            'text_lengths': jnp.asarray([8]),
            'prds': jnp.zeros((1, 8), jnp.int32),
            'spec_lengths': jnp.asarray([t]),
            'mel_targets': jnp.zeros((1, t, self.cfg.audio.n_mel)),
            'f0_targets': jnp.zeros((1, t), jnp.int32),
            'c0_targets': jnp.zeros((1, t), jnp.int32),
        }

    def _build_infer(self, n_pad: int, sharded: bool = False):
        """Acoustic inference program for one text bucket.

        ``sharded=True`` marks the batched-serving call sites: under mesh
        DP those must take the flax-scan path (the pallas decode kernel is
        a custom call GSPMD cannot partition over the batch axis) with the
        batch dim sharded over 'data'.  Single-request call sites pass
        ``sharded=False`` and keep the fused kernel regardless of mesh."""
        cfg, steps = self.cfg, self.max_iters

        if self._select_fused(sharded):
            # encoder (flax) -> single-launch pallas decode (whole AR loop in
            # one kernel, early exit once every row stops) -> standalone
            # posnet (see ops/fused_decoder.fused_decode_full)
            from ..models.acoustic import posnet_apply
            from ..ops.fused_decoder import fused_decode_full
            # compiled pallas is TPU-only; interpret mode elsewhere (tests)
            interpret = jax.default_backend() != 'tpu'

            @jax.jit
            def fn(params, text, text_lengths):
                model = Tacotron(cfg)
                enc = model.apply({'params': params}, text, text_lengths,
                                  train=False, encoder_only=True)
                out = fused_decode_full(params['decoder_cell'], cfg,
                                        enc['keys'], enc['values'],
                                        enc['mask'], steps,
                                        interpret=interpret, early_exit=True)
                out['mag_outputs'] = posnet_apply(params, out['mel_outputs'], cfg)
                out['prds_out'] = enc['prds_out']
                return out
            return fn

        def fn(params, text, text_lengths):
            model = Tacotron(cfg)
            return model.apply({'params': params}, text, text_lengths,
                               train=False, max_iters=steps)
        return self._jit_sharded(fn, {1, 2}, 3) if sharded else jax.jit(fn)

    def _build_gl(self, n_frames: int):
        cfg = self.cfg

        @jax.jit
        def fn(mag_natural, key):
            """natural |STFT| [F, T] -> GL wav (acoustic 30-iter flavor)."""
            y = dsp.griffin_lim(mag_natural ** cfg.audio.gl_power,
                                cfg.audio.gl_iters_acoustic,
                                cfg.audio.hop_length, cfg.audio.win_length,
                                cfg.audio.window_fn, momentum=0.0, key=key)
            return dsp.inv_preemphasis(y, cfg.audio.preemphasis)
        return fn

    def _build_vocode(self, n_frames: int):
        cfg = self.cfg

        @jax.jit
        def fn(gen_params, mag_natural, key):
            """natural |STFT| [F, T] -> neural wav (retunegan/server.py:33-62)."""
            mel = jnp.log(jnp.clip(dsp.mag_to_mel(mag_natural, cfg.audio),
                                   min=dsp.EPS_AMP))
            log_mag = jnp.log(jnp.clip(mag_natural, min=dsp.EPS_AMP))
            # length = hop*T - 1 then pad 1: keeps GL's internal STFT at T
            # frames (the reference's trick, ``retunegan/server.py:41-43``)
            wavlen = cfg.audio.hop_length * n_frames
            tmpl = dsp.inv_log_mag(log_mag, cfg.audio, length=wavlen - 1, key=key)
            tmpl = jnp.pad(tmpl, (0, 1))
            gen = make_generator(cfg)
            with compute_dtype(self.infer_dtype):
                wav = gen.apply({'params': gen_params}, mel.T[None],
                                tmpl[None, :, None], train=False)
            return wav[0, :, 0].astype(jnp.float32)
        return fn

    def _build_vocode_batch(self, n_frames: int):
        """One generator forward for a whole batch of specs [B, F, T].

        The GL template is vmapped (the DFT matmuls become batched matmuls
        on the MXU) and the conv generator runs natively batched, so the
        vocoder stage's launch overhead amortizes across streams instead of
        being paid per spec (round-1 ``tts_batch`` vocoded serially)."""
        cfg = self.cfg

        def fn(gen_params, mags, keys):
            def mel_and_tmpl(mag_natural, key):
                mel = jnp.log(jnp.clip(dsp.mag_to_mel(mag_natural, cfg.audio),
                                       min=dsp.EPS_AMP))
                log_mag = jnp.log(jnp.clip(mag_natural, min=dsp.EPS_AMP))
                wavlen = cfg.audio.hop_length * n_frames
                tmpl = dsp.inv_log_mag(log_mag, cfg.audio, length=wavlen - 1,
                                       key=key)
                return mel.T, jnp.pad(tmpl, (0, 1))

            mels, tmpls = jax.vmap(mel_and_tmpl)(mags, keys)
            gen = make_generator(cfg)
            with compute_dtype(self.infer_dtype):
                wavs = gen.apply({'params': gen_params}, mels, tmpls[..., None],
                                 train=False)
            return wavs[..., 0].astype(jnp.float32)
        return self._jit_sharded(fn, {1, 2}, 3)

    def _build_tts_fused(self, n_pad: int):
        """ONE jitted dispatch for text -> wav (single-request latency path:
        the staged surfaces pay ~6 host round trips; this pays one).  The
        vocoder runs at the full ``max_iters`` decode length and the wav is
        trimmed on the host, so it does more device work than the staged
        path for short utterances but far fewer dispatches."""
        cfg, steps = self.cfg, self.max_iters

        if self.fused_decoder:
            from ..models.acoustic import posnet_apply
            from ..ops.fused_decoder import fused_decode_full
            interpret = jax.default_backend() != 'tpu'

            def acoustic(params, text, lens):
                model = Tacotron(cfg)
                enc = model.apply({'params': params}, text, lens,
                                  train=False, encoder_only=True)
                out = fused_decode_full(params['decoder_cell'], cfg,
                                        enc['keys'], enc['values'],
                                        enc['mask'], steps,
                                        interpret=interpret, early_exit=True)
                return (posnet_apply(params, out['mel_outputs'], cfg),
                        out['out_lengths'])
        else:
            def acoustic(params, text, lens):
                model = Tacotron(cfg)
                out = model.apply({'params': params}, text, lens,
                                  train=False, max_iters=steps)
                return out['mag_outputs'], out['out_lengths']

        @jax.jit
        def fn(ac_params, gen_params, text, lens, key):
            mag, out_len = acoustic(ac_params, text, lens)
            s = dsp.spec_to_natural_scale(mag[0].T, cfg.audio)
            s = dsp.fix_zero_dc(s, cfg.audio)
            mel = jnp.log(jnp.clip(dsp.mag_to_mel(s, cfg.audio),
                                   min=dsp.EPS_AMP))
            log_mag = jnp.log(jnp.clip(s, min=dsp.EPS_AMP))
            t_frames = steps * cfg.acoustic.outputs_per_step
            wavlen = cfg.audio.hop_length * t_frames
            tmpl = dsp.inv_log_mag(log_mag, cfg.audio, length=wavlen - 1,
                                   key=key)
            tmpl = jnp.pad(tmpl, (0, 1))
            gen = make_generator(cfg)
            with compute_dtype(self.infer_dtype):
                wav = gen.apply({'params': gen_params}, mel.T[None],
                                tmpl[None, :, None], train=False)
            return wav[0, :, 0].astype(jnp.float32), out_len[0]
        return fn

    def tts_fused(self, pinyin: str) -> np.ndarray:
        """Single-dispatch text -> wav (latency-optimal single requests)."""
        seq = frontend.serialize_inference(pinyin, self.cfg.acoustic.g2p)
        n = seq.shape[0]
        n_pad = _round_up(max(n, 1), self.cfg.acoustic.text_bucket)
        text = np.zeros((1, n_pad, 2), np.int32)
        text[0, :n] = seq
        key = self._next_key()
        wav, out_len = self._tts_fused_fn(n_pad)(
            self.acoustic_params, self.gen_params, jnp.asarray(text),
            jnp.asarray([n]), key)
        t_real = int(out_len)
        return np.asarray(wav)[:self.cfg.audio.hop_length * t_real].astype(
            np.float32)

    # ------------------------------------------------------------------
    # public surfaces
    # ------------------------------------------------------------------
    def _run_acoustic(self, pinyin: str) -> np.ndarray:
        """pinyin -> normalized mag [T, F-1] trimmed to the stop token."""
        seq = frontend.serialize_inference(pinyin, self.cfg.acoustic.g2p)
        n = seq.shape[0]
        n_pad = _round_up(max(n, 1), self.cfg.acoustic.text_bucket)
        text = np.zeros((1, n_pad, 2), np.int32)
        text[0, :n] = seq
        out = self._infer_fn(n_pad)(self.acoustic_params, jnp.asarray(text),
                                    jnp.asarray([n]))
        length = int(out['out_lengths'][0])
        return np.asarray(out['mag_outputs'][0])[:length]

    def synthesize_with_alignment(self, pinyin: str) -> Dict[str, np.ndarray]:
        """Free-running synthesis that also returns the decoder alignment.

        Evidence/diagnostic surface (the reference plots the alignment at
        eval time, ``transtacos/train.py:109-118``): returns the natural-scale
        spec [F, T], the alignment [n_text, n_steps] trimmed to the true text
        length and stop-token decode length, and the frame count."""
        seq = frontend.serialize_inference(pinyin, self.cfg.acoustic.g2p)
        n = seq.shape[0]
        n_pad = _round_up(max(n, 1), self.cfg.acoustic.text_bucket)
        text = np.zeros((1, n_pad, 2), np.int32)
        text[0, :n] = seq
        out = self._infer_fn(n_pad)(self.acoustic_params, jnp.asarray(text),
                                    jnp.asarray([n]))
        r = self.cfg.acoustic.outputs_per_step
        t_real = int(out['out_lengths'][0])
        mag = np.asarray(out['mag_outputs'][0])[:t_real].T   # [F-1, T]
        s = dsp.spec_to_natural_scale(jnp.asarray(mag), self.cfg.audio)
        s = np.asarray(dsp.fix_zero_dc(s, self.cfg.audio))
        align = np.asarray(out['alignments'][0])[:n, :t_real // r]
        return {'spec': s, 'alignment': align, 'n_frames': t_real}

    def synthesize_spec(self, pinyin: str) -> np.ndarray:
        """Natural-scale spec [F, T] with DC restored (pickle payload parity)."""
        mag = self._run_acoustic(pinyin).T                   # [F-1, T]
        s = dsp.spec_to_natural_scale(jnp.asarray(mag), self.cfg.audio)
        s = dsp.fix_zero_dc(s, self.cfg.audio)
        return np.asarray(s)

    def _bucket_spec(self, spec: np.ndarray, bucket: int = 64) -> np.ndarray:
        """Pad [F, T] to a frame bucket with near-silence so each bucket
        compiles once; callers trim the wav back to the true length."""
        t = spec.shape[1]
        t_pad = _round_up(max(t, bucket), bucket)
        if t_pad == t:
            return spec
        pad = np.full((spec.shape[0], t_pad - t), float(spec.min()),
                      spec.dtype)
        return np.concatenate([spec, pad], axis=1)

    def synthesize_wav(self, pinyin: str, trim: bool = True) -> np.ndarray:
        """Internal Griffin-Lim vocoding (reference ``synth.py:80-83``)."""
        spec = self.synthesize_spec(pinyin)
        t_real = spec.shape[1]
        spec = self._bucket_spec(spec)
        key = self._next_key()
        wav = np.asarray(self._gl_fn(spec.shape[1])(jnp.asarray(spec), key))
        wav = wav[:self.cfg.audio.hop_length * t_real]
        if trim:
            wav = features.trim_silence(wav, self.cfg.audio)
        return wav.astype(np.float32)

    def vocode(self, spec: np.ndarray, key=None) -> np.ndarray:
        """Natural-scale spec (either orientation) -> neural wav.

        ``key`` overrides the GL-template phase-init key (a batching server
        passes ``content_key`` so output is arrival-order independent)."""
        if spec.shape[0] not in (self.cfg.audio.n_freq, self.cfg.audio.n_freq - 1):
            spec = spec.T                                    # orient to [F, T]
        spec = np.asarray(dsp.fix_zero_dc(jnp.asarray(spec), self.cfg.audio))
        t_real = spec.shape[1]
        spec = self._bucket_spec(spec)
        if key is None:
            key = self._next_key()
        wav = self._vocode_fn(spec.shape[1])(self.gen_params,
                                             jnp.asarray(spec), key)
        return np.asarray(wav)[:self.cfg.audio.hop_length * t_real].astype(np.float32)

    def vocode_batch(self, specs: List[np.ndarray],
                     keys: Optional[List] = None) -> List[np.ndarray]:
        """Batched neural vocoding: one GL-template + one generator call.

        Specs pad to a common frame bucket with per-spec near-silence and
        the batch pads to a power of two (bounding the compile-key space);
        each wav trims back to its spec's true length.  ``keys`` optionally
        pins one PRNG key per spec (content-derived keys make the output
        independent of batch composition -- the batching server relies on
        this)."""
        if not specs:
            return []
        if keys is not None and len(keys) != len(specs):
            raise ValueError(f'{len(keys)} keys for {len(specs)} specs')
        n_freq = self.cfg.audio.n_freq
        oriented = []
        for s in specs:
            if s.shape[0] not in (n_freq, n_freq - 1):
                s = s.T
            oriented.append(np.asarray(
                dsp.fix_zero_dc(jnp.asarray(s), self.cfg.audio)))
        t_real = [s.shape[1] for s in oriented]
        t_pad = _round_up(max(max(t_real), 64), 64)
        b = len(oriented)
        b_pad = self._pad_rows(b)
        mags = np.zeros((b_pad, n_freq, t_pad), np.float32)
        for i, s in enumerate(oriented):
            mags[i, :, :s.shape[1]] = s
            mags[i, :, s.shape[1]:] = float(s.min())
        mags[b:] = mags[:1]                       # fill rows = real work
        if keys is None:
            key_arr = jax.random.split(self._next_key(), b_pad)
        else:
            key_arr = jnp.stack(list(keys) + [keys[0]] * (b_pad - b))
        wavs = np.asarray(self._vocode_batch_fn(t_pad)(
            self.gen_params, jnp.asarray(mags), key_arr))
        hop = self.cfg.audio.hop_length
        return [wavs[i, :hop * t_real[i]].astype(np.float32)
                for i in range(b)]

    def synthesize_spec_batch(self, pinyins: List[str]) -> List[np.ndarray]:
        """Batched acoustic synthesis: one decode scan for many requests.

        Texts are padded to a common bucket; the per-utterance stop token
        trims each output.  This is the production-QPS path -- the decoder's
        cost is per-step, so batching is nearly free until MXU saturation.
        """
        if not pinyins:
            raise ValueError('synthesize_spec_batch requires at least one input')
        seqs = [frontend.serialize_inference(p, self.cfg.acoustic.g2p)
                for p in pinyins]
        n_max = max(s.shape[0] for s in seqs)
        n_pad = _round_up(max(n_max, 1), self.cfg.acoustic.text_bucket)
        b = len(seqs)
        # batch size is part of the compile key: pad rows to a power of two
        # (and, under mesh DP, a multiple of the data axis) so the decode --
        # the most expensive compile in the server -- traces once per
        # bucket, not once per request count.  Fill rows repeat request 0
        # and are dropped below.
        b_pad = self._pad_rows(b)
        text = np.zeros((b_pad, n_pad, 2), np.int32)
        lens = np.zeros((b_pad,), np.int32)
        for i in range(b_pad):
            s = seqs[i if i < b else 0]
            text[i, :s.shape[0]] = s
            lens[i] = s.shape[0]
        out = self._infer_fn(n_pad, True)(self.acoustic_params,
                                          jnp.asarray(text),
                                          jnp.asarray(lens))
        mags = np.asarray(out['mag_outputs'])
        lengths = np.asarray(out['out_lengths'])
        specs = []
        for i in range(b):
            mag = mags[i, :int(lengths[i])].T            # [F-1, T]
            s = dsp.spec_to_natural_scale(jnp.asarray(mag), self.cfg.audio)
            specs.append(np.asarray(dsp.fix_zero_dc(s, self.cfg.audio)))
        return specs

    def tts_batch(self, texts: List[str], neural: bool = True,
                  keys: Optional[List] = None) -> List[np.ndarray]:
        """Batched text->wav for throughput serving."""
        pinyins = []
        for t in texts:
            if frontend.looks_like_pinyin(t):
                pinyins.append(t.strip().lower())
            else:
                segs = frontend.normalize_text(t)
                pinyins.append(' '.join(self.kanji2pinyin(s) for s in segs))
        specs = self.synthesize_spec_batch(pinyins)
        if neural:
            return self.vocode_batch(specs, keys=keys)
        wavs = []
        for s in specs:
            t_real = s.shape[1]
            sp = self._bucket_spec(s)
            key = self._next_key()
            w = np.asarray(self._gl_fn(sp.shape[1])(jnp.asarray(sp), key))
            wavs.append(features.trim_silence(
                w[:self.cfg.audio.hop_length * t_real].astype(np.float32),
                self.cfg.audio))
        return wavs

    def tts(self, text: str, neural: bool = True) -> np.ndarray:
        """Full text -> wav.  Accepts kanji (with a pinyin provider) or
        numbered pinyin; clause-splits long inputs like the reference WebUI."""
        if frontend.looks_like_pinyin(text):
            segs_pinyin: List[str] = [text.strip().lower()]
        else:
            segs = frontend.normalize_text(text)
            segs_pinyin = [self.kanji2pinyin(s) for s in segs]
        if neural and len(segs_pinyin) == 1:
            # one clause -> the single-dispatch path (2.7x lower latency)
            return self.tts_fused(segs_pinyin[0])
        specs = [self.synthesize_spec(p) for p in segs_pinyin]
        spec = np.concatenate(specs, axis=1)
        if neural:
            return self.vocode(spec)
        key = self._next_key()
        wav = np.asarray(self._gl_fn(spec.shape[1])(jnp.asarray(spec), key))
        return features.trim_silence(wav.astype(np.float32), self.cfg.audio)
