"""Fused pallas decoder equivalence vs the flax scanned cell (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.models import decoder as dec
from transtacos_retunegan_tpu.ops import fused_decoder as F

CFG = dataclasses.replace(
    Config(),
    acoustic=dataclasses.replace(
        Config().acoustic, decoder_depth=64, attention_depth=16,
        prenet_depths=(32,), encoder_depth=32),
)
B, N, STEPS = 2, 24, 6


@pytest.fixture(scope='module')
def setup():
    r = np.random.RandomState(0)
    keys = jnp.asarray(r.randn(B, N, 16).astype(np.float32) * 0.3)
    values = jnp.asarray(r.randn(B, N, 32).astype(np.float32) * 0.3)
    lens = np.asarray([N, N - 5])
    mask = jnp.asarray((np.arange(N)[None, :] < lens[:, None]).astype(np.float32))
    attn = dec.AttentionParams(keys, values * mask[..., None], mask)

    cell = dec.make_scanned_cell(CFG, 'infer')
    carry = dec.init_carry(B, N, CFG)
    xs = {'target_prev': jnp.zeros((STEPS, B, CFG.audio.n_mel))}
    variables = cell.init({'params': jax.random.PRNGKey(0)},
                          (carry, attn, jnp.asarray(0.0)), xs)
    return variables['params'], attn


def run_flax(params, attn):
    cell = dec.make_scanned_cell(CFG, 'infer')
    carry = dec.init_carry(B, N, CFG)
    xs = {'target_prev': jnp.zeros((STEPS, B, CFG.audio.n_mel))}
    (carry, _, _), ys = cell.apply({'params': params},
                                   (carry, attn, jnp.asarray(0.0)), xs)
    r = CFG.acoustic.outputs_per_step
    mel = ys['frames'].transpose(1, 0, 2).reshape(B, STEPS * r, CFG.audio.n_mel)
    stop = ys['stop'].transpose(1, 0, 2).reshape(B, STEPS * r)
    align = ys['alignments'].transpose(1, 2, 0)
    return mel, stop, align, ys['finished']


class TestFusedDecoder:
    def test_matches_flax_cell_fp32(self, setup):
        params, attn = setup
        mel_r, stop_r, align_r, fin_r = run_flax(params, attn)
        out = F.fused_decode(params, CFG, attn.keys, attn.values, attn.mask,
                             STEPS, interpret=True, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out['mel_outputs']),
                                   np.asarray(mel_r), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out['stop_token_outputs']),
                                   np.asarray(stop_r), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out['alignments']),
                                   np.asarray(align_r), atol=2e-4)
        # out_lengths agree with the flax finished trace
        fin_any = np.asarray(fin_r).any(axis=0)
        first = np.asarray(fin_r).argmax(axis=0)
        expect = np.where(fin_any, first + 1, STEPS) * CFG.acoustic.outputs_per_step
        np.testing.assert_array_equal(np.asarray(out['out_lengths']), expect)

    def test_nondefault_prenet_and_gru_depths(self):
        """Multi-layer prenet + 3 GRUs: the generalized fold/kernels match
        the flax cell (round-1 fold_params asserted single-layer prenet and
        hardcoded exactly 2 GRUs)."""
        cfg = dataclasses.replace(
            Config(),
            acoustic=dataclasses.replace(
                Config().acoustic, decoder_depth=64, attention_depth=16,
                prenet_depths=(48, 32), decoder_layers=3, encoder_depth=32))
        r = np.random.RandomState(3)
        keys = jnp.asarray(r.randn(B, N, 16).astype(np.float32) * 0.3)
        values = jnp.asarray(r.randn(B, N, 32).astype(np.float32) * 0.3)
        lens = np.asarray([N, N - 7])
        mask = jnp.asarray((np.arange(N)[None, :] < lens[:, None]).astype(np.float32))
        attn = dec.AttentionParams(keys, values * mask[..., None], mask)

        cell = dec.make_scanned_cell(cfg, 'infer')
        carry = dec.init_carry(B, N, cfg)
        xs = {'target_prev': jnp.zeros((STEPS, B, cfg.audio.n_mel))}
        params = cell.init({'params': jax.random.PRNGKey(1)},
                           (carry, attn, jnp.asarray(0.0)), xs)['params']
        (_, _, _), ys = cell.apply({'params': params},
                                   (dec.init_carry(B, N, cfg), attn,
                                    jnp.asarray(0.0)), xs)
        rr = cfg.acoustic.outputs_per_step
        mel_r = ys['frames'].transpose(1, 0, 2).reshape(B, STEPS * rr,
                                                        cfg.audio.n_mel)
        out = F.fused_decode(params, cfg, attn.keys, attn.values, attn.mask,
                             STEPS, interpret=True, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out['mel_outputs']),
                                   np.asarray(mel_r), atol=2e-4)

    def test_bf16_close(self, setup):
        params, attn = setup
        mel_r, _, _, _ = run_flax(params, attn)
        out = F.fused_decode(params, CFG, attn.keys, attn.values, attn.mask,
                             STEPS, interpret=True, dtype=jnp.bfloat16)
        # bf16 weights, f32 accumulation: mel within a few 1e-2 absolute
        diff = np.abs(np.asarray(out['mel_outputs']) - np.asarray(mel_r))
        assert diff.max() < 0.05, diff.max()

    def test_posnet_apply_matches_module(self, setup):
        """posnet_apply(params) == the in-module posnet on the same mel."""
        import dataclasses as dc
        from transtacos_retunegan_tpu.models.acoustic import (Tacotron,
                                                              posnet_apply)
        from transtacos_retunegan_tpu.train.acoustic_step import init_state
        cfg = dc.replace(
            Config(), acoustic=dc.replace(
                Config().acoustic, embed_depth=32, encoder_depth=32,
                decoder_depth=64, attention_depth=16, prenet_depths=(32,),
                posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
                prdsnet_depth=16, posenc_depth=8, max_iters=4))
        r = CFG.acoustic.outputs_per_step
        rng = np.random.RandomState(1)
        batch = {
            'text': jnp.asarray(np.stack([rng.randint(4, 50, (1, 8)),
                                          rng.randint(0, 6, (1, 8))], -1)),
            'text_lengths': jnp.asarray([8]),
            'prds': jnp.zeros((1, 8), jnp.int32),
            'spec_lengths': jnp.asarray([4 * r]),
            'mel_targets': jnp.asarray(rng.randn(1, 4 * r, 80).astype(np.float32)),
            'f0_targets': jnp.zeros((1, 4 * r), jnp.int32),
            'c0_targets': jnp.zeros((1, 4 * r), jnp.int32),
        }
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        model = Tacotron(cfg)
        out = model.apply({'params': state.params}, batch['text'],
                          batch['text_lengths'], train=False, max_iters=4)
        mag2 = posnet_apply(state.params, out['mel_outputs'], cfg)
        np.testing.assert_allclose(np.asarray(mag2),
                                   np.asarray(out['mag_outputs']), atol=1e-5)

    def test_encoder_only_exposes_attention(self, setup):
        import dataclasses as dc
        from transtacos_retunegan_tpu.models.acoustic import Tacotron
        from transtacos_retunegan_tpu.train.acoustic_step import init_state
        cfg = dc.replace(
            Config(), acoustic=dc.replace(
                Config().acoustic, embed_depth=32, encoder_depth=32,
                decoder_depth=64, attention_depth=16, prenet_depths=(32,),
                posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
                prdsnet_depth=16, posenc_depth=8, max_iters=4))
        r = cfg.acoustic.outputs_per_step
        rng = np.random.RandomState(1)
        batch = {
            'text': jnp.asarray(np.stack([rng.randint(4, 50, (1, 8)),
                                          rng.randint(0, 6, (1, 8))], -1)),
            'text_lengths': jnp.asarray([8]),
            'prds': jnp.zeros((1, 8), jnp.int32),
            'spec_lengths': jnp.asarray([4 * r]),
            'mel_targets': jnp.asarray(rng.randn(1, 4 * r, 80).astype(np.float32)),
            'f0_targets': jnp.zeros((1, 4 * r), jnp.int32),
            'c0_targets': jnp.zeros((1, 4 * r), jnp.int32),
        }
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        model = Tacotron(cfg)
        enc = model.apply({'params': state.params}, batch['text'],
                          batch['text_lengths'], train=False,
                          encoder_only=True)
        assert enc['keys'].shape == (1, 8, 16)
        assert enc['values'].shape == (1, 8, 32)
        assert enc['mask'].shape == (1, 8)

    def test_full_pipeline_fused_vs_flax(self, setup):
        """encoder_only + fused_decode + posnet == full flax infer."""
        import dataclasses as dc
        from transtacos_retunegan_tpu.models.acoustic import (Tacotron,
                                                              posnet_apply)
        from transtacos_retunegan_tpu.train.acoustic_step import init_state
        cfg = dc.replace(
            Config(), acoustic=dc.replace(
                Config().acoustic, embed_depth=32, encoder_depth=32,
                decoder_depth=64, attention_depth=16, prenet_depths=(32,),
                posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
                prdsnet_depth=16, posenc_depth=8, max_iters=5))
        r = cfg.acoustic.outputs_per_step
        rng = np.random.RandomState(2)
        batch = {
            'text': jnp.asarray(np.stack([rng.randint(4, 50, (1, 10)),
                                          rng.randint(0, 6, (1, 10))], -1)),
            'text_lengths': jnp.asarray([10]),
            'prds': jnp.zeros((1, 10), jnp.int32),
            'spec_lengths': jnp.asarray([4 * r]),
            'mel_targets': jnp.asarray(rng.randn(1, 4 * r, 80).astype(np.float32)),
            'f0_targets': jnp.zeros((1, 4 * r), jnp.int32),
            'c0_targets': jnp.zeros((1, 4 * r), jnp.int32),
        }
        state = init_state(cfg, jax.random.PRNGKey(0), batch)
        model = Tacotron(cfg)
        ref = model.apply({'params': state.params}, batch['text'],
                          batch['text_lengths'], train=False, max_iters=5)
        enc = model.apply({'params': state.params}, batch['text'],
                          batch['text_lengths'], train=False,
                          encoder_only=True)
        fused = F.fused_decode(state.params['decoder_cell'], cfg,
                               enc['keys'], enc['values'], enc['mask'],
                               5, interpret=True, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(fused['mel_outputs']),
                                   np.asarray(ref['mel_outputs']), atol=2e-4)
        mag = posnet_apply(state.params, fused['mel_outputs'], cfg)
        np.testing.assert_allclose(np.asarray(mag),
                                   np.asarray(ref['mag_outputs']), atol=2e-3)
        np.testing.assert_array_equal(np.asarray(fused['out_lengths']),
                                      np.asarray(ref['out_lengths']))


class TestWholeDecodeKernel:
    """Single-launch whole-decode kernel (``fused_decode_full``): the AR
    loop as a sequential pallas grid with the carry in VMEM scratch; optional
    early exit once every batch row has stopped."""

    def test_matches_per_step_kernel(self, setup):
        params, attn = setup
        a = F.fused_decode(params, CFG, attn.keys, attn.values, attn.mask,
                           STEPS, interpret=True, dtype=jnp.float32)
        b = F.fused_decode_full(params, CFG, attn.keys, attn.values,
                                attn.mask, STEPS, interpret=True,
                                dtype=jnp.float32)
        for k in ['mel_outputs', 'stop_token_outputs', 'alignments',
                  'out_lengths']:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_early_exit_matches_trimmed(self, setup):
        """With early exit, everything up to each row's stop token (and the
        impute-zeroed mel tail) is bit-identical; only the post-all-finished
        stop/align emissions (which callers trim) are zeroed."""
        params, attn = setup
        a = F.fused_decode(params, CFG, attn.keys, attn.values, attn.mask,
                           STEPS, interpret=True, dtype=jnp.float32)
        b = F.fused_decode_full(params, CFG, attn.keys, attn.values,
                                attn.mask, STEPS, interpret=True,
                                dtype=jnp.float32, early_exit=True)
        np.testing.assert_array_equal(np.asarray(a['out_lengths']),
                                      np.asarray(b['out_lengths']))
        r = CFG.acoustic.outputs_per_step
        # mel is impute-zeroed past finish in BOTH paths: full equality
        np.testing.assert_array_equal(np.asarray(a['mel_outputs']),
                                      np.asarray(b['mel_outputs']))
        for i in range(B):
            L = int(a['out_lengths'][i])
            np.testing.assert_array_equal(
                np.asarray(a['stop_token_outputs'][i, :L]),
                np.asarray(b['stop_token_outputs'][i, :L]))
            np.testing.assert_array_equal(
                np.asarray(a['alignments'][i, :, :L // r]),
                np.asarray(b['alignments'][i, :, :L // r]))

    def test_no_stop_runs_all_steps(self, setup):
        """A decode where no row ever stops must execute every step under
        early exit (full equality with the per-step kernel)."""
        import flax
        params, attn = setup
        flat = flax.traverse_util.flatten_dict(params)
        flat[('stop_projection', 'bias')] = jnp.full_like(
            flat[('stop_projection', 'bias')], -20.0)
        nostop = flax.traverse_util.unflatten_dict(flat)
        a = F.fused_decode(nostop, CFG, attn.keys, attn.values, attn.mask,
                           STEPS, interpret=True, dtype=jnp.float32)
        b = F.fused_decode_full(nostop, CFG, attn.keys, attn.values,
                                attn.mask, STEPS, interpret=True,
                                dtype=jnp.float32, early_exit=True)
        assert int(a['out_lengths'][0]) == STEPS * CFG.acoustic.outputs_per_step
        for k in ['mel_outputs', 'stop_token_outputs', 'alignments',
                  'out_lengths']:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_vmem_fallback(self, setup, monkeypatch):
        """Oversized shapes fall back to the per-step kernel with identical
        results (budget forced to 0 so any shape trips it)."""
        params, attn = setup
        a = F.fused_decode(params, CFG, attn.keys, attn.values, attn.mask,
                           STEPS, interpret=True, dtype=jnp.float32)
        monkeypatch.setattr(F, '_VMEM_BUDGET_BYTES', 0)
        b = F.fused_decode_full(params, CFG, attn.keys, attn.values,
                                attn.mask, STEPS, interpret=True,
                                dtype=jnp.float32, early_exit=True)
        for k in ['mel_outputs', 'stop_token_outputs', 'alignments',
                  'out_lengths']:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_nondefault_depths(self):
        """Arbitrary prenet/GRU depths through the whole-decode kernel."""
        cfg = dataclasses.replace(
            Config(),
            acoustic=dataclasses.replace(
                Config().acoustic, decoder_depth=64, attention_depth=16,
                prenet_depths=(48, 32), decoder_layers=3, encoder_depth=32))
        r = np.random.RandomState(3)
        keys = jnp.asarray(r.randn(B, N, 16).astype(np.float32) * 0.3)
        values = jnp.asarray(r.randn(B, N, 32).astype(np.float32) * 0.3)
        lens = np.asarray([N, N - 7])
        mask = jnp.asarray(
            (np.arange(N)[None, :] < lens[:, None]).astype(np.float32))
        attn = dec.AttentionParams(keys, values * mask[..., None], mask)
        cell = dec.make_scanned_cell(cfg, 'infer')
        xs = {'target_prev': jnp.zeros((STEPS, B, cfg.audio.n_mel))}
        params = cell.init({'params': jax.random.PRNGKey(1)},
                           (dec.init_carry(B, N, cfg), attn,
                            jnp.asarray(0.0)), xs)['params']
        a = F.fused_decode(params, cfg, attn.keys, attn.values, attn.mask,
                           STEPS, interpret=True, dtype=jnp.float32)
        b = F.fused_decode_full(params, cfg, attn.keys, attn.values,
                                attn.mask, STEPS, interpret=True,
                                dtype=jnp.float32)
        for k in ['mel_outputs', 'stop_token_outputs', 'alignments',
                  'out_lengths']:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestFoldedBiasesAndLayouts:
    def test_trained_location_conv_bias_survives_folding(self, setup):
        """Regression: fold_params dropped the location conv's bias.  Zero-
        init params can't see it (flax Conv bias inits to zeros), so this
        test perturbs the biases a trained checkpoint would have."""
        params, attn = setup
        p = jax.tree.map(lambda x: x, params)  # shallow copy of dicts below
        r = np.random.RandomState(9)
        lsa = dict(p['lsa'])
        lc = dict(lsa['location_convolution'])
        lc['bias'] = jnp.asarray(r.randn(*lc['bias'].shape).astype(np.float32))
        lsa['location_convolution'] = lc
        lsa['attention_bias'] = jnp.asarray(
            r.randn(*lsa['attention_bias'].shape).astype(np.float32) * 0.3)
        p = dict(p)
        p['lsa'] = lsa

        mel_r, stop_r, align_r, _ = run_flax(p, attn)
        out = F.fused_decode(p, CFG, attn.keys, attn.values, attn.mask,
                             STEPS, interpret=True, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out['alignments']),
                                   np.asarray(align_r), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out['mel_outputs']),
                                   np.asarray(mel_r), atol=2e-4)

    def test_fast_layout_matches_stock_layout(self, setup):
        """fold_params accepts the decoder_fast fused tree and produces the
        same decode as the stock tree it was mapped from."""
        from transtacos_retunegan_tpu.models.decoder_fast import \
            fuse_cell_params
        params, attn = setup
        out_s = F.fused_decode(params, CFG, attn.keys, attn.values, attn.mask,
                               STEPS, interpret=True, dtype=jnp.float32)
        out_f = F.fused_decode(fuse_cell_params(params), CFG, attn.keys,
                               attn.values, attn.mask, STEPS, interpret=True,
                               dtype=jnp.float32)
        for k in ('mel_outputs', 'stop_token_outputs', 'alignments'):
            np.testing.assert_allclose(np.asarray(out_s[k]),
                                       np.asarray(out_f[k]), atol=2e-5,
                                       err_msg=k)
        np.testing.assert_array_equal(np.asarray(out_s['out_lengths']),
                                      np.asarray(out_f['out_lengths']))

    def test_fast_layout_full_kernel(self, setup):
        """fused_decode_full consumes the fused layout too."""
        from transtacos_retunegan_tpu.models.decoder_fast import \
            fuse_cell_params
        params, attn = setup
        out_s = F.fused_decode_full(params, CFG, attn.keys, attn.values,
                                    attn.mask, STEPS, interpret=True,
                                    dtype=jnp.float32)
        out_f = F.fused_decode_full(fuse_cell_params(params), CFG, attn.keys,
                                    attn.values, attn.mask, STEPS,
                                    interpret=True, dtype=jnp.float32)
        for k in ('mel_outputs', 'stop_token_outputs', 'alignments'):
            np.testing.assert_allclose(np.asarray(out_s[k]),
                                       np.asarray(out_f[k]), atol=2e-5,
                                       err_msg=k)
