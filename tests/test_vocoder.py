"""Vocoder tests: all generator variants, discriminators, losses, GAN step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.models import vocoder_losses as L
from transtacos_retunegan_tpu.models.discriminators import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator, MultiStftDiscriminator)
from transtacos_retunegan_tpu.models.generators import GENERATORS, make_generator
from transtacos_retunegan_tpu.train.vocoder_step import (gan_eval_step,
                                                         gan_train_step,
                                                         init_gan_state)

CFG = Config()
HOP = CFG.audio.hop_length
SEG = 2048            # small segment for tests (8 frames)
FRAMES = SEG // HOP
B = 2


def small_cfg(ver='RefineGAN_small'):
    return dataclasses.replace(
        CFG, vocoder=dataclasses.replace(
            CFG.vocoder, generator_ver=ver, upsample_initial_channel=32,
            multi_stft_params=((1024, 512, 120), (512, 256, 60)),
        ))


def gen_inputs(rng, split=False):
    mel = jnp.asarray(rng.randn(B, FRAMES, 80).astype(np.float32))
    tmpl = jnp.asarray(rng.randn(B, SEG, 1).astype(np.float32) * 0.1)
    if not split:
        return mel, tmpl
    uv = jnp.asarray((rng.rand(B, SEG, 1) > 0.5).astype(np.float32))
    return mel, mel, tmpl, tmpl, uv


class TestGenerators:
    @pytest.mark.parametrize('ver', sorted(GENERATORS))
    def test_forward_preserves_length(self, ver, rng):
        cfg = small_cfg(ver)
        gen = make_generator(cfg)
        rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
        if cfg.vocoder.split_cv or ver.endswith('Split'):
            args = gen_inputs(rng, split=True)
        else:
            args = gen_inputs(rng)
        variables = gen.init(rngs, *args, train=True)
        out = gen.apply(variables, *args, train=True,
                        rngs={'noise': jax.random.PRNGKey(2)})
        assert out.shape == (B, SEG, 1), f'{ver}: {out.shape}'
        assert float(jnp.max(jnp.abs(out))) <= 1.0
        assert np.isfinite(np.asarray(out)).all()

    def test_refinegan_small_param_count(self, rng):
        # full-size default config: reference measured 2,748,371 params
        # (retunegan/hparam.py:50); ours should land in the same ballpark
        gen = make_generator(CFG)
        args = gen_inputs(rng)
        variables = gen.init({'params': jax.random.PRNGKey(0),
                              'noise': jax.random.PRNGKey(1)}, *args, train=True)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables['params']))
        assert 2_000_000 < n < 3_600_000, n


class TestDiscriminators:
    def test_msd(self, rng):
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(B, SEG, 1).astype(np.float32))
        msd = MultiScaleDiscriminator(cfg)
        v = msd.init(jax.random.PRNGKey(0), y, y)
        rs, gs, fr, fg = msd.apply(v, y, y * 0.5)
        assert len(rs) == 3 and len(fr[0]) == 6
        # identical inputs give identical scores
        np.testing.assert_allclose(np.asarray(rs[0]),
                                   np.asarray(msd.apply(v, y, y)[1][0]), atol=1e-6)

    def test_mpd_periods_and_padding(self, rng):
        cfg = small_cfg()
        # length not divisible by any period: exercises reflect pad
        y = jnp.asarray(rng.randn(B, SEG - 3, 1).astype(np.float32))
        mpd = MultiPeriodDiscriminator(cfg)
        v = mpd.init(jax.random.PRNGKey(0), y, y)
        rs, gs, fr, fg = mpd.apply(v, y, y)
        assert len(rs) == 4
        for r, g in zip(rs, gs):
            np.testing.assert_allclose(np.asarray(r), np.asarray(g), atol=1e-6)

    def test_mtd(self, rng):
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(B, SEG).astype(np.float32))
        _, sr, sg = L.multi_stft_specs_and_loss(y, y * 0.9, cfg)
        assert sr[0].shape[-1] == 2   # (log-mag, phase) channels
        mtd = MultiStftDiscriminator(cfg)
        v = mtd.init(jax.random.PRNGKey(0), sr, sg)
        rs, gs, fr, fg = mtd.apply(v, sr, sg)
        assert len(rs) == len(cfg.vocoder.multi_stft_params)


class TestLosses:
    def test_mstft_zero_for_identical(self, rng):
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(B, SEG).astype(np.float32))
        loss, _, _ = L.multi_stft_specs_and_loss(y, y, cfg)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_mstft_positive_for_different(self, rng):
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(B, SEG).astype(np.float32))
        loss, _, _ = L.multi_stft_specs_and_loss(y, y * 0.3, cfg)
        assert float(loss) > 0.01

    def test_envelope_dynamic_strip(self, rng):
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(B, SEG).astype(np.float32))
        assert float(L.envelope_loss(y, y, cfg)) == pytest.approx(0.0, abs=1e-6)
        assert float(L.dynamic_loss(y, y, cfg)) == pytest.approx(0.0, abs=1e-6)
        assert float(L.envelope_loss(y, y * 0.2, cfg)) > 0.1
        assert np.isfinite(float(L.strip_mirror_loss(y)))

    def test_lsgan_direction(self):
        cfg = small_cfg()
        good_r = [jnp.ones((B, 10))]
        bad_g = [jnp.zeros((B, 10))]
        # perfect discrimination -> zero D loss
        assert float(L.discriminator_loss(good_r, bad_g, cfg)) == pytest.approx(0.0)
        # fooled discriminator -> zero G loss
        assert float(L.generator_loss(good_r, good_r, cfg)) == pytest.approx(0.0)
        assert float(L.generator_loss(bad_g, good_r, cfg)) == pytest.approx(1.0)

    def test_feature_loss(self, rng):
        a = [[jnp.ones((2, 3)), jnp.zeros((2, 3))]]
        b = [[jnp.zeros((2, 3)), jnp.zeros((2, 3))]]
        assert float(L.feature_loss(a, b)) == pytest.approx(1.0)


class TestGANStep:
    def test_one_step_runs_and_updates(self, rng):
        cfg = small_cfg()
        batch = {
            'mel': jnp.asarray(rng.randn(B, FRAMES, 80).astype(np.float32)),
            'tmpl': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
            'wav': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
        }
        state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
        before = jax.tree.leaves(state.gen_params)[0].copy()
        state2, metrics = gan_train_step(cfg, state, batch, jax.random.PRNGKey(1), 10)
        assert int(state2.step) == 1
        for k in ('loss_gen_all', 'loss_disc_all', 'loss_mstft', 'loss_dyn',
                  'sc_s_r', 'sc_s_g'):
            assert np.isfinite(float(metrics[k])), k
        after = jax.tree.leaves(state2.gen_params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_mstft_drops_when_overfitting(self, rng):
        cfg = small_cfg()
        t = np.arange(SEG) / 22050
        wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        batch = {
            'mel': jnp.asarray(rng.randn(B, FRAMES, 80).astype(np.float32)),
            'tmpl': jnp.asarray(np.stack([wav, wav])),
            'wav': jnp.asarray(np.stack([wav, wav])),
        }
        # same steps_per_epoch as the other GAN-step tests: the static arg is
        # part of the jit key, and this graph is expensive to compile twice
        state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
        first = last = None
        for i in range(12):
            state, m = gan_train_step(cfg, state, batch, jax.random.PRNGKey(i), 10)
            if first is None:
                first = float(m['loss_mstft'])
            last = float(m['loss_mstft'])
        assert last < first, f'{first} -> {last}'

    def test_eval_step(self, rng):
        cfg = small_cfg()
        batch = {
            'mel': jnp.asarray(rng.randn(1, FRAMES, 80).astype(np.float32)),
            'tmpl': jnp.asarray(rng.randn(1, SEG).astype(np.float32) * 0.1),
            'wav': jnp.asarray(rng.randn(1, SEG).astype(np.float32) * 0.1),
        }
        state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
        y_g, metrics = gan_eval_step(cfg, state.gen_params, batch)
        assert y_g.shape == (1, SEG)
        assert all(np.isfinite(float(v)) for v in metrics.values())


class TestMixedPrecision:
    """compute_dtype='bfloat16': f32 master params, bf16 conv stacks
    (``models/precision.py``)."""

    def _bf16_cfg(self):
        cfg = small_cfg()
        return dataclasses.replace(cfg, vocoder=dataclasses.replace(
            cfg.vocoder, compute_dtype='bfloat16'))

    def test_forward_close_to_f32(self, rng):
        from transtacos_retunegan_tpu.train.vocoder_step import apply_generator
        cfg32 = small_cfg()
        cfg16 = self._bf16_cfg()
        batch = {
            'mel': jnp.asarray(rng.randn(B, FRAMES, 80).astype(np.float32)),
            'tmpl': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
            'wav': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
        }
        state = init_gan_state(cfg32, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=10)
        y32 = apply_generator(cfg32, state.gen_params, batch, {}, train=False)
        y16 = apply_generator(cfg16, state.gen_params, batch, {}, train=False)
        assert y16.dtype == jnp.float32          # cast back at the boundary
        # tanh-bounded outputs through a deep bf16 stack: small absolute drift
        assert float(jnp.max(jnp.abs(y32 - y16))) < 0.1
        assert float(jnp.mean(jnp.abs(y32 - y16))) < 0.02

    def test_train_step_bf16_finite_and_params_stay_f32(self, rng):
        # slim discriminators: the full-width bf16 GAN graph takes >6 min to
        # compile on the CPU test backend; width/tower count don't change
        # the cast paths being verified (every WN* layer casts identically)
        cfg = self._bf16_cfg()
        cfg = dataclasses.replace(cfg, vocoder=dataclasses.replace(
            cfg.vocoder, disc_width_mult=0.25, mpd_periods=(3,),
            msd_layers=1, multi_stft_params=((512, 256, 60),)))
        batch = {
            'mel': jnp.asarray(rng.randn(B, FRAMES, 80).astype(np.float32)),
            'tmpl': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
            'wav': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
        }
        state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
        before = np.asarray(jax.tree.leaves(state.gen_params)[0])  # pre-donation
        state2, metrics = gan_train_step(cfg, state, batch, jax.random.PRNGKey(1), 10)
        for k in ('loss_gen_all', 'loss_disc_all', 'loss_mstft'):
            assert np.isfinite(float(metrics[k])), k
        for leaf in jax.tree.leaves(state2.gen_params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state2.disc_params):
            assert leaf.dtype == jnp.float32
        after = jax.tree.leaves(state2.gen_params)[0]
        assert not np.allclose(before, np.asarray(after))

    @pytest.mark.smoke
    def test_ambient_context_resets(self):
        from transtacos_retunegan_tpu.models.precision import (ambient_dtype,
                                                               compute_dtype)
        assert ambient_dtype() is None
        with compute_dtype('bfloat16'):
            assert ambient_dtype() == jnp.bfloat16
            with compute_dtype('float32'):
                assert ambient_dtype() is None
        assert ambient_dtype() is None


class TestGroupedDenseLowering:
    def test_block_diag_dense_equivalence(self):
        """Grouped conv == dense conv over the block-diagonal kernel, in both
        forward and gradient (the TPU fast path for MSD backward)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from transtacos_retunegan_tpu.models.vocoder_layers import WNConv

        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 16).astype(np.float32))
        kw = dict(features=32, kernel=5, stride=2, padding=2, groups=4)
        m_ref = WNConv(**kw, dense_groups=False)
        m_dense = WNConv(**kw, dense_groups=True)
        p = m_ref.init(jax.random.PRNGKey(0), x)['params']

        y_ref = m_ref.apply({'params': p}, x)
        y_dense = m_dense.apply({'params': p}, x)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_dense),
                                   rtol=1e-5, atol=1e-5)

        def loss(m):
            return lambda p: jnp.sum(m.apply({'params': p}, x) ** 2)
        g_ref = jax.grad(loss(m_ref))(p)
        g_dense = jax.grad(loss(m_dense))(p)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dense)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestRealBranchOnly:
    def test_multi_stft_specs_matches_loss_variant(self, rng):
        """The R1 fast path's real-branch specs are identical to the
        specs_r half of multi_stft_specs_and_loss."""
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(2, SEG).astype(np.float32) * 0.1)
        _, specs_r, _ = L.multi_stft_specs_and_loss(y, y * 0.5, cfg)
        specs = L.multi_stft_specs(y, cfg)
        assert len(specs) == len(specs_r)
        for a, b in zip(specs, specs_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_disc_real_branch_scores_match_full(self, rng):
        """y_hat=None returns the same real scores/feature maps as the
        two-branch forward (the R1 double-backward depends on this)."""
        cfg = small_cfg()
        y = jnp.asarray(rng.randn(1, SEG, 1).astype(np.float32) * 0.1)
        yh = jnp.asarray(rng.randn(1, SEG, 1).astype(np.float32) * 0.1)
        for M in (MultiScaleDiscriminator, MultiPeriodDiscriminator):
            m = M(cfg)
            params = m.init(jax.random.PRNGKey(0), y, yh)['params']
            rs_full, gs, fr_full, _ = m.apply({'params': params}, y, yh)
            rs_only, gs0, fr_only, fg0 = m.apply({'params': params}, y)
            assert gs0 == [] and fg0 == []
            assert len(gs) == len(rs_full)
            for a, b in zip(rs_full, rs_only):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))
            for fa, fb in zip(fr_full, fr_only):
                for a, b in zip(fa, fb):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestR1Penalty:
    def test_r1_step_finite_and_positive(self, rng):
        """Opt-in R1 penalty (r1_gamma > 0): the D step runs the
        double-backward and reports a positive finite penalty; gamma=0
        keeps reference semantics (loss_r1 stays 0)."""
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder, r1_gamma=0.5))
        batch = {
            'mel': jnp.asarray(rng.randn(B, FRAMES, 80).astype(np.float32)),
            'tmpl': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
            'wav': jnp.asarray(rng.randn(B, SEG).astype(np.float32) * 0.1),
        }
        state = init_gan_state(cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=10)
        state2, m = gan_train_step(cfg, state, batch, jax.random.PRNGKey(1), 10)
        assert np.isfinite(float(m['loss_r1']))
        assert float(m['loss_r1']) > 0.0
        assert np.isfinite(float(m['loss_disc_all']))

        cfg0 = small_cfg()
        s0 = init_gan_state(cfg0, jax.random.PRNGKey(0), batch,
                            steps_per_epoch=10)
        _, m0 = gan_train_step(cfg0, s0, batch, jax.random.PRNGKey(1), 10)
        assert float(m0['loss_r1']) == 0.0
