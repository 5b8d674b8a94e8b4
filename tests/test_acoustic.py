"""Acoustic model tests: shapes, train step, loss decrease, AR inference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.models.acoustic import Tacotron, compute_losses
from transtacos_retunegan_tpu.train import schedules
from transtacos_retunegan_tpu.train.acoustic_step import (infer_step, init_state,
                                                          train_step)
from transtacos_retunegan_tpu.text.symbols import get_vocab_size

# tiny config for fast tests
CFG = Config()
CFG = dataclasses.replace(
    CFG,
    acoustic=dataclasses.replace(
        CFG.acoustic, embed_depth=32, encoder_depth=32, decoder_depth=64,
        attention_depth=16, prenet_depths=(32,), posnet_depth=64,
        var_embed_depth=16, var_prednet_depth=16, prdsnet_depth=16,
        posenc_depth=8, max_iters=8),
)


def tiny_batch(b=2, n=12, t=20, rng=None):
    rng = rng or np.random.RandomState(0)
    r = CFG.acoustic.outputs_per_step
    assert t % r == 0
    vocab = get_vocab_size()
    return {
        'text': jnp.asarray(np.stack([
            rng.randint(4, vocab, (b, n)), rng.randint(0, 6, (b, n))], -1)),
        'text_lengths': jnp.asarray([n, n - 3]),
        'prds': jnp.asarray(rng.randint(0, 6, (b, n))),
        'spec_lengths': jnp.asarray([t, t - r]),
        'mel_targets': jnp.asarray(rng.randn(b, t, 80).astype(np.float32)),
        'mag_targets': jnp.asarray(rng.randn(b, t, 1024).astype(np.float32)),
        'f0_targets': jnp.asarray(rng.randint(0, CFG.audio.n_f0_bins, (b, t))),
        'c0_targets': jnp.asarray(rng.randint(0, 32, (b, t))),
        'stop_token_targets': jnp.asarray(
            (np.arange(t)[None, :] >= t - r).astype(np.float32).repeat(b, 0)),
        'frame_loss_len': jnp.asarray(t),
        'text_loss_len': jnp.asarray(n),
    }


@pytest.fixture(scope='module')
def state_and_batch():
    batch = tiny_batch()
    state = init_state(CFG, jax.random.PRNGKey(0), batch)
    return state, batch


class TestForward:
    def test_train_forward_shapes(self, state_and_batch):
        state, batch = state_and_batch
        model = Tacotron(CFG)
        out = model.apply({'params': state.params}, batch['text'],
                          batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'], 1.0,
                          train=True,
                          rngs={'noise': jax.random.PRNGKey(1),
                                'dropout': jax.random.PRNGKey(2),
                                'tf': jax.random.PRNGKey(3)})
        b, t, n = 2, 20, 12
        assert out['mel_outputs'].shape == (b, t, 80)
        assert out['mag_outputs'].shape == (b, t, 1024)
        assert out['stop_token_outputs'].shape == (b, t)
        assert out['alignments'].shape == (b, n, t // 5)
        assert out['prds_prob'].shape == (b, n, 6)
        # alignments are a distribution over valid text positions
        asum = np.asarray(out['alignments']).sum(axis=1)
        np.testing.assert_allclose(asum, 1.0, atol=1e-5)
        # second batch item has text_length n-3: no mass on padded tail
        assert float(np.abs(np.asarray(out['alignments'])[1, -3:, :]).max()) < 1e-6

    def test_loss_finite_and_composed(self, state_and_batch):
        state, batch = state_and_batch
        model = Tacotron(CFG)
        out = model.apply({'params': state.params}, batch['text'],
                          batch['text_lengths'], batch['prds'],
                          batch['spec_lengths'], batch['mel_targets'],
                          batch['f0_targets'], batch['c0_targets'], 1.0,
                          train=True,
                          rngs={'noise': jax.random.PRNGKey(1),
                                'dropout': jax.random.PRNGKey(2),
                                'tf': jax.random.PRNGKey(3)})
        losses = compute_losses(out, batch, CFG, state.params)
        for k, v in losses.items():
            assert np.isfinite(float(v)), f'{k} not finite'
        parts = (losses['prds_loss'] + losses['mel_loss'] + losses['mag_loss']
                 + losses['f0_loss'] + losses['c0_loss'] + losses['sim_loss']
                 + losses['stop_token_loss'] + losses['reg_loss'])
        assert float(losses['loss']) == pytest.approx(float(parts), rel=1e-6)


class TestTrainStep:
    def test_loss_decreases_on_overfit(self):
        batch = tiny_batch()
        state = init_state(CFG, jax.random.PRNGKey(0), batch)
        first = last = None
        for i in range(30):
            state, losses = train_step(CFG, state, batch, jax.random.PRNGKey(i))
            if first is None:
                first = float(losses['loss'])
            last = float(losses['loss'])
        assert last < first, f'loss did not decrease: {first} -> {last}'
        assert int(state.step) == 30

    def test_grad_clip_and_schedules(self):
        hp = CFG.acoustic
        lr0 = float(schedules.noam_lr(jnp.asarray(0), hp))
        lr_w = float(schedules.noam_lr(jnp.asarray(hp.warmup_steps - 1), hp))
        lr_2w = float(schedules.noam_lr(jnp.asarray(2 * hp.warmup_steps), hp))
        assert lr0 < lr_w
        assert lr_2w < lr_w
        assert lr_w == pytest.approx(hp.initial_learning_rate, rel=1e-3)
        tfr0 = float(schedules.teacher_forcing_ratio(jnp.asarray(0), hp))
        tfr_mid = float(schedules.teacher_forcing_ratio(
            jnp.asarray(hp.tf_start_decay + hp.tf_decay // 2), hp))
        tfr_end = float(schedules.teacher_forcing_ratio(
            jnp.asarray(hp.tf_start_decay + hp.tf_decay + 100), hp))
        assert tfr0 == 1.0
        assert 0.4 < tfr_mid < 0.6
        assert tfr_end == pytest.approx(0.0, abs=1e-6)


class TestInference:
    def test_infer_shapes_and_stop(self, state_and_batch):
        state, batch = state_and_batch
        out = infer_step(CFG, state.params, batch, 8)
        b = 2
        assert out['mel_outputs'].shape == (b, 8 * 5, 80)
        assert out['mag_outputs'].shape == (b, 8 * 5, 1024)
        assert out['prds_out'].shape == batch['prds'].shape
        lens = np.asarray(out['out_lengths'])
        assert (lens >= 5).all() and (lens <= 40).all()
        assert (lens % 5 == 0).all()

    def test_infer_deterministic(self, state_and_batch):
        state, batch = state_and_batch
        o1 = infer_step(CFG, state.params, batch, 8)
        o2 = infer_step(CFG, state.params, batch, 8)
        np.testing.assert_array_equal(np.asarray(o1['mag_outputs']),
                                      np.asarray(o2['mag_outputs']))
