"""A5 observability: histogram stats, prdsnet accuracy, decode dump.

Round-3 verdict missing item 1 + 2: the reference logs, at every checkpoint,
the decoded input phonemes / tone string / ground-truth-vs-predicted prosody
marks (``transtacos/train.py:102-121``) and TB histograms of mel/mag
outputs+targets and per-gradient norms (``tacotron.py:272-294``).  These
tests pin the rebuilt equivalents.
"""

import dataclasses

import jax
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.eval.metrics import prds_accuracy
from transtacos_retunegan_tpu.text import frontend
from transtacos_retunegan_tpu.text.symbols import get_vocab_size
from transtacos_retunegan_tpu.train.acoustic_step import (init_state,
                                                          summary_stats)
from transtacos_retunegan_tpu.train.train_acoustic import format_decode_dump

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
    import jax.numpy as jnp
    rng = rng or np.random.RandomState(0)
    vocab = get_vocab_size()
    return {
        'text': jnp.asarray(np.stack([
            rng.randint(4, vocab, (b, n)), rng.randint(0, 6, (b, n))], -1)),
        'text_lengths': jnp.asarray([n, n - 3]),
        'prds': jnp.asarray(rng.randint(0, 6, (b, n))),
        'spec_lengths': jnp.asarray([t, t - CFG.acoustic.outputs_per_step]),
        'mel_targets': jnp.asarray(rng.randn(b, t, 80).astype(np.float32)),
        'mag_targets': jnp.asarray(rng.randn(b, t, 1024).astype(np.float32)),
        'f0_targets': jnp.asarray(rng.randint(0, CFG.audio.n_f0_bins, (b, t))),
        'c0_targets': jnp.asarray(rng.randint(0, 32, (b, t))),
        'stop_token_targets': jnp.zeros((b, t), np.float32),
        'frame_loss_len': jnp.asarray(t),
        'text_loss_len': jnp.asarray(n),
    }


class TestPrdsAccuracy:
    def test_masked_accuracy(self):
        true = np.array([[1, 2, 3, 0], [4, 4, 0, 0]])
        pred = np.array([[1, 2, 9, 9], [4, 0, 9, 9]])
        # row 0: 3 valid, 2 correct; row 1: 2 valid, 1 correct -> 3/5
        assert prds_accuracy(true, pred, np.array([3, 2])) == pytest.approx(0.6)

    def test_perfect_and_empty(self):
        a = np.array([[1, 2]])
        assert prds_accuracy(a, a, np.array([2])) == 1.0
        assert prds_accuracy(a, a, np.array([0])) == 0.0


class TestSummaryStats:
    def test_payload_shapes_and_finiteness(self):
        batch = tiny_batch()
        state = init_state(CFG, jax.random.PRNGKey(0), batch)
        stats = summary_stats(CFG, state, batch, jax.random.PRNGKey(1))
        assert stats['mel_outputs'].shape == batch['mel_targets'].shape
        assert stats['mag_outputs'].shape == batch['mag_targets'].shape
        assert stats['prds_out'].shape == batch['prds'].shape
        norms = [float(g) for g in jax.tree.leaves(stats['grad_norms'])]
        # one norm per parameter leaf, all finite, at least one non-zero
        assert len(norms) == len(jax.tree.leaves(state.params))
        assert all(np.isfinite(n) for n in norms)
        assert max(norms) > 0


class TestDecodeDump:
    def test_lines_round_trip_text_and_prds(self):
        import jax.numpy as jnp
        pinyin = 'ni3 hao3'
        seq = frontend.serialize_inference(pinyin)
        n = seq.shape[0]
        batch = {
            'text': jnp.asarray(seq[None]),
            'text_lengths': jnp.asarray([n]),
            'prds': jnp.asarray([[0, 4] + [0] * (n - 2)]),
        }
        out = {'prds_out': np.asarray([[0, 4] + [1] * (n - 2)])}
        lines = format_decode_dump(CFG, batch, out)
        text_line = next(ln for ln in lines if ln.startswith('  text:'))
        # the phone string must decode back to the input syllables' phones
        assert 'n' in text_line and 'h' in text_line
        tone_line = next(ln for ln in lines if ln.startswith('  tone:'))
        assert '3' in tone_line
        prds_line = next(ln for ln in lines if ln.startswith('  prds:'))
        pred_line = next(ln for ln in lines if ln.startswith('  pred:'))
        assert prds_line.split(':')[1].strip()[:2] == '04'
        assert 'accuracy' in pred_line

    def test_no_prds_out_still_dumps_text(self):
        import jax.numpy as jnp
        seq = frontend.serialize_inference('ma1')
        batch = {'text': jnp.asarray(seq[None]),
                 'text_lengths': jnp.asarray([seq.shape[0]]),
                 'prds': jnp.asarray([[0] * seq.shape[0]])}
        lines = format_decode_dump(CFG, batch, {'prds_out': None})
        assert any(ln.startswith('  text:') for ln in lines)
        assert not any(ln.startswith('  pred:') for ln in lines)
