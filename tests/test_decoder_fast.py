"""DecoderCellFast == DecoderCell with transplanted params (exact math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.models import decoder as dec
from transtacos_retunegan_tpu.models import decoder_fast as fast


def _setup(mode, steps=7, b=2, n=11):
    cfg = Config()
    hp = cfg.acoustic
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(b, n, hp.encoder_depth).astype(np.float32))
    keys = enc @ jnp.asarray(
        rng.randn(hp.encoder_depth, hp.attention_depth).astype(np.float32) * .05)
    attn = dec.prepare_attention(enc, jnp.asarray([n, n - 3]), keys)
    xs = {'target_prev': jnp.asarray(
        rng.randn(steps, b, cfg.audio.n_mel).astype(np.float32))}
    carry = dec.init_carry(b, n, cfg)
    tfr = jnp.asarray(0.7)
    rngs = {'dropout': jax.random.PRNGKey(2), 'tf': jax.random.PRNGKey(3)}
    return cfg, attn, xs, carry, tfr, rngs


@pytest.mark.parametrize('mode', ['train', 'infer'])
def test_fast_cell_matches_stock(mode):
    cfg, attn, xs, carry, tfr, rngs = _setup(mode)
    stock = dec.make_scanned_cell(cfg, mode)
    variables = stock.init(dict(rngs, params=jax.random.PRNGKey(0)),
                           (carry, attn, tfr), xs)
    sp = variables['params']
    (_, _, _), ys_s = stock.apply({'params': sp}, (carry, attn, tfr), xs,
                                  rngs=rngs)

    fcell = fast.make_scanned_cell_fast(cfg, mode)
    fp = fast.fuse_cell_params(sp)
    (_, _, _), ys_f = fcell.apply({'params': fp}, (carry, attn, tfr), xs,
                                  rngs=rngs)

    for k in ('frames', 'stop', 'alignments'):
        np.testing.assert_allclose(np.asarray(ys_s[k]), np.asarray(ys_f[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=k)
    if mode == 'infer':
        np.testing.assert_array_equal(np.asarray(ys_s['finished']),
                                      np.asarray(ys_f['finished']))


def test_fused_layout_param_count_matches():
    """GRU/projection blocks re-arrange stock params exactly; the folded
    location conv REDUCES them (conv[31,1,32]@dense[32,128] -> [31,1,128])."""
    cfg, attn, xs, carry, tfr, rngs = _setup('train')
    sp = dec.make_scanned_cell(cfg, 'train').init(
        dict(rngs, params=jax.random.PRNGKey(0)), (carry, attn, tfr),
        xs)['params']
    fp = fast.fuse_cell_params(sp)

    def n_params(t):
        return sum(x.size for x in jax.tree.leaves(t))

    for blk in ('gru_0', 'gru_1', 'decoder_prenet', 'rnn_in_proj'):
        assert n_params(sp[blk]) == n_params(fp[blk]), blk
    assert n_params(fp['out_projection']) == (
        n_params(sp['frame_projection']) + n_params(sp['stop_projection']))
    assert n_params(fp['lsa']) < n_params(sp['lsa'])

    # a fresh fast init produces the same tree structure as the mapping
    fresh = fast.make_scanned_cell_fast(cfg, 'train').init(
        dict(rngs, params=jax.random.PRNGKey(0)), (carry, attn, tfr),
        xs)['params']
    assert jax.tree.structure(fresh) == jax.tree.structure(fp)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(fresh), jax.tree.leaves(fp)))


def test_convert_acoustic_run_round_trip(tmp_path):
    """convert_acoustic_cell turns a stock run dir into a fast_cell run dir
    whose restored model produces the same teacher-forced forward."""
    import dataclasses
    import sys

    from transtacos_retunegan_tpu.models.acoustic import Tacotron
    from transtacos_retunegan_tpu.tools import acoustic_step_ab as ab
    from transtacos_retunegan_tpu.tools import convert_acoustic_cell as conv
    from transtacos_retunegan_tpu.train import checkpoint as ckpt
    from transtacos_retunegan_tpu.train.acoustic_step import init_state

    cfg = dataclasses.replace(
        Config(), acoustic=dataclasses.replace(
            Config().acoustic, embed_depth=32, encoder_depth=32,
            decoder_depth=64, attention_depth=16, prenet_depths=(32,),
            posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
            prdsnet_depth=16, posenc_depth=8))
    batch = ab.make_batch(cfg, b=2, n_txt=12, t=20)
    state = init_state(cfg, jax.random.PRNGKey(4), batch)
    state = state._replace(step=jnp.asarray(17, jnp.int32))

    stock_run = str(tmp_path / 'stock')
    cfg.save(stock_run)
    ckpt.save_tree(f'{stock_run}/ckpt_{17:08d}', state)

    fast_run = str(tmp_path / 'fast')
    old_argv = sys.argv
    sys.argv = ['x', '--run_dir', stock_run, '--out_dir', fast_run]
    try:
        conv.main()
    finally:
        sys.argv = old_argv

    fcfg = Config.load(fast_run)
    assert fcfg.acoustic.fast_cell
    fstate = init_state(fcfg, jax.random.PRNGKey(5), batch)
    restored = ckpt.restore_acoustic(fast_run, fstate)
    assert restored is not None and int(restored.step) == 17

    def fwd(c, p):
        rngs = {'noise': jax.random.PRNGKey(1),
                'dropout': jax.random.PRNGKey(2), 'tf': jax.random.PRNGKey(3)}
        return Tacotron(c).apply(
            {'params': p}, batch['text'], batch['text_lengths'],
            batch['prds'], batch['spec_lengths'], batch['mel_targets'],
            batch['f0_targets'], batch['c0_targets'], jnp.asarray(1.0),
            train=True, rngs=rngs)

    out_s = fwd(cfg, state.params)
    out_f = fwd(fcfg, restored.params)
    for k in ('mel_outputs', 'mag_outputs', 'stop_token_outputs'):
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_f[k]),
                                   atol=3e-5, rtol=1e-4, err_msg=k)


class TestHoistedForceDecode:
    def _cfg(self):
        import dataclasses
        return dataclasses.replace(
            Config(), acoustic=dataclasses.replace(
                Config().acoustic, tf_method='force'))

    def _no_dropout(self, monkeypatch):
        import flax.linen as fnn
        monkeypatch.setattr(fnn.Dropout, '__call__',
                            lambda self, x, **kw: x)

    def _stock(self, cfg, sp, attn, mel_targets, steps, b):
        xs = {'target_prev': dec.teacher_inputs(mel_targets,
                                                cfg.acoustic.outputs_per_step)}
        cell = dec.make_scanned_cell(cfg, 'train')
        carry = dec.init_carry(b, attn.mask.shape[-1], cfg)
        rngs = {'dropout': jax.random.PRNGKey(2), 'tf': jax.random.PRNGKey(3)}
        (_, _, _), ys = cell.apply({'params': sp},
                                   (carry, attn, jnp.asarray(1.0)), xs,
                                   rngs=rngs)
        r = cfg.acoustic.outputs_per_step
        mel = ys['frames'].transpose(1, 0, 2).reshape(b, steps * r,
                                                      cfg.audio.n_mel)
        stop = ys['stop'].transpose(1, 0, 2).reshape(b, steps * r)
        return mel, stop, ys['alignments'].transpose(1, 2, 0)

    def test_outputs_match_scan(self, monkeypatch):
        self._no_dropout(monkeypatch)
        cfg = self._cfg()
        steps, b, n = 7, 2, 11
        rng = np.random.RandomState(1)
        enc = jnp.asarray(rng.randn(b, n, cfg.acoustic.encoder_depth)
                          .astype(np.float32))
        keys = enc @ jnp.asarray(
            rng.randn(cfg.acoustic.encoder_depth,
                      cfg.acoustic.attention_depth).astype(np.float32) * .05)
        attn = dec.prepare_attention(enc, jnp.asarray([n, n - 3]), keys)
        mel_targets = jnp.asarray(
            rng.randn(b, steps * cfg.acoustic.outputs_per_step,
                      cfg.audio.n_mel).astype(np.float32))
        carry = dec.init_carry(b, n, cfg)
        xs = {'target_prev': dec.teacher_inputs(
            mel_targets, cfg.acoustic.outputs_per_step)}
        sp = dec.make_scanned_cell(cfg, 'train').init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(2), 'tf': jax.random.PRNGKey(3)},
            (carry, attn, jnp.asarray(1.0)), xs)['params']
        # trained-like nonzero biases (the class of weight folds can drop)
        lsa = dict(sp['lsa'])
        lc = dict(lsa['location_convolution'])
        lc['bias'] = jnp.asarray(rng.randn(*lc['bias'].shape)
                                 .astype(np.float32) * 0.1)
        lsa['location_convolution'] = lc
        sp = dict(sp, lsa=lsa)

        mel_s, stop_s, align_s = self._stock(cfg, sp, attn, mel_targets,
                                             steps, b)
        mel_h, stop_h, align_h = fast.hoisted_force_decode(
            sp, cfg, mel_targets, attn.keys, attn.values, attn.mask)
        np.testing.assert_allclose(np.asarray(mel_h), np.asarray(mel_s),
                                   atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(stop_h), np.asarray(stop_s),
                                   atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(align_h), np.asarray(align_s),
                                   atol=3e-5, rtol=1e-4)

        # gradients through both paths agree.  Loss must be SMOOTH: an L1
        # would flip sign() on near-zero mel elements that differ by ~3e-5
        # between the two (equivalent) forwards, exploding the grad diff.
        def loss_stock(p):
            m_, s_, _ = self._stock(cfg, p, attn, mel_targets, steps, b)
            return jnp.mean(jnp.square(m_)) + jnp.mean(jnp.square(s_))

        def loss_hoist(p):
            m_, s_, _ = fast.hoisted_force_decode(
                p, cfg, mel_targets, attn.keys, attn.values, attn.mask)
            return jnp.mean(jnp.square(m_)) + jnp.mean(jnp.square(s_))

        g_s = jax.grad(loss_stock)(sp)
        g_h = jax.grad(loss_hoist)(sp)
        flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
        flat_h = {jax.tree_util.keystr(k): v for k, v
                  in jax.tree_util.tree_flatten_with_path(g_h)[0]}
        for k, v in flat_s:
            ks = jax.tree_util.keystr(k)
            scale = max(1.0, float(np.abs(np.asarray(v)).max()))
            np.testing.assert_allclose(
                np.asarray(flat_h[ks]) / scale, np.asarray(v) / scale,
                atol=5e-4, err_msg=ks)


def test_train_step_hoisted_matches_standard(monkeypatch):
    """One optimizer step via train_step_hoisted == train_step (dropout
    neutralized; pre-decay regime so both are the same function)."""
    import dataclasses

    import flax.linen as fnn
    monkeypatch.setattr(fnn.Dropout, '__call__', lambda self, x, **kw: x)
    # the hoisted path's prenet dropout is manual (not flax.Dropout):
    # neutralize it the same way so both steps are deterministic
    orig_decode = fast.hoisted_force_decode
    monkeypatch.setattr(
        fast, 'hoisted_force_decode',
        lambda *a, **kw: orig_decode(*a, **{**kw, 'dropout_rng': None}))
    from transtacos_retunegan_tpu.tools import acoustic_step_ab as ab
    from transtacos_retunegan_tpu.train.acoustic_step import (
        hoist_force_eligible, init_state, train_step, train_step_hoisted)

    cfg = dataclasses.replace(
        Config(), acoustic=dataclasses.replace(
            Config().acoustic, embed_depth=32, encoder_depth=32,
            decoder_depth=64, attention_depth=16, prenet_depths=(32,),
            posnet_depth=64, var_embed_depth=16, var_prednet_depth=16,
            prdsnet_depth=16, posenc_depth=8))
    assert hoist_force_eligible(cfg, 0)
    assert not hoist_force_eligible(cfg, cfg.acoustic.tf_start_decay)

    batch = ab.make_batch(cfg, b=2, n_txt=12, t=20)
    state = init_state(cfg, jax.random.PRNGKey(4), batch)
    copy = jax.tree.map(jnp.copy, state)
    rng = jax.random.PRNGKey(11)

    s1, l1 = train_step(cfg, state, batch, rng)
    s2, l2 = train_step_hoisted(cfg, copy, batch, rng)

    np.testing.assert_allclose(float(l1['loss']), float(l2['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l1['grad_norm']),
                               float(l2['grad_norm']), rtol=1e-3)
    flat1 = jax.tree_util.tree_flatten_with_path(s1.params)[0]
    flat2 = {jax.tree_util.keystr(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(s2.params)[0]}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat2[ks]), np.asarray(v),
                                   atol=5e-4, err_msg=ks)
