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
