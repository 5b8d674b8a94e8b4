"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from transtacos_retunegan_tpu.ops import lsa_kernel as K


def _inputs(b=4, n=128, a=128, d=256, seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(b, a).astype(np.float32))
    cum = jnp.asarray(np.abs(r.randn(b, n)).astype(np.float32))
    keys = jnp.asarray(r.randn(b, n, a).astype(np.float32) * 0.1)
    values = jnp.asarray(r.randn(b, n, d).astype(np.float32))
    lens = r.randint(n // 2, n + 1, size=b)
    mask = jnp.asarray((np.arange(n)[None, :] < lens[:, None]).astype(np.float32))
    loc_mat = jnp.asarray(r.randn(31, a).astype(np.float32) * 0.05)
    v = jnp.asarray(r.randn(a).astype(np.float32) * 0.1)
    bias = jnp.asarray(r.randn(a).astype(np.float32) * 0.01)
    return q, cum, keys, values, mask, loc_mat, v, bias


class TestFoldLocationParams:
    def test_fold_matches_sequential(self):
        r = np.random.RandomState(1)
        conv_k = jnp.asarray(r.randn(31, 1, 32).astype(np.float32))
        w_loc = jnp.asarray(r.randn(32, 128).astype(np.float32))
        folded = K.fold_location_params(conv_k, w_loc)
        cum = jnp.asarray(r.randn(2, 64).astype(np.float32))
        # sequential: conv then dense
        f = jax.lax.conv_general_dilated(cum[..., None], conv_k, (1,), 'SAME',
                                         dimension_numbers=('NHC', 'HIO', 'NHC'))
        loc_seq = f @ w_loc
        # folded: single conv with [31, 1, A] kernel
        loc_fold = jax.lax.conv_general_dilated(
            cum[..., None], folded[:, None, :], (1,), 'SAME',
            dimension_numbers=('NHC', 'HIO', 'NHC'))
        np.testing.assert_allclose(np.asarray(loc_seq), np.asarray(loc_fold),
                                   atol=1e-4)


class TestShiftMatrix:
    def test_windows_match_padding(self):
        n = 16
        m = K._shift_matrix(n, 5)
        cum = np.arange(1, n + 1, dtype=np.float32)
        win = (m @ cum).reshape(n, 5)
        padded = np.pad(cum, 2)
        for i in range(n):
            np.testing.assert_array_equal(win[i], padded[i:i + 5])


class TestFusedLSA:
    def test_matches_reference(self):
        args = _inputs()
        a_ref, c_ref, x_ref = K.lsa_step_reference(*args)
        a_fus, c_fus, x_fus = K.lsa_step_fused(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(a_fus), np.asarray(a_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_fus), np.asarray(c_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_fus), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_alignments_are_distribution(self):
        args = _inputs(seed=2)
        align, _, _ = K.lsa_step_fused(*args, interpret=True)
        mask = np.asarray(args[4])
        s = np.asarray(align).sum(axis=-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)
        assert (np.asarray(align)[mask == 0] < 1e-20).all()

    def test_matches_model_lsa_module(self):
        """The fused kernel reproduces the flax LSAStep used in training."""
        import flax.linen as nn
        from transtacos_retunegan_tpu.models.decoder import (AttentionParams,
                                                             LSAStep)
        r = np.random.RandomState(3)
        b, n, a, d, h = 2, 128, 16, 32, 64
        lsa = LSAStep(attention_dim=a)
        query = jnp.asarray(r.randn(b, h).astype(np.float32))
        cum = jnp.asarray(np.abs(r.randn(b, n)).astype(np.float32))
        keys = jnp.asarray(r.randn(b, n, a).astype(np.float32) * 0.1)
        values = jnp.asarray(r.randn(b, n, d).astype(np.float32))
        mask = jnp.ones((b, n), jnp.float32)
        attn = AttentionParams(keys, values, mask)
        variables = lsa.init(jax.random.PRNGKey(0), query, cum, attn)
        align_m, cum_m = lsa.apply(variables, query, cum, attn)

        p = variables['params']
        q = query @ p['query_layer']['kernel']
        loc_mat = K.fold_location_params(p['location_convolution']['kernel'],
                                         p['location_layer']['kernel'])
        align_f, cum_f, ctx_f = K.lsa_step_fused(
            q, cum, keys, values, mask, loc_mat,
            p['attention_variable'][:, 0], p['attention_bias'], interpret=True)
        np.testing.assert_allclose(np.asarray(align_f), np.asarray(align_m),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(cum_f), np.asarray(cum_m),
                                   atol=2e-5)
        ctx_m = jnp.einsum('bn,bnd->bd', align_m, values)
        np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_m),
                                   rtol=1e-4, atol=1e-5)
