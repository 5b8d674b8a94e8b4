"""Parameter counts for every generator variant + the acoustic model.

Parity evidence against the reference's measured table
(``retunegan/hparam.py:45-56``): MelGAN 4,524,290 / MelGANRetune 1,409,427 /
HiFiGAN 1,421,314 / HiFiGANRetune 1,716,627 / HiFiGANSplit 2,849,890 /
RefineGAN_small 2,748,371.  Uses ``jax.eval_shape`` so no arrays are
materialized.

Usage: python -m transtacos_retunegan_tpu.tools.param_counts
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.generators import GENERATORS


def count(tree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def generator_counts(cfg: Config) -> dict:
    seg = cfg.audio.segment_size
    fr = seg // cfg.audio.hop_length
    mel = jax.ShapeDtypeStruct((1, fr, cfg.audio.n_mel), jnp.float32)
    tmpl = jax.ShapeDtypeStruct((1, seg, 1), jnp.float32)
    uv = jax.ShapeDtypeStruct((1, seg, 1), jnp.float32)
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}

    out = {}
    for name, klass in sorted(GENERATORS.items()):
        c = dataclasses.replace(cfg, vocoder=dataclasses.replace(
            cfg.vocoder, generator_ver=name))
        gen = klass(c)
        if name.endswith('Split'):
            shapes = jax.eval_shape(lambda m, t, u: gen.init(rngs, m, m, t, t, u,
                                                             train=True),
                                    mel, tmpl, uv)
        else:
            shapes = jax.eval_shape(lambda m, t: gen.init(rngs, m, t, train=True),
                                    mel, tmpl)
        out[name] = count(shapes['params'])
    return out


def acoustic_count(cfg: Config) -> int:
    from ..models.acoustic import Tacotron
    r = cfg.acoustic.outputs_per_step
    model = Tacotron(cfg)
    args = dict(
        text=jax.ShapeDtypeStruct((1, 16, 2), jnp.int32),
        text_lengths=jax.ShapeDtypeStruct((1,), jnp.int32),
        prds=jax.ShapeDtypeStruct((1, 16), jnp.int32),
        spec_lengths=jax.ShapeDtypeStruct((1,), jnp.int32),
        mel=jax.ShapeDtypeStruct((1, 4 * r, cfg.audio.n_mel), jnp.float32),
        f0=jax.ShapeDtypeStruct((1, 4 * r), jnp.int32),
        c0=jax.ShapeDtypeStruct((1, 4 * r), jnp.int32),
    )
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2), 'tf': jax.random.PRNGKey(3)}
    shapes = jax.eval_shape(
        lambda a: model.init(rngs, a['text'], a['text_lengths'], a['prds'],
                             a['spec_lengths'], a['mel'], a['f0'], a['c0'],
                             1.0, train=True), args)
    return count(shapes['params'])


REFERENCE = {
    'MelGAN': 4_524_290, 'MelGANRetune': 1_409_427, 'HiFiGAN': 1_421_314,
    'HiFiGANRetune': 1_716_627, 'HiFiGANSplit': 2_849_890,
    'RefineGAN_small': 2_748_371,
}


def main():
    cfg = Config()
    print(f'acoustic (TransTacoS): {acoustic_count(cfg):,}')
    for name, n in generator_counts(cfg).items():
        ref = REFERENCE.get(name)
        extra = f'  (reference: {ref:,}, {100 * n / ref - 100:+.2f}%)' if ref else ''
        print(f'{name:18s}: {n:,}{extra}')


if __name__ == '__main__':
    main()
