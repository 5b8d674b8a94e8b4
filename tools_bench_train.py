"""One-off: time the full GAN train step on the real TPU (vs reference 2.36 s/b)."""
import json
import os
import time

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transtacos_retunegan_tpu.config import Config  # noqa: E402
from transtacos_retunegan_tpu.train.vocoder_step import (gan_train_step,  # noqa: E402
                                                         init_gan_state)

cfg = Config()
rng = np.random.RandomState(0)
b, seg = cfg.vocoder.batch_size, cfg.audio.segment_size
batch = {
    'mel': jnp.asarray(rng.randn(b, seg // 256, 80).astype(np.float32)),
    'tmpl': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
    'wav': jnp.asarray((rng.randn(b, seg) * 0.1).astype(np.float32)),
}
t0 = time.time()
state = init_gan_state(cfg, jax.random.PRNGKey(0), batch, 568)
print('init took %.1fs' % (time.time() - t0), flush=True)

t0 = time.time()
state, m = gan_train_step(cfg, state, batch, jax.random.PRNGKey(1), 568)
jax.block_until_ready(m['loss_gen_all'])
print('first step (compile) %.1fs' % (time.time() - t0), flush=True)

n = 5
t0 = time.time()
for i in range(n):
    state, m = gan_train_step(cfg, state, batch, jax.random.PRNGKey(i), 568)
jax.block_until_ready(m['loss_gen_all'])
sec = (time.time() - t0) / n
print(json.dumps({'gan_step_s': round(sec, 3), 'batch': b,
                  'vs_reference_2.36': round(2.36 / sec, 2)}))

# ---- acoustic train step --------------------------------------------------
from transtacos_retunegan_tpu.text.symbols import get_vocab_size  # noqa: E402
from transtacos_retunegan_tpu.train.acoustic_step import (init_state,  # noqa: E402
                                                          train_step)

n, t = 32, 400   # ~reference avg utterance (307 frames) rounded to bucket
ab = {
    'text': jnp.asarray(np.stack([rng.randint(4, get_vocab_size(), (b, n)),
                                  rng.randint(0, 6, (b, n))], -1).astype(np.int32)),
    'text_lengths': jnp.full((b,), n, jnp.int32),
    'prds': jnp.asarray(rng.randint(0, 6, (b, n)).astype(np.int32)),
    'spec_lengths': jnp.full((b,), t, jnp.int32),
    'mel_targets': jnp.asarray(rng.randn(b, t, 80).astype(np.float32)),
    'mag_targets': jnp.asarray(rng.randn(b, t, 1024).astype(np.float32)),
    'f0_targets': jnp.asarray(rng.randint(0, cfg.audio.n_f0_bins, (b, t)).astype(np.int32)),
    'c0_targets': jnp.asarray(rng.randint(0, 32, (b, t)).astype(np.int32)),
    'stop_token_targets': jnp.zeros((b, t), jnp.float32),
    'frame_loss_len': jnp.asarray(t, jnp.int32),
    'text_loss_len': jnp.asarray(n, jnp.int32),
}
t0 = time.time()
astate = init_state(cfg, jax.random.PRNGKey(5), ab)
print('acoustic init %.1fs' % (time.time() - t0), flush=True)
t0 = time.time()
astate, al = train_step(cfg, astate, ab, jax.random.PRNGKey(6))
jax.block_until_ready(al['loss'])
print('acoustic first step (compile) %.1fs' % (time.time() - t0), flush=True)
nrep = 5
t0 = time.time()
for i in range(nrep):
    astate, al = train_step(cfg, astate, ab, jax.random.PRNGKey(i))
float(al['loss'])
print(json.dumps({'acoustic_step_s': round((time.time() - t0) / nrep, 3),
                  'batch': b, 'frames': t}))
