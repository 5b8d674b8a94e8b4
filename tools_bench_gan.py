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
