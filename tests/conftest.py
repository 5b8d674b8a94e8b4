import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware (standard JAX substitute for a real slice).
#
# NOTE: this image boots an 'axon' TPU PJRT plugin from sitecustomize and
# pins JAX_PLATFORMS=axon in the environment, so the env vars alone are not
# enough -- jax.config.update after import is what actually flips the
# backend to CPU here.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(114514)


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler has segfaulted late in long single-process runs
    (hundreds of accumulated executables); dropping compiled-program caches
    between test modules keeps the process healthy."""
    yield
    jax.clear_caches()
