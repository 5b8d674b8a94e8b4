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
