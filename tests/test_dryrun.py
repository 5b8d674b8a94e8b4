"""End-to-end driver dry-run: both sharded train steps on the virtual mesh.

The round-1 failure mode was ``dryrun_multichip`` assuming the *caller*
supplies an n-device backend; it is now self-contained (re-execs under a
forced virtual CPU platform when the booted backend is too small) and the
tiny config shrinks the discriminators so the GAN step compiles in seconds.
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_subprocess_env(monkeypatch):
    """The subprocess re-exec must force a CPU platform with n virtual
    devices and disarm the axon plugin, regardless of the calling env."""
    import __graft_entry__ as ge

    captured = {}

    def fake_run(cmd, env=None, cwd=None, check=None, timeout=None):
        captured.update(cmd=cmd, env=env, cwd=cwd, check=check)

    monkeypatch.setattr('subprocess.run', fake_run)
    monkeypatch.setenv('PALLAS_AXON_POOL_IPS', '127.0.0.1')
    monkeypatch.setenv('JAX_PLATFORMS', 'axon')
    monkeypatch.setenv('XLA_FLAGS',
                       '--xla_force_host_platform_device_count=3 --xla_foo')
    ge._dryrun_subprocess(16)

    env = captured['env']
    assert env['JAX_PLATFORMS'] == 'cpu'
    assert 'PALLAS_AXON_POOL_IPS' not in env
    assert '--xla_force_host_platform_device_count=16' in env['XLA_FLAGS']
    assert '--xla_force_host_platform_device_count=3' not in env['XLA_FLAGS']
    assert '--xla_foo' in env['XLA_FLAGS']
    assert captured['check'] is True
    assert '_dryrun_body(16)' in captured['cmd'][-1]
    assert captured['cwd'] in env['PYTHONPATH']


@pytest.mark.slow
def test_dryrun_multichip_end_to_end():
    """The full driver dry run (acoustic + GAN sharded steps on the 4x2
    mesh) must finish well inside a CI budget."""
    from __graft_entry__ import dryrun_multichip

    start = time.time()
    dryrun_multichip(8)          # conftest provides 8 CPU devices in-process
    elapsed = time.time() - start
    # the driver's own budget is 1500s; the DEFAULT-size AOT compile checks
    # (r3) put the solo run at ~8 min, slower under suite-level CPU contention
    assert elapsed < 1200, f'dryrun took {elapsed:.0f}s (budget 1200s)'
