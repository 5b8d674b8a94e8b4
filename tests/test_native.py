"""Native C++ DSP library parity tests (skipped when not built)."""

import numpy as np
import pytest

from transtacos_retunegan_tpu.audio import features as F
from transtacos_retunegan_tpu.audio import transforms as T
from transtacos_retunegan_tpu.config import AudioConfig
from transtacos_retunegan_tpu.data import native

CFG = AudioConfig()

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='libttsdsp.so not built (make -C native)')


def _sig(n=22016):
    t = np.arange(n) / CFG.sample_rate
    return (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)


class TestNativeParity:
    def test_stft_mag(self):
        y = _sig()
        m_n = native.stft_mag(y, 2048, 256, 1024)
        m_p = np.abs(F.stft_np(y, 2048, 256, 1024, 'hann'))
        assert m_n.shape == m_p.shape
        np.testing.assert_allclose(m_n, m_p, atol=1e-4)

    def test_rms(self):
        y = _sig(8192)
        np.testing.assert_allclose(native.rms(y, 1024, 256),
                                   F.rms_energy(y, 1024, 256), atol=1e-6)

    def test_griffin_lim_converges(self):
        y = _sig(256 * 48)
        mag = np.abs(F.stft_np(y, 2048, 256, 1024, 'hann')).astype(np.float32)

        def spec_err(w):
            m2 = np.abs(F.stft_np(w, 2048, 256, 1024, 'hann'))
            return np.mean(np.abs(m2 - mag)) / np.mean(mag)

        w4 = native.griffin_lim(mag, 4, CFG, momentum=0.7, length=len(y))
        w0 = native.griffin_lim(mag, 0, CFG, momentum=0.7, length=len(y))
        assert len(w4) == len(y)
        assert spec_err(w4) < spec_err(w0)

    def test_inv_log_mag_matches_numpy_semantics(self):
        y = _sig(256 * 32)[:-1]
        log_mag = T.get_mag(y, CFG)
        w = native.inv_log_mag(log_mag, CFG, length=len(y))
        assert len(w) == len(y)
        assert np.isfinite(w).all()
        # reconstruction carries the dominant 220 Hz tone
        z = F.get_zcr(w, CFG)
        assert abs(np.median(z) - 2 * 220 / CFG.sample_rate) < 0.02
