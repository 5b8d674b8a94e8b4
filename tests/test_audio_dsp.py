"""Numerical-parity tests for the JAX DSP layer.

torch (CPU) serves as the independent oracle for STFT conventions (the
reference used torch.stft / librosa.stft with identical center/reflect
semantics); scipy as the oracle for filtering.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from transtacos_retunegan_tpu.config import AudioConfig
from transtacos_retunegan_tpu.audio import dsp, features, mel as melmod

CFG = AudioConfig()


def _sig(n=22050, seed=0):
    r = np.random.RandomState(seed)
    t = np.arange(n) / CFG.sample_rate
    y = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 931 * t)
         + 0.05 * r.randn(n))
    return y.astype(np.float32)


class TestSTFT:
    def test_matches_torch_stft(self):
        y = _sig(22016)
        re, im = dsp.stft_ri(jnp.asarray(y), CFG.n_fft, CFG.hop_length,
                             CFG.win_length, 'hann')
        ref = torch.stft(torch.from_numpy(y), CFG.n_fft, CFG.hop_length,
                         CFG.win_length, torch.hann_window(CFG.win_length),
                         center=True, pad_mode='reflect', return_complex=True).numpy()
        assert re.shape == ref.shape
        # f32 accumulation over 2048-tap dots: ~5e-4 relative to frame norm
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(re) / scale, ref.real / scale, atol=1e-3)
        np.testing.assert_allclose(np.asarray(im) / scale, ref.imag / scale, atol=1e-3)
        # magnitudes agree tightly where energy lives
        mag, magr = np.hypot(re, im), np.abs(ref)
        big = magr > 1.0
        np.testing.assert_allclose(np.asarray(mag)[big], magr[big], rtol=5e-3)

    def test_frame_count(self):
        y = _sig(256 * 100)
        s = dsp.stft_mag(jnp.asarray(y), CFG.n_fft, CFG.hop_length, CFG.win_length)
        assert s.shape == (CFG.n_freq, 101)

    def test_batched(self):
        y = np.stack([_sig(8192, 0), _sig(8192, 1)])
        s = dsp.stft_mag(jnp.asarray(y), 1024, 256, 1024)
        assert s.shape == (2, 513, 33)

    def test_istft_roundtrip(self):
        y = _sig(256 * 64)
        re, im = dsp.stft_ri(jnp.asarray(y), CFG.n_fft, CFG.hop_length, CFG.win_length)
        y2 = np.asarray(dsp.istft_ri(re, im, CFG.hop_length, CFG.win_length, 'hann',
                                     length=len(y)))
        # perfect reconstruction away from the edges (COLA)
        np.testing.assert_allclose(y2[1024:-1024], y[1024:-1024], atol=1e-4)

    def test_istft_matches_torch(self):
        y = _sig(256 * 40)
        s = torch.stft(torch.from_numpy(y), 1024, 256, 1024,
                       torch.hann_window(1024), center=True,
                       pad_mode='reflect', return_complex=True)
        ref = torch.istft(s, 1024, 256, 1024, torch.hann_window(1024),
                          center=True, length=len(y)).numpy()
        ours = np.asarray(dsp.istft_ri(jnp.asarray(s.numpy().real),
                                       jnp.asarray(s.numpy().imag),
                                       256, 1024, 'hann', length=len(y)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestMel:
    def test_filterbank_shape_and_coverage(self):
        m = melmod.mel_basis(CFG.sample_rate, CFG.n_fft, CFG.n_mel, CFG.fmin, CFG.fmax)
        assert m.shape == (80, 1025)
        assert (m >= 0).all()
        # every filter is non-empty and unimodal-ish
        assert (m.sum(axis=1) > 0).all()
        # filters live strictly inside [fmin, fmax]
        freqs = melmod.fft_frequencies(CFG.sample_rate, CFG.n_fft)
        active = m.sum(axis=0) > 0
        assert freqs[active].min() >= CFG.fmin - 25
        assert freqs[active].max() <= CFG.fmax + 25

    def test_slaney_scale_break(self):
        # Slaney scale is linear below 1 kHz
        assert abs(melmod.hz_to_mel(500.0) - 7.5) < 1e-6
        assert abs(melmod.mel_to_hz(melmod.hz_to_mel(3000.0)) - 3000.0) < 1e-6

    def test_pseudo_inverse(self):
        m = melmod.mel_basis(CFG.sample_rate, CFG.n_fft, CFG.n_mel, CFG.fmin, CFG.fmax)
        inv = melmod.mel_pseudo_inverse(CFG.sample_rate, CFG.n_fft, CFG.n_mel,
                                        CFG.fmin, CFG.fmax)
        assert inv.shape == (1025, 80)
        # mel -> linear -> mel approximately identity on smooth spectra
        spec = np.exp(-((np.arange(1025) - 300) / 120.0) ** 2).astype(np.float32)
        melv = m @ spec
        rec = m @ (inv @ melv)
        np.testing.assert_allclose(rec, melv, rtol=0.35, atol=1e-3)


class TestCompanding:
    def test_normalize_roundtrip(self):
        s = jnp.linspace(-100.0, 0.0, 64)
        n = dsp.normalize_db(s, CFG)
        assert float(n.min()) == pytest.approx(-4.0)
        assert float(n.max()) == pytest.approx(4.0)
        np.testing.assert_allclose(np.asarray(dsp.denormalize_db(n, CFG)),
                                   np.asarray(s), atol=1e-4)

    def test_amp_db_roundtrip(self):
        x = jnp.asarray([1e-4, 0.01, 0.5, 1.0, 10.0])
        np.testing.assert_allclose(np.asarray(dsp.db_to_amp(dsp.amp_to_db(x))),
                                   np.asarray(x), rtol=1e-4)

    def test_preemphasis_matches_scipy(self):
        from scipy import signal as sps
        y = _sig(4096)
        ours = np.asarray(dsp.preemphasis(jnp.asarray(y), 0.97))
        ref = sps.lfilter([1, -0.97], [1], y)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_inv_preemphasis_matches_scipy(self):
        from scipy import signal as sps
        y = _sig(4096)
        ours = np.asarray(dsp.inv_preemphasis(jnp.asarray(y), 0.97))
        ref = sps.lfilter([1], [1, -0.97], y)
        np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-3)

    def test_preemphasis_roundtrip(self):
        y = _sig(4096)
        y2 = dsp.inv_preemphasis(dsp.preemphasis(jnp.asarray(y)))
        np.testing.assert_allclose(np.asarray(y2), y, atol=1e-3)


class TestGriffinLim:
    def test_reduces_spectral_error(self):
        y = _sig(256 * 48)
        mag = dsp.stft_mag(jnp.asarray(y), CFG.n_fft, CFG.hop_length, CFG.win_length)

        def spec_err(n_iter):
            rec = dsp.griffin_lim(mag, n_iter, CFG.hop_length, CFG.win_length,
                                  key=jax.random.PRNGKey(0))
            mag2 = dsp.stft_mag(rec, CFG.n_fft, CFG.hop_length, CFG.win_length)
            return float(jnp.mean(jnp.abs(mag - mag2)))

        e0, e8 = spec_err(0), spec_err(8)
        assert e8 < e0 * 0.7

    def test_momentum_flavor_and_length(self):
        y = _sig(8192)
        logmag = dsp.get_mag(jnp.asarray(y[:-1]), CFG)
        rec = dsp.inv_log_mag(logmag, CFG, length=8191)
        assert rec.shape == (8191,)
        assert np.isfinite(np.asarray(rec)).all()

    def test_jittable(self):
        y = _sig(256 * 16)
        mag = dsp.stft_mag(jnp.asarray(y), 1024, 256, 1024)
        f = jax.jit(lambda m: dsp.griffin_lim(m, 4, 256, 1024, momentum=0.7))
        out = f(mag)
        assert np.isfinite(np.asarray(out)).all()


class TestCompositeTransforms:
    def test_get_specs_shapes_and_range(self):
        y = _sig(256 * 64)[:-1]
        mag, melspec = dsp.get_specs(jnp.asarray(y), CFG)
        assert mag.shape == (1025, 64)
        assert melspec.shape == (80, 64)
        # normalize maps [-100db, 0db] -> [-4, 4]; the ref_level_db shift can
        # push values outside [-4, 4] on both ends (the reference pipeline
        # does not clip either) -- sanity-bound the range
        assert float(mag.min()) >= -4.0 - 8 * CFG.ref_level_db / 100 - 1e-3
        assert float(mag.max()) <= 8.0
        assert float(mag.max()) > float(mag.min())

    def test_inv_spec_runs(self):
        y = _sig(256 * 32)[:-1]
        mag, _ = dsp.get_specs(jnp.asarray(y), CFG)
        rec = dsp.inv_spec(mag, CFG, key=jax.random.PRNGKey(1))
        assert rec.ndim == 1 and np.isfinite(np.asarray(rec)).all()

    def test_fix_zero_dc(self):
        s = jnp.ones((1024, 10))
        fixed = dsp.fix_zero_dc(s, CFG)
        assert fixed.shape == (1025, 10)
        np.testing.assert_allclose(np.asarray(fixed[0]), 0.01, atol=1e-6)

    def test_stft_mag_mel_phase(self):
        y = jnp.asarray(np.stack([_sig(8192), _sig(8192, 1)]))
        s, m, p = dsp.stft_mag_mel_phase(y, CFG, 1024, 512, 120)
        assert s.shape[0] == 2 and s.shape[1] == 513
        assert m.shape[1] == 80
        assert float(jnp.max(jnp.abs(p))) <= np.pi + 1e-5


class TestHostFeatures:
    def test_yin_pure_tone(self):
        for f0 in (110.0, 220.0, 330.0):
            t = np.arange(22050) / CFG.sample_rate
            y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
            f = features.get_f0(y, CFG)
            mid = f[10:-10]
            assert np.median(np.abs(mid - f0)) < f0 * 0.03, f'failed at {f0}Hz'

    def test_f0_frame_count_matches_spec(self):
        n_spec = 50
        y = _sig(256 * n_spec)[:-1]
        f = features.get_f0(y, CFG)
        c = features.get_c0(y, CFG)
        assert len(f) == n_spec and len(c) == n_spec

    def test_rms_matches_definition(self):
        y = np.ones(2048, dtype=np.float32) * 0.5
        c = features.rms_energy(y, 1024, 256)
        assert abs(c[len(c) // 2] - 0.5) < 1e-6

    def test_zcr_tone(self):
        t = np.arange(22050) / CFG.sample_rate
        y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        z = features.get_zcr(y, CFG)
        # 1000 Hz tone: ~2000 crossings/sec -> rate ~ 2000/22050
        assert abs(np.median(z) - 2000 / 22050) < 0.01

    def test_quantizers(self):
        f0 = np.asarray([CFG.f0min, 200.0, CFG.f0max], np.float32)
        q = features.quantize_f0(f0, CFG)
        assert q[0] >= 0 and q[-1] <= CFG.n_f0_bins - 1 and (np.diff(q) > 0).all()
        c0 = np.asarray([CFG.c0min, 0.1, CFG.c0max], np.float32)
        qc = features.quantize_c0(c0, CFG)
        assert qc[0] == 0 and qc[-1] == CFG.n_c0_bins - 1

    def test_trim_silence(self):
        y = np.concatenate([np.zeros(4000), _sig(8000), np.zeros(4000)]).astype(np.float32)
        trimmed = features.trim_silence(y, CFG)
        assert len(trimmed) < len(y)
        assert len(trimmed) >= 7000

    def test_align_wav(self):
        y = np.ones(1000, np.float32)
        assert len(features.align_wav(y, 256)) % 256 == 0

    def test_load_save_roundtrip(self, tmp_path):
        y = _sig(4096)
        p = str(tmp_path / 'a.wav')
        features.save_wav(y, p, CFG)
        y2 = features.load_wav(p, CFG)
        np.testing.assert_allclose(y2, y, atol=1e-4)

    def test_augment_wav_runs(self):
        y = _sig(22050)
        rng = np.random.RandomState(3)
        out = features.augment_wav(y, CFG, rng)
        assert np.isfinite(out).all() and np.abs(out).max() <= 1.0 + 1e-5

    def test_augment_spec_shape(self):
        rng = np.random.RandomState(4)
        s = np.random.RandomState(0).randn(80, 64).astype(np.float32)
        out = features.augment_spec(s, rng, rounds=5)
        assert out.shape == s.shape and np.isfinite(out).all()

    def test_pitch_shift_moves_f0(self):
        t = np.arange(22050) / CFG.sample_rate
        y = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        up = features.pitch_shift(y, 12, CFG)
        assert len(up) == len(y)
        # measure pitch by zero-crossing rate (YIN can octave-skip on the
        # slightly phasy vocoded tone); 440 Hz -> zcr = 880/sr
        z = np.median(features.get_zcr(up, CFG)[10:-10])
        assert abs(z - 880 / CFG.sample_rate) < 0.004

    def test_time_stretch_changes_length_not_pitch(self):
        t = np.arange(22050) / CFG.sample_rate
        y = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        st = features.time_stretch(y, 0.5, CFG)
        assert abs(len(st) - 2 * len(y)) <= 2
        z = np.median(features.get_zcr(st, CFG)[10:-10])
        assert abs(z - 440 / CFG.sample_rate) < 0.004
