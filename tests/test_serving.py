"""End-to-end serving tests: pipeline surfaces + the HTTP contract."""

import dataclasses
import json
import pickle
import urllib.request

import numpy as np
import pytest

from transtacos_retunegan_tpu.config import Config
from transtacos_retunegan_tpu.serve.httpd import serve_all
from transtacos_retunegan_tpu.serve.pipeline import Synthesizer


@pytest.fixture(scope='module')
def synth():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        # fewer GL iterations: CPU test-suite cost, not a behavior change
        audio=dataclasses.replace(cfg.audio, gl_iters_acoustic=6),
        acoustic=dataclasses.replace(
            cfg.acoustic, embed_depth=32, encoder_depth=32, decoder_depth=64,
            attention_depth=16, prenet_depths=(32,), posnet_depth=64,
            var_embed_depth=16, var_prednet_depth=16, prdsnet_depth=16,
            posenc_depth=8, max_iters=6),
        vocoder=dataclasses.replace(cfg.vocoder, upsample_initial_channel=32),
    )
    return Synthesizer(cfg)


class TestPipeline:
    @pytest.mark.smoke
    def test_synthesize_spec_contract(self, synth):
        spec = synth.synthesize_spec('ni3 hao3')
        assert spec.shape[0] == 1025          # DC restored
        assert spec.shape[1] % 5 == 0
        assert np.isfinite(spec).all() and (spec >= 0).all()

    def test_synthesize_wav_gl(self, synth):
        wav = synth.synthesize_wav('ni3 hao3', trim=False)
        assert wav.ndim == 1 and len(wav) > 0
        assert np.isfinite(wav).all()

    def test_vocode_both_orientations(self, synth):
        spec = synth.synthesize_spec('da4 jia1')
        w1 = synth.vocode(spec)
        w2 = synth.vocode(spec.T)
        assert len(w1) == len(w2) == 256 * spec.shape[1]

    def test_tts_pinyin(self, synth):
        wav = synth.tts('zhong1 guo2', neural=True)
        assert len(wav) > 0 and np.isfinite(wav).all()
        assert np.abs(wav).max() <= 1.0

    def test_tts_kanji_without_provider_raises(self, synth):
        if synth.kanji2pinyin.available:
            pytest.skip('pinyin provider present')
        with pytest.raises(RuntimeError, match='pinyin'):
            synth.tts('你好世界')

    def test_tts_batch(self, synth):
        wavs = synth.tts_batch(['ni3 hao3', 'zhong1 guo2 ren2'], neural=True)
        assert len(wavs) == 2
        for w in wavs:
            assert len(w) > 0 and np.isfinite(w).all()
        # batched acoustic output matches the single-request path
        s_single = synth.synthesize_spec('ni3 hao3')
        s_batch = synth.synthesize_spec_batch(['ni3 hao3', 'zhong1 guo2 ren2'])[0]
        assert s_single.shape == s_batch.shape
        np.testing.assert_allclose(s_single, s_batch, rtol=1e-3, atol=1e-4)

    def test_vocode_batch_matches_single(self, synth):
        """The batched vocoder path is numerically the vmapped single path:
        same spec + same key => same wav."""
        import jax
        spec = synth.synthesize_spec('ni3 hao3')
        t_pad = -(-max(spec.shape[1], 64) // 64) * 64
        pad = np.full((spec.shape[0], t_pad - spec.shape[1]),
                      float(spec.min()), spec.dtype)
        mag = np.concatenate([spec, pad], axis=1)
        key = jax.random.PRNGKey(7)
        w1 = np.asarray(synth._vocode_fn(t_pad)(synth.gen_params, mag, key))
        wb = np.asarray(synth._vocode_batch_fn(t_pad)(
            synth.gen_params, mag[None], key[None]))
        np.testing.assert_allclose(w1, wb[0], rtol=1e-3, atol=1e-4)

    def test_vocode_batch_lengths(self, synth):
        """Mixed-length batch: each wav trims to its own spec length and the
        batch pads to a power of two internally."""
        specs = [synth.synthesize_spec(p)
                 for p in ('a1', 'ni3 hao3 shi4 jie4', 'zhong1 guo2')]
        wavs = synth.vocode_batch(specs)
        assert len(wavs) == 3
        for s, w in zip(specs, wavs):
            assert len(w) == 256 * s.shape[1]
            assert np.isfinite(w).all()

    def test_tts_fused_single_dispatch(self, synth):
        """The one-dispatch text->wav surface produces finite audio whose
        length matches the stop-token trim of the staged path."""
        wav = synth.tts_fused('ni3 hao3')
        assert wav.ndim == 1 and len(wav) > 0
        assert np.isfinite(wav).all()
        spec = synth.synthesize_spec('ni3 hao3')
        assert len(wav) == 256 * spec.shape[1]

    def test_bucket_reuse(self, synth):
        # two different lengths within the same bucket share a compile
        synth.vocode(synth.synthesize_spec('a1'))
        n_before = synth._vocode_fn.cache_info().currsize
        synth.vocode(synth.synthesize_spec('a1 a2'))
        assert synth._vocode_fn.cache_info().currsize == n_before


class TestMeshDPServing:
    """Data-parallel serving: batched surfaces shard over a device mesh."""

    @pytest.fixture(scope='class')
    def dp_synth(self, synth):
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ('data',))
        return Synthesizer(synth.cfg, mesh=mesh)

    def test_mesh_keeps_fused_decoder_for_single_requests(self, synth):
        """A DP mesh must not slow the single-request paths: the fused
        pallas kernel stays selected there, and only the SHARDED batched
        acoustic program falls back to the flax scan (the pallas custom
        call cannot be partitioned by GSPMD)."""
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ('data',))
        s = Synthesizer(synth.cfg, mesh=mesh, fused_decoder=True)
        assert s.fused_decoder                    # not clobbered by the mesh
        assert s._select_fused(sharded=False)     # single-request: pallas
        assert not s._select_fused(sharded=True)  # mesh-DP batched: flax
        # without a mesh the batched path keeps the fused kernel too
        s2 = Synthesizer(synth.cfg, fused_decoder=True)
        assert s2._select_fused(sharded=True)

    def test_spec_batch_matches_unsharded(self, synth, dp_synth):
        """b=3 pads to the 4-way data axis; results match the plain path."""
        texts = ['ni3 hao3', 'zhong1 guo2 ren2', 'a1']
        plain = synth.synthesize_spec_batch(texts)
        sharded = dp_synth.synthesize_spec_batch(texts)
        assert len(sharded) == 3
        for p, s in zip(plain, sharded):
            assert p.shape == s.shape
            np.testing.assert_allclose(p, s, rtol=1e-3, atol=1e-4)

    def test_vocode_batch_matches_unsharded(self, synth, dp_synth):
        import jax
        spec = synth.synthesize_spec('ni3 hao3')
        t_pad = -(-max(spec.shape[1], 64) // 64) * 64
        pad = np.full((spec.shape[0], t_pad - spec.shape[1]),
                      float(spec.min()), spec.dtype)
        mag = np.concatenate([spec, pad], axis=1)
        mags = np.stack([mag] * 4)
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        plain = np.asarray(synth._vocode_batch_fn(t_pad)(
            synth.gen_params, mags, keys))
        sharded = np.asarray(dp_synth._vocode_batch_fn(t_pad)(
            dp_synth.gen_params, mags, keys))
        np.testing.assert_allclose(plain, sharded, rtol=1e-3, atol=1e-4)

    def test_tts_batch_end_to_end(self, dp_synth):
        wavs = dp_synth.tts_batch(['ni3 hao3', 'zhong1 guo2'], neural=True)
        assert len(wavs) == 2
        for w in wavs:
            assert len(w) > 0 and np.isfinite(w).all()


class TestHTTP:
    @pytest.fixture(scope='class')
    def servers(self, synth):
        # port 0 = ephemeral: parallel test runs don't collide
        servers = serve_all(synth, host='127.0.0.1', webui_port=0,
                            vocoder_port=0, acoustic_port=0)
        yield servers
        for s in servers:
            s.shutdown()

    @pytest.fixture(scope='class')
    def ports(self, servers):
        return {role: s.server_address[1]
                for role, s in zip(('webui', 'vocoder', 'acoustic'), servers)}

    def test_webui_page(self, ports):
        body = urllib.request.urlopen(f"http://127.0.0.1:{ports['webui']}/").read()
        assert b'<html' in body.lower()

    def test_synth_endpoint_returns_wav(self, ports):
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{ports['webui']}/synth?text=ni3%20hao3", timeout=300)
        body = r.read()
        assert body[:4] == b'RIFF'
        assert r.headers['Content-Type'] == 'audio/wav'

    def test_synth_spec_pickle_contract(self, ports):
        req = urllib.request.Request(
            f"http://127.0.0.1:{ports['acoustic']}/synth_spec",
            data=json.dumps({'pinyin': 'ni3 hao3'}).encode(),
            headers={'Content-Type': 'application/json'})
        spec = pickle.loads(urllib.request.urlopen(req, timeout=300).read())
        assert spec.dtype == np.float32
        assert spec.shape[1] == 1025          # [T, F] like the reference

    def test_vocode_pickle_contract(self, ports):
        spec = np.abs(np.random.RandomState(0).randn(40, 1025) * 0.01).astype(np.float32)
        req = urllib.request.Request(f"http://127.0.0.1:{ports['vocoder']}/vocode",
                                     data=pickle.dumps(spec))
        wav = pickle.loads(urllib.request.urlopen(req, timeout=300).read())
        assert wav.dtype == np.float32
        assert len(wav) == 40 * 256

    def test_empty_text_400(self, ports):
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{ports['webui']}/synth?text=", timeout=60)
            assert False, 'expected HTTP error'
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_synth_batch_endpoint(self, ports):
        req = urllib.request.Request(
            f"http://127.0.0.1:{ports['webui']}/synth_batch",
            data=json.dumps({'texts': ['ni3 hao3', 'da4 jia1'],
                             'neural': False}).encode(),
            headers={'Content-Type': 'application/json'})
        wavs = pickle.loads(urllib.request.urlopen(req, timeout=300).read())
        assert len(wavs) == 2
        assert all(w.dtype == np.float32 and len(w) > 0 for w in wavs)

    def test_pipeline_parity_with_reference_chain(self, ports, synth):
        """The reference chain: POST /synth_spec -> concat -> POST /vocode.
        Verify wire-format compatibility end to end."""
        req = urllib.request.Request(
            f"http://127.0.0.1:{ports['acoustic']}/synth_spec",
            data=json.dumps({'pinyin': 'da4 jia1 hao3'}).encode(),
            headers={'Content-Type': 'application/json'})
        spec = pickle.loads(urllib.request.urlopen(req, timeout=300).read())
        spec_cat = np.concatenate([spec], axis=0)   # app.py:69 time concat
        req2 = urllib.request.Request(f"http://127.0.0.1:{ports['vocoder']}/vocode",
                                      data=pickle.dumps(spec_cat))
        wav = pickle.loads(urllib.request.urlopen(req2, timeout=300).read())
        assert len(wav) == spec_cat.shape[0] * 256

    def test_synth_mp3_falls_back_to_wav_without_ffmpeg(self, ports, monkeypatch):
        """?format=mp3 must degrade gracefully to wav when ffmpeg is absent
        (opportunistic compression, reference ``app.py:85-90``)."""
        import shutil
        # the server runs in-process threads, so this patch covers it
        monkeypatch.setattr(shutil, 'which', lambda name: None)
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{ports['webui']}/synth?text=ni3%20hao3&format=mp3",
            timeout=300)
        body = r.read()
        assert body[:4] == b'RIFF'
        assert r.headers['Content-Type'] == 'audio/wav'


class TestMp3Helper:
    def test_none_without_ffmpeg(self, monkeypatch):
        import shutil
        from transtacos_retunegan_tpu.serve import httpd
        monkeypatch.setattr(shutil, 'which', lambda name: None)
        assert httpd._mp3_bytes(b'RIFFxxxx') is None

    def test_uses_ffmpeg_when_present(self, tmp_path, monkeypatch):
        """Stub ffmpeg on PATH: the helper must pipe wav in and return the
        binary's stdout as the mp3 payload."""
        import os
        from transtacos_retunegan_tpu.serve import httpd
        stub = tmp_path / 'ffmpeg'
        stub.write_text('#!/bin/sh\ncat > /dev/null\nprintf "ID3FAKE"\n')
        os.chmod(stub, 0o755)
        monkeypatch.setenv('PATH', f"{tmp_path}:{os.environ['PATH']}")
        out = httpd._mp3_bytes(b'RIFF' + b'\x00' * 64)
        assert out == b'ID3FAKE'
