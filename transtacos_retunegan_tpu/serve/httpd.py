"""Stdlib HTTP services matching the reference endpoint contract.

Three surfaces (flask is not in this image; ThreadingHTTPServer is used):

* port 5103 (WebUI, reference ``app.py``): ``GET /`` demo page,
  ``GET /synth?text=`` -> wav bytes (text-norm + clause packing + full TTS)
* port 5105 (acoustic, reference ``transtacos/server.py``): ``GET /``,
  ``GET /synth?text=`` (internal Griffin-Lim), ``POST /synth_spec``
  (json {pinyin}) -> pickled float32 spec
* port 5104 (vocoder, reference ``retunegan/server.py``):
  ``POST /vocode`` (pickled spec) -> pickled float32 wav

``serve_all`` runs all three endpoint groups in ONE process against one
``Synthesizer`` -- the pickle/HTTP hops of the reference collapse into
in-process calls while the wire contract stays drop-in compatible.
"""

from __future__ import annotations

import io
import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, unquote, urlparse

import numpy as np
from scipy.io import wavfile

from .pipeline import Synthesizer

INDEX_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>TransTacoS-RetuneGAN (TPU)</title></head>
<body>
<h3>TPU-native Mandarin TTS</h3>
<input id="text" size="60" value="ni3 hao3 shi4 jie4"/>
<button onclick="synth()">Synthesize</button>
<div id="status"></div>
<audio id="player" controls autoplay></audio>
<script>
async function synth() {
  const t = document.getElementById('text').value;
  document.getElementById('status').innerText = 'synthesizing...';
  const r = await fetch('/synth?text=' + encodeURIComponent(t));
  if (!r.ok) { document.getElementById('status').innerText = 'error'; return; }
  const blob = await r.blob();
  document.getElementById('player').src = URL.createObjectURL(blob);
  document.getElementById('status').innerText = 'done';
}
</script>
</body></html>
"""


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    wavfile.write(buf, sr, wav.astype(np.float32))
    return buf.getvalue()


def _mp3_bytes(wav_bytes: bytes) -> Optional[bytes]:
    """Opportunistic mp3 compression (reference ``app.py:85-90`` shells out
    to ffmpeg): uses an ``ffmpeg`` binary when one is on PATH, returns None
    otherwise so callers fall back to wav gracefully."""
    import shutil
    import subprocess
    if shutil.which('ffmpeg') is None:
        return None
    try:
        r = subprocess.run(
            ['ffmpeg', '-i', 'pipe:0', '-f', 'mp3', '-acodec', 'libmp3lame',
             '-loglevel', 'quiet', 'pipe:1'],
            input=wav_bytes, capture_output=True, timeout=60)
        return r.stdout if r.returncode == 0 and r.stdout else None
    except Exception:
        return None


def make_handler(synth: Synthesizer, role: str, frontend=None):
    """role in {'webui', 'acoustic', 'vocoder', 'all'} gates which routes
    exist.  ``frontend`` (a ``batcher.BatchingFrontend``) routes the neural
    surfaces through dynamic micro-batching: concurrent requests coalesce
    into one batched device program instead of serializing."""
    sr = synth.cfg.audio.sample_rate

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _err(self, e: Exception, code: int = 500):
            self._send(code, json.dumps({'error': repr(e)}).encode(),
                       'application/json')

        def do_GET(self):
            url = urlparse(self.path)
            try:
                if url.path == '/':
                    self._send(200, INDEX_HTML.encode(), 'text/html; charset=utf-8')
                elif url.path == '/synth' and role in ('webui', 'acoustic', 'all'):
                    q = parse_qs(url.query)
                    txt = unquote(q.get('text', [''])[0]).strip()
                    if not txt:
                        return self._send(400, b'{"error": "empty request"}',
                                          'application/json')
                    # acoustic role uses internal Griffin-Lim; webui/all use
                    # the neural vocoder (reference behavior split)
                    neural = role in ('webui', 'all')
                    if neural and frontend is not None:
                        wav = frontend.tts(txt)
                    else:
                        wav = synth.tts(txt, neural=neural)
                    body = _wav_bytes(wav, sr)
                    # ?format=mp3: compress when ffmpeg exists on PATH
                    # (reference app.py:85-90), else serve wav unchanged
                    if q.get('format', [''])[0] == 'mp3':
                        mp3 = _mp3_bytes(body)
                        if mp3 is not None:
                            return self._send(200, mp3, 'audio/mpeg')
                    self._send(200, body, 'audio/wav')
                elif url.path == '/healthz':
                    self._send(200, b'ok', 'text/plain')
                else:
                    self._send(404, b'not found', 'text/plain')
            except Exception as e:                       # noqa: BLE001
                self._err(e)

        def do_POST(self):
            url = urlparse(self.path)
            length = int(self.headers.get('Content-Length', 0))
            body = self.rfile.read(length)
            try:
                if url.path == '/synth_batch' and role in ('webui', 'all'):
                    # batched synthesis: json {"texts": [...]} -> pickled
                    # list of float32 waveforms (one decode scan for all)
                    payload = json.loads(body)
                    texts = payload['texts']
                    neural = bool(payload.get('neural', True))
                    if neural and frontend is not None:
                        wavs = frontend.tts_batch(texts)
                    else:
                        wavs = synth.tts_batch(texts, neural=neural)
                    self._send(200, pickle.dumps([w.astype(np.float32)
                                                  for w in wavs]),
                               'application/octet-stream')
                elif url.path == '/synth_spec' and role in ('acoustic', 'all'):
                    payload = json.loads(body)
                    pinyin = payload['pinyin']
                    if frontend is not None:
                        spec = frontend.synth_spec(pinyin)
                    else:
                        spec = synth.synthesize_spec(pinyin)   # [F, T] ... but the
                    # reference returns [T, F] (synth.py returns S then the
                    # server pickles it; app.py concatenates on axis 0 = time)
                    self._send(200, pickle.dumps(spec.T.astype(np.float32)),
                               'application/octet-stream')
                elif url.path == '/vocode' and role in ('vocoder', 'all'):
                    spec = pickle.loads(body)
                    if frontend is not None:
                        wav = frontend.vocode(np.asarray(spec, np.float32))
                    else:
                        wav = synth.vocode(np.asarray(spec, np.float32))
                    self._send(200, pickle.dumps(wav.astype(np.float32)),
                               'application/octet-stream')
                else:
                    self._send(404, b'not found', 'text/plain')
            except Exception as e:                       # noqa: BLE001
                self._err(e)

    return Handler


def serve(synth: Synthesizer, role: str, port: int,
          host: str = '0.0.0.0', batching: bool = False,
          max_batch: int = 8,
          batch_window_s: float = 0.006) -> ThreadingHTTPServer:
    frontend = None
    if batching:
        from .batcher import BatchingFrontend
        frontend = BatchingFrontend(synth, max_batch=max_batch,
                                    window_s=batch_window_s)
    server = ThreadingHTTPServer((host, port),
                                 make_handler(synth, role, frontend))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def serve_all(synth: Optional[Synthesizer] = None, host: str = '0.0.0.0',
              webui_port: int = 5103, vocoder_port: int = 5104,
              acoustic_port: int = 5105, batching: bool = True,
              max_batch: int = 8, batch_window_s: float = 0.006):
    """One process, three reference-compatible ports.

    ``batching=True`` (default) shares ONE micro-batching frontend across
    all three ports, so concurrent requests coalesce regardless of which
    endpoint they hit."""
    synth = synth or Synthesizer()
    frontend = None
    if batching:
        from .batcher import BatchingFrontend
        frontend = BatchingFrontend(synth, max_batch=max_batch,
                                    window_s=batch_window_s)

    def _serve(role, port):
        server = ThreadingHTTPServer((host, port),
                                     make_handler(synth, role, frontend))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server

    servers = [
        _serve('all', webui_port),
        _serve('vocoder', vocoder_port),
        _serve('acoustic', acoustic_port),
    ]
    return servers
