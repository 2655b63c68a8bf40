"""HTTP serving daemon (tools/serve_http.py): routes, WAV payloads,
voice handling, batch endpoint — on the quick-tier tiny engine."""

import base64
import io
import json
import urllib.error
import urllib.request
import wave as _wave

import numpy as np
import pytest

from styletts2_tpu.config import load_config
from styletts2_tpu.infer import StyleTTS2
from styletts2_tpu.tools.serve_http import TTSService, make_server, wav_bytes


@pytest.fixture(scope="module")
def server():
    cfg = load_config({
        "preprocess_params": {"spect_params": {"n_fft": 512,
                                               "win_length": 240,
                                               "hop_length": 60}},
        "model_params": {
            "hidden_dim": 64, "max_conv_dim": 64, "dim_in": 16,
            "style_dim": 32, "max_dur": 10,
            "decoder": {"type": "hifigan",
                        "upsample_initial_channel": 512,
                        "upsample_rates": [10, 6],
                        "upsample_kernel_sizes": [20, 12],
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]]},
        },
        "tpu": {"token_buckets": [24, 48],
                "frame_buckets": [60, 120, 240],
                "decoder_dtype": "float32"},
        "debug": False,
    })
    engine = StyleTTS2(cfg, seed=0)
    engine.fixed_duration = 10  # tiny-hop random-weight chunks (see
    #                             tests/test_quick_e2e.py)
    rng = np.random.default_rng(0)
    styles = {}
    for name in ("alice", "bob"):
        wav_ref = (rng.standard_normal(24000 * 2) * 0.1).astype(np.float32)
        styles[name] = np.asarray(engine.compute_style(wav_ref, denoise=0.0))
    service = TTSService(engine, styles)
    srv = make_server(service, port=0)  # ephemeral port
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", engine
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _parse_wav(data: bytes):
    with _wave.open(io.BytesIO(data)) as f:
        assert f.getnchannels() == 1 and f.getsampwidth() == 2
        return f.getframerate(), np.frombuffer(
            f.readframes(f.getnframes()), "<i2")


def test_health_and_voices(server):
    base, engine = server
    status, body, ctype = _get(base + "/health")
    assert status == 200 and ctype == "application/json"
    h = json.loads(body)
    assert h["ok"] and h["sr"] == engine.sr and h["n_voices"] == 2
    assert json.loads(_get(base + "/voices")[1])["voices"] == ["alice",
                                                               "bob"]


def test_tts_returns_wav(server):
    base, engine = server
    status, body, ctype = _post(base + "/tts", {
        "text": "hello there", "voice": "alice", "stabilize": False})
    assert status == 200 and ctype == "audio/wav"
    sr, pcm = _parse_wav(body)
    assert sr == engine.sr and len(pcm) > 8000
    # trimmed silence padding survives the 16-bit round trip
    assert np.abs(pcm[:4000]).max() == 0 and np.abs(pcm[-4000:]).max() == 0


def test_tts_voice_errors(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/tts", {"text": "hi", "voice": "nobody"})
    assert e.value.code == 400
    assert "unknown voice" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/tts", {"text": "hi"})  # ambiguous: two voices
    assert e.value.code == 400


def test_tts_batch(server):
    base, engine = server
    status, body, _ = _post(base + "/tts_batch", {
        "texts": ["first text here", "the second one"],
        "voice": "bob", "stabilize": False})
    assert status == 200
    wavs = json.loads(body)["wavs"]
    assert len(wavs) == 2
    for b64 in wavs:
        sr, pcm = _parse_wav(base64.b64decode(b64))
        assert sr == engine.sr and len(pcm) > 8000


def test_wav_bytes_roundtrip():
    wav = np.sin(np.linspace(0, 40, 2400)).astype(np.float32) * 0.5
    sr, pcm = _parse_wav(wav_bytes(wav, 24000))
    assert sr == 24000
    np.testing.assert_allclose(pcm / 32767.0, np.clip(wav, -1, 1),
                               atol=1.0 / 32000)


def test_bad_request_shapes_are_400(server):
    base, _ = server
    # valid JSON but not an object
    req = urllib.request.Request(
        base + "/tts", data=b"[1, 2]",
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    # missing text
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/tts", {"voice": "alice"})
    assert e.value.code == 400
    assert "required" in json.loads(e.value.read())["error"]
    # non-numeric speed is a client error, not a 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/tts", {"text": "hi", "voice": "alice",
                              "speed": "fast"})
    assert e.value.code == 400
