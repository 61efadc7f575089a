"""I/O layer: native WAV codec round-trips, sidecar merge, model config."""

import json
import numpy as np
import pytest

from audio_analysis_tpu.io import (
    load_recording,
    load_audio_mono,
    write_wav,
    read_sidecar,
    write_sidecar_result,
    jsdump,
    ModelConfig,
    load_model_meta,
)
from audio_analysis_tpu.io.audio import _decode_wav


def test_wav_roundtrip_mono(tmp_path, rng):
    y = (0.5 * rng.randn(16000)).clip(-1, 1).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, y, 16000)
    x, sr = load_audio_mono(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1.5 / 32768)


def test_wav_roundtrip_stereo_means(tmp_path, rng):
    y = (0.3 * rng.randn(8000, 2)).clip(-1, 1).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(p, y, 48000)
    x, sr = load_audio_mono(p)
    np.testing.assert_allclose(x, y.mean(axis=1), atol=2.0 / 32768)


def test_wav_float32(tmp_path, rng):
    import struct

    y = (0.5 * rng.randn(1000)).astype("<f4")
    blob = y.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(blob)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 22050, 22050 * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(blob))
    p = tmp_path / "f.wav"
    p.write_bytes(hdr + blob)
    x, sr = _decode_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(x[0], y, atol=1e-7)


def test_load_recording_resamples(tmp_path, rng):
    y = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32) * 0.5
    p = tmp_path / "r.wav"
    write_wav(p, y, 16000)
    frames, sr = load_recording(p, resample=48000)
    assert sr == 48000
    assert abs(len(frames) - 48000) <= 1
    # spectral peak still at 440 Hz
    spec = np.abs(np.fft.rfft(frames))
    peak = np.argmax(spec) * 48000 / len(frames)
    assert abs(peak - 440) < 2


def test_load_recording_failure_raises_fresh_exception(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav at all")
    with pytest.raises(Exception, match="Could not load"):
        load_recording(p)


def test_sidecar_merge(tmp_path):
    audio = tmp_path / "x.wav"
    sc = tmp_path / "x.txt"
    sc.write_text(json.dumps({"location": {"lat": -41.0, "lng": 174.0}}))
    assert read_sidecar(audio)["location"]["lat"] == -41.0
    write_sidecar_result(audio, {"duration": 60})
    data = json.loads(sc.read_text())
    assert data["analysis_result"]["duration"] == 60
    assert data["location"]["lng"] == 174.0


def test_sidecar_absent(tmp_path):
    assert read_sidecar(tmp_path / "none.wav") is None
    # writing creates the sidecar with only the analysis_result key
    write_sidecar_result(tmp_path / "none.wav", {"a": 1})
    data = json.loads((tmp_path / "none.txt").read_text())
    assert data == {"analysis_result": {"a": 1}}


def test_jsdump_stable():
    assert jsdump({"b": 1, "a": 2}) == '{\n    "a": 2,\n    "b": 1\n}'


def test_model_config_defaults():
    cfg = ModelConfig.from_meta({})
    assert cfg.segment_length == 3 and cfg.segment_stride == 1.5
    assert cfg.hop_length == 640 and cfg.n_mels == 160
    assert cfg.break_freq == 1750 and cfg.fmin == 50 and cfg.fmax == 11000
    assert cfg.threshold == 0.7 and cfg.n_fft == 4096
    assert cfg.db_scale is True and cfg.normalize is True
    assert cfg.bird_labels == ["bird", "kiwi", "whistler", "morepork"]
    assert cfg.magv2 is True


def test_model_config_n_fft_none_guard():
    assert ModelConfig.from_meta({"n_fft": None}).n_fft == 4096


def test_model_config_efficientnet_flag():
    assert ModelConfig.from_meta({"name": "EfficientNetB0"}).is_efficientnet
    assert not ModelConfig.from_meta({"name": "birdnet"}).is_efficientnet


def test_load_model_meta_file_and_dir(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    (d / "metadata.txt").write_text(json.dumps({"name": "m1", "labels": ["bird"]}))
    # dir form
    assert load_model_meta(d)["name"] == "m1"
    # file form: metadata.txt sits next to the weights file
    (d / "audioModel.keras").write_bytes(b"")
    assert load_model_meta(d / "audioModel.keras")["name"] == "m1"


def test_wav_parser_corruption_fuzz(tmp_path, rng):
    """Corrupted/truncated WAV bytes must either decode or raise — never
    hang or crash the process. The RIFF chunk walk advances by >= 8 bytes
    per chunk so termination is structural; this pins it plus clean error
    behaviour across truncations, byte flips, and chunk-size corruption."""
    import wave

    from audio_analysis_tpu.io.audio import load_audio_mono

    src = tmp_path / "good.wav"
    pcm = (rng.randn(4800) * 3000).astype(np.int16)
    with wave.open(str(src), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(pcm.tobytes())
    good = src.read_bytes()

    f = tmp_path / "fuzz.wav"
    n_ok = n_err = 0
    cases = []
    # truncations (every region: header, fmt, data)
    cases += [good[:k] for k in (0, 4, 11, 12, 20, 36, 43, 44, 100, len(good) - 1)]
    # single-byte flips across the file
    for i in range(40):
        pos = int(rng.randint(0, len(good)))
        b = bytearray(good)
        b[pos] ^= 0xFF
        cases.append(bytes(b))
    # chunk-size corruption: huge sizes, zero sizes
    for val in (0, 1, 0x7FFFFFFF, 0xFFFFFFFF):
        b = bytearray(good)
        b[16:20] = val.to_bytes(4, "little")  # fmt chunk size
        cases.append(bytes(b))
        b = bytearray(good)
        b[40:44] = val.to_bytes(4, "little")  # data chunk size
        cases.append(bytes(b))
    for payload in cases:
        f.write_bytes(payload)
        try:
            y, sr = load_audio_mono(f)
            assert isinstance(y, np.ndarray)
            n_ok += 1
        except Exception:
            n_err += 1
    # both outcomes must occur: some mutations are harmless (flip inside
    # PCM data), the structural ones must raise
    assert n_ok > 0 and n_err > 0
