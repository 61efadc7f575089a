"""I/O layer: native WAV codec round-trips, sidecar merge, model config."""

import json
import struct
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


# ---------------------------------------------------------------------------
# hand-built WAV bytes: every PCM depth + IEEE float + extensible GUID
# (the wave module only writes plain PCM, so these paths were untested)
# ---------------------------------------------------------------------------


def _riff(fmt_tag, channels, sr, bits, payload, extensible=False):
    if extensible:
        # 40-byte fmt: cbSize=22, valid bits, channel mask, GUID with the
        # real format tag in the first two bytes
        ext = struct.pack("<HHI", bits, 22, 0) + struct.pack("<H", fmt_tag) + b"\x00" * 14
        body = struct.pack("<HHIIHH", 0xFFFE, channels, sr,
                           sr * channels * bits // 8, channels * bits // 8, bits) + ext
    else:
        body = struct.pack("<HHIIHH", fmt_tag, channels, sr,
                           sr * channels * bits // 8, channels * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")
    chunks += b"data" + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.mark.parametrize("depth", [8, 24, 32])
def test_wav_pcm_depths_exact(tmp_path, rng, depth):
    from audio_analysis_tpu.io.audio import load_audio_mono

    n = 1001  # odd length: exercises the data-chunk pad byte
    if depth == 8:
        vals = rng.randint(0, 256, size=n).astype(np.uint8)
        payload = vals.tobytes()
        want = (vals.astype(np.float32) - 128.0) / 128.0
    elif depth == 24:
        vals = rng.randint(-(1 << 23), 1 << 23, size=n).astype(np.int32)
        le32 = vals.astype("<i4").tobytes()
        payload = b"".join(le32[i * 4 : i * 4 + 3] for i in range(n))
        want = vals.astype(np.float32) / float(1 << 23)
    else:
        vals = rng.randint(-(1 << 31), 1 << 31, size=n, dtype=np.int64).astype(np.int32)
        payload = vals.astype("<i4").tobytes()
        want = vals.astype(np.float32) / float(1 << 31)
    p = tmp_path / "t.wav"
    p.write_bytes(_riff(1, 1, 48000, depth, payload))
    got, sr = load_audio_mono(p)
    assert sr == 48000
    np.testing.assert_array_equal(got, want)


def test_wav_float64_and_extensible(tmp_path, rng):
    from audio_analysis_tpu.io.audio import load_audio_mono

    # IEEE float64 mono
    vals = rng.randn(500).astype(np.float64) * 0.3
    p = tmp_path / "f64.wav"
    p.write_bytes(_riff(3, 1, 44100, 64, vals.astype("<f8").tobytes()))
    got, sr = load_audio_mono(p)
    assert sr == 44100
    np.testing.assert_array_equal(got, vals.astype(np.float32))

    # extensible-GUID stereo int16: GUID carries the real tag; stereo means
    l = rng.randint(-32768, 32768, size=400).astype(np.int16)
    r = rng.randint(-32768, 32768, size=400).astype(np.int16)
    inter = np.empty(800, np.int16)
    inter[0::2] = l
    inter[1::2] = r
    p2 = tmp_path / "ext.wav"
    p2.write_bytes(_riff(1, 2, 16000, 16, inter.astype("<i2").tobytes(), extensible=True))
    got2, sr2 = load_audio_mono(p2)
    assert sr2 == 16000
    want = (l.astype(np.float32) / 32768.0 + r.astype(np.float32) / 32768.0) / 2.0
    np.testing.assert_allclose(got2, want, atol=1e-7)


def test_wav_unknown_format_tag_raises(tmp_path):
    from audio_analysis_tpu.io.audio import load_audio_mono

    p = tmp_path / "alaw.wav"
    p.write_bytes(_riff(6, 1, 8000, 8, b"\x00" * 64))  # 6 = a-law
    with pytest.raises(ValueError, match="format tag"):
        load_audio_mono(p)
