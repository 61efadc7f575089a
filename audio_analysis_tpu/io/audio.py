"""Audio decode on host; resampling happens on device.

Decode contract follows the reference (src/common.py:70-96,
src/identify_tracks.py:49-62): any input becomes mono float32 PCM at the
requested rate. Decode itself is not a TPU workload, so:

- WAV/RIFF files are parsed natively here (PCM 8/16/24/32, IEEE float32/64)
  with zero external dependencies;
- everything else shells out to ffmpeg / opusdec exactly like the reference
  when those binaries exist, and raises a clean error when they don't
  (this image ships no ffmpeg);
- rate conversion runs on device via ops.resample (polyphase conv) instead
  of librosa/ffmpeg's host resamplers.
"""

import logging
import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# Native RIFF/WAV parsing
# ---------------------------------------------------------------------------


def _decode_wav(path: Path):
    """Minimal RIFF parser -> (float32 [channels, n] in [-1, 1], sample_rate)."""
    raw = path.read_bytes()
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path} is not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(fmt_body) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        # the subformat GUID's first two bytes carry the real format tag
        (audio_format,) = struct.unpack("<H", fmt_body[24:26])
    if audio_format == 1:  # PCM
        if bits == 8:
            x = (data_np(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = data_np(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = data_np(data, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = data_np(data, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format tag {audio_format}")
    n = len(x) - len(x) % channels
    return x[:n].reshape(-1, channels).T, sample_rate


def data_np(buf: bytes, dtype) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.dtype(dtype))
    return a


# ---------------------------------------------------------------------------
# ffmpeg / opusdec subprocess decode (reference contract)
# ---------------------------------------------------------------------------


def _decode_ffmpeg(path: Path, sample_rate=None):
    """ffmpeg decode to mono float32 (reference: src/common.py:76-90)."""
    cmd = ["ffmpeg", "-i", str(path)]
    if sample_rate:
        cmd += ["-ar", str(int(sample_rate))]
    cmd += ["-f", "f32le", "-c:a", "pcm_f32le", "-ac", "1", "-"]
    p = subprocess.run(cmd, capture_output=True)
    if p.returncode != 0:
        raise ValueError(f"ffmpeg failed on {path}: {p.stderr[-400:]!r}")
    x = np.frombuffer(p.stdout, dtype="<f4")
    if sample_rate is None:
        sample_rate = _probe_rate(path)
    return x[None, :], sample_rate


def _decode_opusdec(path: Path, sample_rate=48000):
    """opusdec decode, forced stereo then channel mean
    (reference: src/common.py:81-95)."""
    cmd = [
        "opusdec",
        "--float",
        "--quiet",
        "--rate",
        str(int(sample_rate)),
        "--force-stereo",
        str(path),
        "-",
    ]
    p = subprocess.run(cmd, capture_output=True)
    if p.returncode != 0:
        raise ValueError(f"opusdec failed on {path}: {p.stderr[-400:]!r}")
    x = np.frombuffer(p.stdout, dtype="<f4")
    x = x[: len(x) - len(x) % 2].reshape(-1, 2).T
    return x, sample_rate


def _probe_rate(path: Path) -> int:
    p = subprocess.run(
        [
            "ffprobe",
            "-v",
            "error",
            "-select_streams",
            "a:0",
            "-show_entries",
            "stream=sample_rate",
            "-of",
            "csv=p=0",
            str(path),
        ],
        capture_output=True,
    )
    return int(p.stdout.strip() or 48000)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def load_audio_mono(path, sample_rate=None) -> tuple:
    """Decode to (mono float32 numpy, sr). If `sample_rate` is given and the
    source rate differs, the caller is expected to resample on device; this
    only asks ffmpeg for the rate when ffmpeg is doing the decode anyway."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".opus" and shutil.which("opusdec"):
        x, sr = _decode_opusdec(path, sample_rate or 48000)
    elif suffix in (".wav", ".wave"):
        x, sr = _decode_wav(path)
    elif shutil.which("ffmpeg"):
        x, sr = _decode_ffmpeg(path, sample_rate)
    else:
        raise ValueError(
            f"cannot decode {path}: not a WAV file and no ffmpeg/opusdec on PATH"
        )
    mono = x.mean(axis=0) if x.shape[0] > 1 else x[0]
    return np.ascontiguousarray(mono, dtype=np.float32), sr


def _try_load_wav_pcm16(path: Path, want_sr: int):
    """Fast path: a mono 16-bit PCM WAV already at `want_sr` is returned as
    raw int16 (no scaling) — device code converts with the identical /32768
    while the upload moves half the bytes. Returns None when inapplicable."""
    try:
        raw = path.read_bytes()
        if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return None
        pos, fmt, fmt_body, data = 12, None, b"", None
        while pos + 8 <= len(raw):
            cid = raw[pos : pos + 4]
            (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
            body = raw[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
                fmt_body = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
        if fmt is None or data is None:
            return None
        audio_format, channels, sample_rate, _, _, bits = fmt
        if audio_format == 0xFFFE and len(fmt_body) >= 26:
            (audio_format,) = struct.unpack("<H", fmt_body[24:26])
        if audio_format == 1 and channels == 1 and bits == 16 and sample_rate == want_sr:
            return data_np(data, "<i2").copy()
    except Exception:
        return None
    return None


def load_recording(file, resample=48000, prefer_int16=False):
    """Reference load_recording contract (src/identify_tracks.py:49-62):
    decode, then resample to `resample` Hz. Resampling runs on device via
    ops.resample. Decode failures raise a fresh exception (the reference
    found that propagating the original hangs its docker host).

    With `prefer_int16`, a mono 16-bit PCM WAV already at the target rate is
    returned as int16 (the classify/detect device programs accept it and
    convert on device) — halves the host->device upload, the dominant
    single-recording latency cost over the tunnel."""
    if prefer_int16 and resample is not None and Path(file).suffix.lower() in (".wav", ".wave"):
        pcm16 = _try_load_wav_pcm16(Path(file), int(resample))
        if pcm16 is not None:
            return pcm16, int(resample)
    try:
        frames, sr = load_audio_mono(file)
    except Exception:
        logging.error("Could not load %s", file, exc_info=True)
        raise Exception(f"Could not load {file}")
    if resample is not None and int(sr) != int(resample):
        from audio_analysis_tpu.ops.resample import resample as dev_resample

        frames = np.asarray(dev_resample(frames, int(sr), int(resample)))
        sr = int(resample)
    return frames, sr


def rms(x: np.ndarray) -> float:
    """Root-mean-square (reference: src/common.py:65-67)."""
    x = np.asarray(x)
    return float(np.sqrt(x.dot(x) / x.size))


def bytesio_from_audio(sample_rate, source_left, source_right=None):
    """In-memory 16-bit WAV (reference: src/common.py:99-120)."""
    import io
    import wave

    bio = io.BytesIO()
    w = wave.open(bio, "wb")
    w.setsampwidth(2)
    w.setframerate(sample_rate)
    if source_right is None:
        w.setnchannels(1)
        source = np.asarray(source_left)
    else:
        w.setnchannels(2)
        source = np.stack((source_left, source_right), axis=1)
    data = np.clip(32768 * source, -32768, 32767).astype("<h")
    w.writeframesraw(data.tobytes())
    w.close()
    bio.seek(0)
    return bio


def write_audio_to_file(file_name, sample_rate, source_left, source_right=None):
    """Write mp3/ogg/opus via ffmpeg/opusenc when available, else raw WAV
    (reference: src/common.py:131-161). Encoded formats require the
    corresponding binary on PATH."""
    file_name = str(file_name)
    if file_name.endswith(".ogg") and source_right is None:
        source_right = source_left  # ffmpeg vorbis is stereo-only
    bio = bytesio_from_audio(sample_rate, source_left, source_right)

    command = None
    if file_name.endswith(".mp3"):
        command = ["ffmpeg", "-y", "-i", "-", "-c:a", "libmp3lame", file_name]
    elif file_name.endswith(".ogg"):
        command = ["ffmpeg", "-y", "-i", "-", "-c:a", "vorbis", "-strict", "-2", file_name]
    elif file_name.endswith(".opus"):
        command = ["opusenc", "-", file_name]

    if command:
        binary = command[0]
        if not shutil.which(binary):
            raise ValueError(
                f"writing {file_name} needs {binary}, which is not on PATH"
            )
        p = subprocess.Popen(
            command,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        p.communicate(input=bio.read())
    else:
        with open(file_name, "wb") as f:
            f.write(bio.read())


def write_wav(path, data: np.ndarray, sample_rate: int):
    """Write mono/stereo float32 [-1,1] as 16-bit PCM WAV (native, no deps).
    Mirrors the writer side of reference src/common.py:99-120."""
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    pcm = np.clip(data * 32768.0, -32768, 32767).astype("<i2")
    channels = pcm.shape[1]
    byte_rate = sample_rate * channels * 2
    blob = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(blob)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
    hdr += b"data" + struct.pack("<I", len(blob))
    Path(path).write_bytes(hdr + blob)
