"""Subprocess decode contract tests (reference src/common.py:70-96) using
stub ffmpeg/opusdec/ffprobe binaries on PATH — no real codecs exist in this
image, so the stubs pin the command lines, payload handling, stereo-mean
semantics, and the fresh-exception failure rule without them."""

import os
import stat
import struct
import sys
from pathlib import Path

import numpy as np
import pytest

from audio_analysis_tpu.io.audio import load_audio_mono, load_recording


def _make_stub(bin_dir: Path, name: str, body: str) -> Path:
    """Create an executable python stub named `name` in bin_dir."""
    p = bin_dir / name
    p.write_text(f"#!{sys.executable}\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return p


FFMPEG_BODY = """
import os, struct, sys
with open(os.environ["AAT_TEST_ARGLOG"], "w") as f:
    f.write("\\0".join(sys.argv))
if any("bad" in a for a in sys.argv):
    sys.stderr.write("decode exploded")
    sys.exit(1)
# 8 known float32 samples, little-endian f32le on stdout
data = b"".join(struct.pack("<f", (i - 3) / 4.0) for i in range(8))
sys.stdout.buffer.write(data)
"""

OPUSDEC_BODY = """
import os, struct, sys
with open(os.environ["AAT_TEST_ARGLOG"], "w") as f:
    f.write("\\0".join(sys.argv))
# interleaved stereo [L0 R0 L1 R1 ...]: L = i, R = i + 1
data = b"".join(
    struct.pack("<f", float(v))
    for i in range(4)
    for v in (i, i + 1)
)
sys.stdout.buffer.write(data)
"""

FFPROBE_BODY = """
import sys
sys.stdout.write("32000\\n")
"""


@pytest.fixture
def stub_bins(tmp_path, monkeypatch):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    _make_stub(bin_dir, "ffmpeg", FFMPEG_BODY)
    _make_stub(bin_dir, "opusdec", OPUSDEC_BODY)
    _make_stub(bin_dir, "ffprobe", FFPROBE_BODY)
    arglog = tmp_path / "args.txt"
    monkeypatch.setenv("PATH", f"{bin_dir}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("AAT_TEST_ARGLOG", str(arglog))
    return arglog


def _logged_args(arglog: Path):
    return arglog.read_text().split("\0")


def test_ffmpeg_command_line_and_payload(stub_bins, tmp_path):
    """Non-WAV decode shells to ffmpeg with the reference's exact flags
    (src/common.py:76-79: -i FILE -ar SR -f f32le -c:a pcm_f32le -ac 1 -)
    and returns the f32le stdout as mono float32."""
    src = tmp_path / "rec.mp3"
    src.write_bytes(b"not really mp3")
    mono, sr = load_audio_mono(src, sample_rate=48000)
    args = _logged_args(stub_bins)
    assert args[1:] == [
        "-i", str(src), "-ar", "48000", "-f", "f32le", "-c:a", "pcm_f32le",
        "-ac", "1", "-",
    ]
    np.testing.assert_array_equal(mono, (np.arange(8, dtype=np.float32) - 3) / 4.0)
    assert mono.dtype == np.float32
    assert sr == 48000


def test_ffmpeg_probes_rate_when_unspecified(stub_bins, tmp_path):
    """Without a requested rate the command carries no -ar and the source
    rate comes from ffprobe."""
    src = tmp_path / "rec.flac"
    src.write_bytes(b"x")
    mono, sr = load_audio_mono(src)
    args = _logged_args(stub_bins)
    assert "-ar" not in args
    assert sr == 32000  # ffprobe stub's answer
    assert len(mono) == 8


def test_opusdec_stereo_mean(stub_bins, tmp_path):
    """.opus decodes via opusdec --float --quiet --rate SR --force-stereo
    (src/common.py:81-86) and the stereo channels are MEANED
    (src/common.py:92-95)."""
    src = tmp_path / "rec.opus"
    src.write_bytes(b"x")
    mono, sr = load_audio_mono(src, sample_rate=48000)
    args = _logged_args(stub_bins)
    assert args[1:] == [
        "--float", "--quiet", "--rate", "48000", "--force-stereo", str(src), "-",
    ]
    # stub emits L=i, R=i+1 -> mean is i + 0.5
    np.testing.assert_array_equal(mono, np.arange(4, dtype=np.float32) + 0.5)
    assert sr == 48000


def test_decode_failure_raises_fresh_exception(stub_bins, tmp_path):
    """A decode failure surfaces as a FRESH exception (the reference found
    that propagating the original hangs its docker host,
    src/identify_tracks.py:59-62)."""
    src = tmp_path / "bad.mp3"
    src.write_bytes(b"x")
    with pytest.raises(Exception) as exc_info:
        load_recording(src, resample=48000)
    assert type(exc_info.value) is Exception
    assert f"Could not load {src}" in str(exc_info.value)
    # the stub's stderr never rides along in the fresh exception
    assert "decode exploded" not in str(exc_info.value)


def test_load_recording_device_resamples_ffmpeg_payload(stub_bins, tmp_path):
    """load_recording decodes at native rate (ffprobe) then resamples on
    device to the target — the fresh-exception wrapper must not swallow a
    successful decode."""
    src = tmp_path / "rec.m4a"
    src.write_bytes(b"x")
    frames, sr = load_recording(src, resample=16000)
    assert sr == 16000
    # 8 samples at 32 kHz -> 4 at 16 kHz
    assert len(frames) == 4
    assert frames.dtype == np.float32
