"""Pure-Python multimodal decoder edge cases (no Spark needed).

The happy path is oracle-checked end-to-end by mm_decode_image_ppm /
mm_decode_audio_wav; these pin the parser branches the synthesized
payloads never hit: PPM comment lines and multi-whitespace headers,
truncation detection, WAV chunk walking past unknown chunks, and
word-alignment padding of odd-length chunks.
"""

from __future__ import annotations

import struct

import pytest

from datapipelines_python_spark.operators.llm_training import (
    decode_audio,
    decode_image,
)


def ppm(w: int, h: int, body: bytes, header: bytes | None = None) -> bytes:
    return (header if header is not None else f"P6\n{w} {h}\n255\n".encode()) + body


def test_ppm_basic_sums():
    body = bytes(range(12))  # 2x2 RGB
    d = decode_image(ppm(2, 2, body))
    assert (d["width"], d["height"], d["n_pixels"]) == (2, 2, 4)
    assert d["sum_r"] == 0 + 3 + 6 + 9
    assert d["sum_g"] == 1 + 4 + 7 + 10
    assert d["sum_b"] == 2 + 5 + 8 + 11


def test_ppm_comments_and_whitespace_in_header():
    header = b"P6\n# a comment line\n 2\t1 # trailing\n255\n"
    d = decode_image(ppm(2, 1, bytes(6), header=header))
    assert (d["width"], d["height"], d["maxval"]) == (2, 1, 255)


def test_ppm_truncated_plane_raises():
    with pytest.raises(ValueError, match="truncated"):
        decode_image(ppm(2, 2, bytes(11)))  # needs 12


def wav(samples: list[int], extra_chunk: bytes = b"", sr: int = 8000) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    chunks = fmt + extra_chunk + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_basic_stats():
    d = decode_audio(wav([100, -200, 300]))
    assert d["n_samples"] == 3
    assert d["sum_abs"] == 600
    assert d["peak"] == 300
    assert d["duration_us"] == 3 * 1_000_000 // 8000


def test_wav_skips_unknown_chunks_with_odd_length_padding():
    # a 3-byte LIST chunk must be skipped with word-alignment padding
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    d = decode_audio(wav([7, -7], extra_chunk=extra))
    assert d["n_samples"] == 2 and d["sum_abs"] == 14


def test_wav_rejects_non_riff_and_non_pcm():
    with pytest.raises(ValueError, match="RIFF"):
        decode_audio(b"OggS" + bytes(40))
    # 8-bit fmt chunk -> unsupported encoding
    data = b"data" + struct.pack("<I", 0)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    payload = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
    with pytest.raises(ValueError, match="unsupported"):
        decode_audio(payload)
