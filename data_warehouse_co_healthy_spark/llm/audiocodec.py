"""Vendored pure-Python WAV codec: RIFF/WAVE with 16-bit PCM — the
audio counterpart of ``llm.imagecodec`` (same posture: a public,
simple-enough spec implemented exactly rather than stubbed). ``decode_wav``
walks the RIFF chunk list for real (chunk ids + sizes + word alignment,
``fmt `` before ``data``), validates the PCM format words, and returns
the samples as an int16 numpy array plus the sample rate; ``encode_wav``
writes the same layout. Scope is loudly checked: format tag 1 (integer
PCM), 16-bit, mono or interleaved stereo. Compressed formats
(IEEE-float, ADPCM, MP3-in-WAV) raise ValueError naming the tag.

Everything here runs executor-side inside Arrow-batched pandas
functions (see ``multimodal.wav_energy_windows``); payloads never
route through the driver.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """Encode an int16 sample array (1-D mono, or (n, 2) stereo
    interleaved on write) as a canonical 44-byte-header RIFF/WAVE
    PCM16 file."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] == 2:
        channels = 2
    else:
        raise ValueError(
            f"expected 1-D mono or (n, 2) stereo samples, got "
            f"{samples.shape}"
        )
    data = samples.tobytes()
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    out = bytearray()
    out += b"RIFF"
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return bytes(out)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM16 payload: returns (samples, rate) —
    samples int16, shape (n,) for mono or (n, 2) for stereo. The
    chunk walk is real (unknown chunks like LIST/fact are skipped
    with word alignment); non-PCM16 profiles raise loudly."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
            if fmt is not None:
                break
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(
            f"unsupported WAV format tag {tag} (integer PCM only — "
            "IEEE-float/ADPCM/compressed need a codec library)"
        )
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (16 only)")
    if channels not in (1, 2):
        raise ValueError(f"unsupported WAV channel count {channels}")
    samples = np.frombuffer(
        raw, dtype="<i2", count=len(raw) // 2
    ).astype(np.int16)
    if channels == 2:
        samples = samples[: len(samples) // 2 * 2].reshape(-1, 2)
    return samples, rate
