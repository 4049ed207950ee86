"""MPEG-1 Layer III (MP3) frame-header parser — container census
WITHOUT sample decode.

Full MP3 sample decode (Huffman tables, requantization, IMDCT, synthesis
filterbank) is out of scope in this codec-library-free environment and
stays an honest ``NotImplementedError``. But a corpus census does not
need samples: duration, bitrate profile, sample rate and channel mode
all live in the 4-byte frame headers, which walk in constant space.
This is what a 100 TB audio sweep actually runs first — filter/bucket by
duration and bitrate BEFORE paying any decode.

Scope: MPEG-1 Layer III frames (the overwhelming majority of real
".mp3" files). ID3v2 prefix tags are skipped (syncsafe length); ID3v1
trailers and trailing garbage are tolerated (frame walk stops at the
first non-sync position past the last whole frame). MPEG-2/2.5 and
other layers raise ValueError — a mislabeled stream surfaces as a
degrade, not a silent misparse.

Frame arithmetic (public ISO/IEC 11172-3 layout):

    frame_bytes = 144 * bitrate / sample_rate + padding
    samples_per_frame = 1152

Public spec: ISO/IEC 11172-3; the bitrate/sample-rate index tables are
reproduced in every public description of the format.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbit/s), index 1..14; 0 = free, 15 = bad
_BITRATES = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None,
]
_RATES = [44100, 48000, 32000, None]
SAMPLES_PER_FRAME = 1152


def _skip_id3v2(payload: bytes) -> int:
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            return 0  # not syncsafe: treat as no tag
        size = (size << 7) | b
    return 10 + size


def parse_mp3(payload: bytes) -> dict:
    """MP3 bytes -> header census:

    ``{"n_frames", "sample_rate", "channels", "duration_s",
    "avg_bitrate_kbps", "total_frame_bytes"}``

    Raises ValueError when no valid MPEG-1 Layer III frame starts the
    stream (after any ID3v2 tag)."""
    pos = _skip_id3v2(bytes(payload))
    data = bytes(payload)
    n_frames = 0
    bitrate_sum = 0
    total_bytes = 0
    rate = None
    channels = None
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break  # lost sync: trailing tag/garbage
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0b11 or layer != 0b01:
            if n_frames == 0:
                raise ValueError(
                    "only MPEG-1 Layer III parses here (version/layer "
                    f"bits {version:02b}/{layer:02b})"
                )
            break
        brx = (h >> 12) & 0xF
        srx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if _BITRATES[brx] is None or _RATES[srx] is None:
            if n_frames == 0:
                raise ValueError("free/bad bitrate or reserved sample rate")
            break
        frame_rate = _RATES[srx]
        if rate is None:
            rate = frame_rate
            channels = 1 if mode == 0b11 else 2
        elif frame_rate != rate:
            break  # rate change mid-stream: stop at the consistent prefix
        size = (144 * _BITRATES[brx] * 1000) // frame_rate + padding
        if pos + size > len(data):
            break  # truncated tail frame
        n_frames += 1
        bitrate_sum += _BITRATES[brx]
        total_bytes += size
        pos += size
    if n_frames == 0:
        raise ValueError("no MPEG-1 Layer III frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "duration_s": n_frames * SAMPLES_PER_FRAME / rate,
        "avg_bitrate_kbps": bitrate_sum / n_frames,
        "total_frame_bytes": total_bytes,
    }


def encode_mp3_frames(
    frame_bitrates_kbps: list[int],
    sample_rate: int = 44100,
    channels: int = 2,
    id3_bytes: int = 0,
) -> bytes:
    """Deterministic MP3 test-vector generator: a syntactically valid
    MPEG-1 Layer III frame sequence (headers + zero side-info/payload
    bytes — enough for every header-census path; sample decode is out of
    scope by design). Optional ID3v2 prefix of ``id3_bytes`` zeros."""
    try:
        srx = _RATES.index(sample_rate)
    except ValueError:
        raise ValueError(f"MPEG-1 sample rate must be one of {_RATES[:3]}")
    out = bytearray()
    if id3_bytes:
        body = bytes(id3_bytes)
        size = id3_bytes
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x03\x00\x00" + ss + body
    mode = 0b11 if channels == 1 else 0b00
    for kbps in frame_bitrates_kbps:
        brx = _BITRATES.index(kbps)
        h = (
            (0x7FF << 21)
            | (0b11 << 19)  # MPEG-1
            | (0b01 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (brx << 12)
            | (srx << 10)
            | (0 << 9)  # no padding
            | (mode << 6)
        )
        size = (144 * kbps * 1000) // sample_rate
        out += h.to_bytes(4, "big") + bytes(size - 4)
    return bytes(out)
