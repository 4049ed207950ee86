"""MPEG-1 audio (ISO/IEC 11172-3): Layer III header census + Layer I/II
bit-exact subband sample decode.

- ``parse_mp3``: Layer III (the common ".mp3") container census —
  duration/bitrate/rate/mode from the 4-byte frame headers in constant
  space (what a 100 TB audio sweep runs first).
- ``decode_mp3_layer3_sideinfo``: bit-exact Layer III SIDE-INFORMATION
  decode (§2.4.1.7 grammar + §2.4.2.7 scalefactor bit budgets, incl.
  the bit reservoir pointer and scfsi reuse). The spectral samples
  need the tabulated Huffman tables (B.7) and scalefactor bands (B.8)
  and stay an honest ``NotImplementedError``
  (``decode_mp3_layer3_samples`` names them).
- ``decode_mp3_layer2`` / ``decode_mp3_layer1``: FULL sample decode to
  the 32-subband domain for the subband-only layers — closed-form
  requantization, every bit of the frame layout parsed. PCM synthesis
  (the tabulated 512-tap window) is the remaining documented raise.

ID3v2 prefix tags are skipped (syncsafe length); ID3v1 trailers and
trailing garbage are tolerated (the frame walk stops at the first
non-sync position past the last whole frame). MPEG-2/2.5 and
cross-layer streams raise ValueError — a mislabeled stream surfaces as
a degrade, not a silent misparse.

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


# ------------------------------------------------- Layer II subband decode
#
# MPEG-1 Layer II (ISO/IEC 11172-3 §2.4.1.6, §2.4.3.3) IS decodable here:
# unlike Layer III there is no Huffman coding and no IMDCT hybrid — a
# frame is a fixed bit layout (allocation, scfsi, scalefactors, grouped /
# ungrouped codes) plus closed-form requantization:
#
#     s''' = code * 2^(1-nb) - 1          (two's-complement fraction)
#     s''  = C * (s''' + D)               (table B.4: C = 2^nb/n)
#     s'   = scalefactor * s''            (B.1: sf = 2^(1 - idx/3))
#
# which this module decodes BIT-EXACTLY to the 32-subband sample domain.
# The final polyphase synthesis to PCM needs the 512-coefficient
# tabulated prototype window (table B.3 / annex C) — a constant table
# with no closed form that cannot be responsibly reproduced from memory,
# so PCM synthesis raises NotImplementedError (the repo's honest-boundary
# contract; same class as JPEG arithmetic coding). Subband-domain energy
# is still the census signal: the filterbank is near-orthonormal, so
# subband RMS tracks time-domain RMS.
#
# Scope: 44.1 kHz mono with bit-allocation table B.2a (sblimit 27) — the
# standard-bitrate mode. Other rates/modes/tables raise ValueError.

_B2A_STEPS = (
    # (first_subband, last_subband, nbal, quant step sizes by alloc-1)
    (0, 2, 4, (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
               16383, 32767, 65535)),
    (3, 10, 4, (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                8191, 65535)),
    (11, 22, 3, (3, 5, 7, 9, 15, 31, 65535)),
    (23, 26, 2, (3, 5, 65535)),
)
SBLIMIT_B2A = 27

# Every B.2a row carries exactly 2^nbal - 1 quant classes (alloc index 0
# means "no allocation"), so every nbal-bit allocation index is valid by
# construction — a malformed row would silently mis-size later fields
# (e.g. reading 6 bits where 16 were written desyncs the whole frame).
for _lo, _hi, _nbal, _steps in _B2A_STEPS:
    if len(_steps) != (1 << _nbal) - 1:
        raise AssertionError(
            f"B.2a row sb {_lo}-{_hi}: {len(_steps)} classes != 2^{_nbal}-1"
        )
del _lo, _hi, _nbal, _steps

# nlevels -> (nb fraction bits, grouped?, stored bits per sample-or-triplet)
_QCLASS = {
    3: (2, True, 5), 5: (3, True, 7), 7: (3, False, 3), 9: (4, True, 10),
    15: (4, False, 4), 31: (5, False, 5), 63: (6, False, 6),
    127: (7, False, 7), 255: (8, False, 8), 511: (9, False, 9),
    1023: (10, False, 10), 2047: (11, False, 11), 4095: (12, False, 12),
    8191: (13, False, 13), 16383: (14, False, 14), 32767: (15, False, 15),
    65535: (16, False, 16),
}


def _b2a_row(sb: int) -> tuple[int, tuple[int, ...]]:
    for lo, hi, nbal, steps in _B2A_STEPS:
        if lo <= sb <= hi:
            return nbal, steps
    raise ValueError(f"subband {sb} beyond sblimit {SBLIMIT_B2A}")


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("bitstream truncated")
        v = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _sf_parts(scfsi: int, sfs: list[int]) -> tuple[int, int, int]:
    """Transmitted scalefactor indices -> the (part0, part1, part2)
    triple per scfsi (§2.4.3.3.2): 0 = three transmitted, 1 = first
    covers parts 0+1, 2 = one covers all, 3 = second covers parts 1+2."""
    if scfsi == 0:
        return sfs[0], sfs[1], sfs[2]
    if scfsi == 1:
        return sfs[0], sfs[0], sfs[1]
    if scfsi == 2:
        return sfs[0], sfs[0], sfs[0]
    return sfs[0], sfs[1], sfs[1]


def _sf_count(scfsi: int) -> int:
    return {0: 3, 1: 2, 2: 1, 3: 2}[scfsi]


def decode_mp3_layer2(payload: bytes) -> dict:
    """MPEG-1 Layer II bytes -> bit-exact subband-domain decode:

    ``{"n_frames", "sample_rate", "channels", "n_active_subbands",
    "n_samples", "subband_rms"}``

    where ``n_samples`` counts decoded subband samples (36 per active
    (channel, subband) per frame) and ``subband_rms`` is the RMS of the
    requantized, rescaled s' values across all frames and channels.
    44.1 kHz table-B.2a streams in mono, (non-joint) stereo or
    dual-channel mode; joint (intensity/MS) stereo and per-channel
    bitrates outside 56..192 kbps (the B.2b/c/d table range) raise —
    documented boundaries, like PCM synthesis (see module header)."""
    data = bytes(payload)
    pos = _skip_id3v2(data)
    n_frames = 0
    n_active_total = 0
    sum_sq = 0.0
    n_samples = 0
    rate = None
    channels = None
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0b11 or layer != 0b10:  # MPEG-1 Layer II
            if n_frames == 0:
                raise ValueError(
                    "only MPEG-1 Layer II decodes here (version/layer "
                    f"bits {version:02b}/{layer:02b})"
                )
            break
        protection = (h >> 16) & 0x1
        brx = (h >> 12) & 0xF
        srx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        kbps = _BITRATES_L2[brx]
        if kbps is None or _RATES[srx] is None:
            raise ValueError("free/bad bitrate or reserved sample rate")
        if mode == 0b01:
            # Layer II joint stereo IS intensity stereo (§2.4.1.6):
            # subbands >= bound share ONE set of samples, scaled by
            # each channel's own scalefactor
            ext = (h >> 4) & 0x3
            bound = 4 + 4 * ext
        else:
            bound = SBLIMIT_B2A
        nch = 1 if mode == 0b11 else 2
        if _RATES[srx] != 44100:
            raise ValueError("only 44.1 kHz table-B.2a streams decode")
        if not 56 <= kbps // nch <= 192:
            raise ValueError(
                f"{kbps} kbps / {nch} ch is outside the B.2a range "
                "(56..192 kbps per channel; other rates select the "
                "B.2b/c/d tables — a documented raise)"
            )
        rate = _RATES[srx]
        size = (144 * kbps * 1000) // rate + padding
        if pos + size > len(data):
            break  # truncated tail frame
        br = _BitReader(data[pos : pos + size], 32 + (0 if protection else 16))
        # §2.4.1.6 non-joint layout: every per-subband field iterates
        # channels INSIDE the subband loop
        alloc = {}
        for sb in range(SBLIMIT_B2A):
            nbal, steps = _b2a_row(sb)
            for ch in range(nch if sb < bound else 1):
                # every nbal-bit index is valid: len(steps) == 2^nbal - 1
                # (asserted at table definition), so no range check here
                idx = br.read(nbal)
                alloc[ch, sb] = steps[idx - 1] if idx else 0
            if nch == 2 and sb >= bound:
                alloc[1, sb] = alloc[0, sb]  # intensity: shared level
        scfsi = {}
        for sb in range(SBLIMIT_B2A):
            for ch in range(nch):
                if alloc[ch, sb]:
                    scfsi[ch, sb] = br.read(2)
        sf = {}
        for sb in range(SBLIMIT_B2A):
            for ch in range(nch):
                if alloc[ch, sb]:
                    sfs = [
                        br.read(6)
                        for _ in range(_sf_count(scfsi[ch, sb]))
                    ]
                    sf[ch, sb] = _sf_parts(scfsi[ch, sb], sfs)
        for gr in range(12):
            part = gr // 4
            for sb in range(SBLIMIT_B2A):
                shared = nch == 2 and sb >= bound
                for ch in range(1 if shared else nch):
                    n = alloc[ch, sb]
                    if not n:
                        continue
                    nb, grouped, bits = _QCLASS[n]
                    if grouped:
                        c = br.read(bits)
                        codes = (c % n, (c // n) % n, (c // (n * n)) % n)
                    else:
                        codes = tuple(br.read(bits) for _ in range(3))
                    # B.4 constants in closed form: C = 2^nb / n, and
                    # D = 1 - (n-1)*2^(-nb) — the offset that makes the
                    # n-level quantizer symmetric (0.5 for grouped
                    # 3/5/9, 2^(1-nb) for the 2^k-1 ungrouped classes)
                    c_const = float(1 << nb) / n
                    d_const = 1.0 - (n - 1) * 2.0 ** (-nb)
                    # intensity subbands requantize the SAME codes once
                    # per channel with that channel's own scalefactor
                    for tch in (0, 1) if shared else (ch,):
                        factor = 2.0 ** (1.0 - sf[tch, sb][part] / 3.0)
                        for code in codes:
                            if code >= n:
                                raise ValueError(
                                    f"code {code} >= {n} levels"
                                )
                            s3 = code * 2.0 ** (1 - nb) - 1.0
                            sp = factor * c_const * (s3 + d_const)
                            sum_sq += sp * sp
                            n_samples += 1
        channels = nch
        n_active_total += sum(1 for a in alloc.values() if a)
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise ValueError("no MPEG-1 Layer II frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "n_active_subbands": n_active_total,
        "n_samples": n_samples,
        "subband_rms": (sum_sq / n_samples) ** 0.5 if n_samples else 0.0,
    }


def synthesize_mp3_pcm(payload: bytes):
    """Polyphase synthesis to PCM needs the 512-coefficient prototype
    window (ISO 11172-3 table B.3) — tabulated, no closed form, not
    reproducible from memory without risking silent wrongness."""
    raise NotImplementedError(
        "Layer II PCM synthesis requires the tabulated 512-tap window "
        "(ISO 11172-3 B.3); decode_mp3_layer2 provides the bit-exact "
        "subband domain instead"
    )


# Layer II bitrate table differs from Layer III (index 1..14)
_BITRATES_L2 = [
    None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
    None,
]


def encode_mp3_layer2(
    frames: list[dict],
    kbps: int = 192,
    channels: int = 1,
    joint_bound: int | None = None,
) -> bytes:
    """Deterministic Layer II test-vector encoder (the FLAC-style
    closed-form differential: every bit this writes, decode_mp3_layer2
    must read back into the exact same s' values). Each frame dict:

    ``{"alloc": {key: alloc_index}, "scfsi": {key: 0..3},
      "sf": {key: [transmitted 6-bit indices]},
      "codes": {key: [12 granules x (grouped combined code | 3 codes)]}}``

    where ``key`` is the subband id for mono frames and a ``(ch, sb)``
    tuple for ``channels=2`` (non-joint stereo, header mode 00).

    ``joint_bound`` (4/8/12/16, channels=2 only) writes INTENSITY
    stereo (header mode 01): subbands >= bound carry ONE allocation and
    ONE set of sample codes — keyed ``(0, sb)`` in the frame dict —
    while scfsi/scalefactors stay per channel.

    44.1 kHz, table B.2a, no CRC, no padding. Raises ValueError if the
    payload overflows the frame size for ``kbps``."""
    try:
        brx = _BITRATES_L2.index(kbps)
    except ValueError:
        raise ValueError(f"kbps must be one of {_BITRATES_L2[1:15]}")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if joint_bound is not None:
        if channels != 2:
            raise ValueError("joint_bound requires channels=2")
        if joint_bound not in (4, 8, 12, 16):
            raise ValueError(f"joint_bound must be 4/8/12/16, got {joint_bound}")
    bound = SBLIMIT_B2A if joint_bound is None else joint_bound
    size = (144 * kbps * 1000) // 44100
    out = bytearray()
    for fr in frames:
        h = (
            (0x7FF << 21)
            | (0b11 << 19)   # MPEG-1
            | (0b10 << 17)   # Layer II
            | (1 << 16)      # no CRC
            | (brx << 12)
            | (0 << 10)      # 44.1 kHz
            | (0 << 9)       # no padding
            | (
                (
                    0b11
                    if channels == 1
                    else (0b00 if joint_bound is None else 0b01)
                )
                << 6
            )
            | ((0 if joint_bound is None else (joint_bound - 4) // 4) << 4)
        )

        def key(ch: int, sb: int):
            return sb if channels == 1 else (ch, sb)

        bw = _BitWriter()
        alloc_levels = {}
        for sb in range(SBLIMIT_B2A):
            nbal, steps = _b2a_row(sb)
            for ch in range(channels if sb < bound else 1):
                idx = fr["alloc"].get(key(ch, sb), 0)
                if not 0 <= idx <= len(steps):
                    raise ValueError(
                        f"alloc index {idx} out of range for sb {sb}"
                    )
                bw.write(idx, nbal)
                if idx:
                    alloc_levels[ch, sb] = steps[idx - 1]
            if channels == 2 and sb >= bound and (0, sb) in alloc_levels:
                alloc_levels[1, sb] = alloc_levels[0, sb]
        for sb in range(SBLIMIT_B2A):
            for ch in range(channels):
                if (ch, sb) in alloc_levels:
                    bw.write(fr["scfsi"][key(ch, sb)], 2)
        for sb in range(SBLIMIT_B2A):
            for ch in range(channels):
                if (ch, sb) not in alloc_levels:
                    continue
                sfs = fr["sf"][key(ch, sb)]
                if len(sfs) != _sf_count(fr["scfsi"][key(ch, sb)]):
                    raise ValueError(f"sb {sb}: wrong scalefactor count")
                for s in sfs:
                    if not 0 <= s <= 62:
                        raise ValueError(
                            f"scalefactor index {s} out of range"
                        )
                    bw.write(s, 6)
        for gr in range(12):
            for sb in range(SBLIMIT_B2A):
                for ch in range(channels if sb < bound else 1):
                    if (ch, sb) not in alloc_levels:
                        continue
                    n = alloc_levels[ch, sb]
                    nb, grouped, bits = _QCLASS[n]
                    entry = fr["codes"][key(ch, sb)][gr]
                    if grouped:
                        if not 0 <= entry < n * n * n:
                            raise ValueError("grouped code out of range")
                        bw.write(entry, bits)
                    else:
                        for code in entry:
                            if not 0 <= code < n:
                                raise ValueError("code out of range")
                            bw.write(code, bits)
        body = bw.tobytes()
        if 4 + len(body) > size:
            raise ValueError(
                f"frame payload {4 + len(body)}B exceeds {size}B at {kbps} kbps"
            )
        out += h.to_bytes(4, "big") + body + bytes(size - 4 - len(body))
    return bytes(out)


# -------------------------------------------------- Layer I subband decode
#
# MPEG-1 Layer I (ISO/IEC 11172-3 §2.4.1.5, §2.4.3.2) is the simpler
# sibling: 384 samples per frame (12 per subband x 32 subbands), one
# 4-bit allocation per subband (alloc a in 1..14 -> nb = a + 1 fraction
# bits, levels n = 2^nb - 1; a = 15 is forbidden), ONE 6-bit scalefactor
# per active subband (no scfsi), no grouping — the same closed-form
# requantization family as Layer II. Slot size is 4 bytes:
#
#     frame_bytes = (12 * bitrate / sample_rate) * 4 + padding * 4
#
# Same honest boundary as Layer II: decode stops at bit-exact subband
# samples; PCM synthesis needs the tabulated 512-tap window.

_BITRATES_L1 = [
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416,
    448, None,
]
SBLIMIT_L1 = 32


def decode_mp3_layer1(payload: bytes) -> dict:
    """MPEG-1 Layer I bytes -> bit-exact subband-domain decode (same
    output shape as :func:`decode_mp3_layer2`). 44.1 kHz mono, stereo
    (non-joint), dual-channel, AND joint (intensity) stereo — mode 0b01
    shares allocation/codes above the §2.4.1.5 bound, per-channel
    scalefactors below it."""
    data = bytes(payload)
    pos = _skip_id3v2(data)
    n_frames = 0
    n_active_total = 0
    sum_sq = 0.0
    n_samples = 0
    rate = None
    channels = None
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0b11 or layer != 0b11:  # MPEG-1 Layer I
            if n_frames == 0:
                raise ValueError(
                    "only MPEG-1 Layer I decodes here (version/layer "
                    f"bits {version:02b}/{layer:02b})"
                )
            break
        protection = (h >> 16) & 0x1
        brx = (h >> 12) & 0xF
        srx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        kbps = _BITRATES_L1[brx]
        if kbps is None or _RATES[srx] is None:
            raise ValueError("free/bad bitrate or reserved sample rate")
        if mode == 0b01:
            ext = (h >> 4) & 0x3
            bound = 4 + 4 * ext  # §2.4.1.5: intensity above the bound
        else:
            bound = SBLIMIT_L1
        nch = 1 if mode == 0b11 else 2
        if _RATES[srx] != 44100:
            raise ValueError("only 44.1 kHz streams decode")
        rate = _RATES[srx]
        size = ((12 * kbps * 1000) // rate + padding) * 4
        if pos + size > len(data):
            break
        br = _BitReader(data[pos : pos + size], 32 + (0 if protection else 16))
        alloc = {}
        for sb in range(SBLIMIT_L1):
            for ch in range(nch if sb < bound else 1):
                a = br.read(4)
                if a == 15:
                    raise ValueError("forbidden Layer I allocation 15")
                alloc[ch, sb] = a
            if nch == 2 and sb >= bound:
                alloc[1, sb] = alloc[0, sb]  # intensity: shared level
        sf = {}
        for sb in range(SBLIMIT_L1):
            for ch in range(nch):
                if alloc[ch, sb]:
                    sf[ch, sb] = br.read(6)
        for _gr in range(12):
            for sb in range(SBLIMIT_L1):
                shared = nch == 2 and sb >= bound
                for ch in range(1 if shared else nch):
                    a = alloc[ch, sb]
                    if not a:
                        continue
                    nb = a + 1
                    n = (1 << nb) - 1
                    code = br.read(nb)
                    if code >= n:
                        raise ValueError(f"code {code} >= {n} levels")
                    c_const = float(1 << nb) / n
                    d_const = 1.0 - (n - 1) * 2.0 ** (-nb)
                    s3 = code * 2.0 ** (1 - nb) - 1.0
                    for tch in (0, 1) if shared else (ch,):
                        factor = 2.0 ** (1.0 - sf[tch, sb] / 3.0)
                        sp = factor * c_const * (s3 + d_const)
                        sum_sq += sp * sp
                        n_samples += 1
        channels = nch
        n_active_total += sum(1 for a in alloc.values() if a)
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise ValueError("no MPEG-1 Layer I frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "n_active_subbands": n_active_total,
        "n_samples": n_samples,
        "subband_rms": (sum_sq / n_samples) ** 0.5 if n_samples else 0.0,
    }


def encode_mp3_layer1(
    frames: list[dict], kbps: int = 192, channels: int = 1,
    joint_bound: int | None = None,
) -> bytes:
    """Deterministic Layer I test-vector encoder. Each frame dict:
    ``{"alloc": {key: 1..14}, "sf": {key: 0..62},
      "codes": {key: [12 codes]}}`` where ``key`` is the subband id for
    mono and a ``(ch, sb)`` tuple for ``channels=2`` (non-joint stereo).
    ``joint_bound`` (4/8/12/16) writes intensity stereo: subbands >=
    bound carry one allocation + one code stream keyed ``(0, sb)`` with
    per-channel scalefactors. 44.1 kHz, no CRC/padding."""
    try:
        brx = _BITRATES_L1.index(kbps)
    except ValueError:
        raise ValueError(f"kbps must be one of {_BITRATES_L1[1:15]}")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if joint_bound is not None:
        if channels != 2:
            raise ValueError("joint_bound requires channels=2")
        if joint_bound not in (4, 8, 12, 16):
            raise ValueError(f"joint_bound must be 4/8/12/16, got {joint_bound}")
    bound = SBLIMIT_L1 if joint_bound is None else joint_bound
    size = ((12 * kbps * 1000) // 44100) * 4
    out = bytearray()
    for fr in frames:
        h = (
            (0x7FF << 21)
            | (0b11 << 19)   # MPEG-1
            | (0b11 << 17)   # Layer I
            | (1 << 16)      # no CRC
            | (brx << 12)
            | (0 << 10)      # 44.1 kHz
            | (0 << 9)       # no padding
            | (
                (
                    0b11
                    if channels == 1
                    else (0b00 if joint_bound is None else 0b01)
                )
                << 6
            )
            | ((0 if joint_bound is None else (joint_bound - 4) // 4) << 4)
        )

        def key(ch: int, sb: int):
            return sb if channels == 1 else (ch, sb)

        bw = _BitWriter()
        active = set()
        for sb in range(SBLIMIT_L1):
            for ch in range(channels if sb < bound else 1):
                a = fr["alloc"].get(key(ch, sb), 0)
                if not 0 <= a <= 14:
                    raise ValueError(f"alloc {a} out of range for sb {sb}")
                bw.write(a, 4)
                if a:
                    active.add((ch, sb))
            if channels == 2 and sb >= bound and (0, sb) in active:
                active.add((1, sb))  # intensity: both channels carry sf
        for sb in range(SBLIMIT_L1):
            for ch in range(channels):
                if (ch, sb) in active:
                    s = fr["sf"][key(ch, sb)]
                    if not 0 <= s <= 62:
                        raise ValueError(
                            f"scalefactor index {s} out of range"
                        )
                    bw.write(s, 6)
        for gr in range(12):
            for sb in range(SBLIMIT_L1):
                for ch in range(channels if sb < bound else 1):
                    a = fr["alloc"].get(key(ch, sb), 0)
                    if not a:
                        continue
                    nb = a + 1
                    n = (1 << nb) - 1
                    code = fr["codes"][key(ch, sb)][gr]
                    if not 0 <= code < n:
                        raise ValueError("code out of range")
                    bw.write(code, nb)
        body = bw.tobytes()
        if 4 + len(body) > size:
            raise ValueError(
                f"frame payload {4 + len(body)}B exceeds {size}B at {kbps} kbps"
            )
        out += h.to_bytes(4, "big") + body + bytes(size - 4 - len(body))
    return bytes(out)


# ------------------------------------------- Layer III side information
# What IS closed-form / pure bit-layout in MPEG-1 Layer III — and
# therefore decoded here, bit-exactly: the frame walk, the complete
# side-information grammar (ISO 11172-3 §2.4.1.7: the 9-bit
# main_data_begin bit-reservoir pointer, scfsi, and per granule per
# channel part2_3_length / big_values / global_gain / scalefac_compress
# / the window-switching tree with block_type, mixed_block_flag,
# table_select, subblock_gain / region counts / preflag /
# scalefac_scale / count1table_select), and the §2.4.2.7 slen mapping
# from scalefac_compress to the scalefactor bit budget (including the
# scfsi granule-1 reuse rule over the four long-block band groups).
#
# What is NOT closed-form: the spectral samples. Decoding them needs
# the 34 tabulated Huffman code tables (Table B.7: 32 big_values
# tables + count1 tables A and B) and the per-sample-rate scalefactor
# band partitions (Table B.8) — spec constants with no generating
# formula that cannot be responsibly reproduced from memory. Same
# honest boundary as the Layer I/II polyphase window (Table B.3) and
# the JPEG QM-coder: decode_mp3_layer3_samples raises, naming them.

_SLEN = [  # scalefac_compress -> (slen1, slen2), ISO 11172-3 §2.4.2.7
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]
# scfsi band b -> (n sfb under slen1, n sfb under slen2) for LONG
# blocks: bands 0-5 / 6-10 / 11-15 / 16-20 (slen1 covers sfb 0-10)
_SCFSI_GROUPS = ((6, 0), (5, 0), (0, 5), (0, 5))
_MAX_BIG_VALUES = 288  # big_values * 2 <= 576 spectral lines


def _scf_bits(
    gr: int, scfsi_bits: int, window_switching: int, block_type: int,
    mixed: int, slen1: int, slen2: int,
) -> int:
    """Scalefactor bits (part2 length) of one granule-channel —
    §2.4.2.7: short non-mixed 18/18 values, mixed 17/18, long 11/10
    with the scfsi groups reused (not retransmitted) in granule 1."""
    if window_switching and block_type == 2:
        if mixed:
            return 17 * slen1 + 18 * slen2
        return 18 * slen1 + 18 * slen2
    bits = 0
    for b, (n1, n2) in enumerate(_SCFSI_GROUPS):
        if gr == 1 and (scfsi_bits >> (3 - b)) & 1:
            continue  # granule 0's scalefactors are reused
        bits += n1 * slen1 + n2 * slen2
    return bits


def decode_mp3_layer3_sideinfo(payload: bytes) -> dict:
    """MPEG-1 Layer III bytes -> bit-exact SIDE-INFORMATION decode:

    ``{"n_frames", "sample_rate", "channels", "n_granules",
    "sum_part2_3", "sum_big_values", "sum_global_gain",
    "n_short_granules", "max_main_data_begin", "n_reservoir_frames",
    "sum_scf_bits", "granules"}``

    where granules is the per-(frame, granule, channel) raw field list
    (the roundtrip differential's hook) and sum_scf_bits is the
    §2.4.2.7 scalefactor bit budget summed over all granule-channels
    (what a full decoder uses to locate the Huffman region inside
    part2_3_length). Raises ValueError on non-Layer-III streams,
    big_values > 288, or the spec-forbidden (window_switching,
    block_type=0) combination. Spectral samples are NOT decoded — see
    :func:`decode_mp3_layer3_samples`."""
    data = bytes(payload)
    pos = _skip_id3v2(data)
    n_frames = 0
    rate = None
    channels = None
    sum_part23 = sum_bv = sum_gg = 0
    n_short = 0
    max_mdb = 0
    n_reservoir = 0
    sum_scf = 0
    granules: list[dict] = []
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0b11 or layer != 0b01:
            if n_frames == 0:
                raise ValueError(
                    "only MPEG-1 Layer III side info decodes here "
                    f"(version/layer bits {version:02b}/{layer:02b})"
                )
            break
        protection = (h >> 16) & 0x1
        brx = (h >> 12) & 0xF
        srx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if _BITRATES[brx] is None or _RATES[srx] is None:
            raise ValueError("free/bad bitrate or reserved sample rate")
        frame_rate = _RATES[srx]
        if rate is None:
            rate = frame_rate
            channels = 1 if mode == 0b11 else 2
        elif frame_rate != rate:
            break  # rate change mid-stream: consistent prefix only
        nch = 1 if mode == 0b11 else 2
        size = (144 * _BITRATES[brx] * 1000) // frame_rate + padding
        if pos + size > len(data):
            break  # truncated tail frame
        br = _BitReader(
            data[pos : pos + size], 32 + (0 if protection else 16)
        )
        mdb = br.read(9)
        br.read(5 if nch == 1 else 3)  # private_bits
        scfsi = [br.read(4) for _ in range(nch)]
        max_mdb = max(max_mdb, mdb)
        if mdb:
            n_reservoir += 1
        for gr in range(2):
            for ch in range(nch):
                g = {
                    "frame": n_frames, "gr": gr, "ch": ch,
                    "part2_3_length": br.read(12),
                    "big_values": br.read(9),
                    "global_gain": br.read(8),
                    "scalefac_compress": br.read(4),
                    "window_switching": br.read(1),
                }
                if g["big_values"] > _MAX_BIG_VALUES:
                    raise ValueError(
                        f"big_values {g['big_values']} > {_MAX_BIG_VALUES}"
                    )
                if g["window_switching"]:
                    g["block_type"] = br.read(2)
                    g["mixed_block"] = br.read(1)
                    g["table_select"] = [br.read(5) for _ in range(2)]
                    g["subblock_gain"] = [br.read(3) for _ in range(3)]
                    # region counts are NOT transmitted when window
                    # switching; their spec defaults partition the
                    # Huffman region, which this layer does not decode
                    g["region0_count"] = None
                    g["region1_count"] = None
                    if g["block_type"] == 0:
                        raise ValueError(
                            "block_type 0 with window_switching is "
                            "forbidden (ISO 11172-3 §2.4.1.7)"
                        )
                else:
                    g["block_type"] = 0
                    g["mixed_block"] = 0
                    g["table_select"] = [br.read(5) for _ in range(3)]
                    g["region0_count"] = br.read(4)
                    g["region1_count"] = br.read(3)
                g["preflag"] = br.read(1)
                g["scalefac_scale"] = br.read(1)
                g["count1table_select"] = br.read(1)
                slen1, slen2 = _SLEN[g["scalefac_compress"]]
                g["scf_bits"] = _scf_bits(
                    gr, scfsi[ch], g["window_switching"], g["block_type"],
                    g["mixed_block"], slen1, slen2,
                )
                sum_part23 += g["part2_3_length"]
                sum_bv += g["big_values"]
                sum_gg += g["global_gain"]
                sum_scf += g["scf_bits"]
                if g["window_switching"] and g["block_type"] == 2:
                    n_short += 1
                granules.append(g)
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise ValueError("no MPEG-1 Layer III frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "n_granules": len(granules),
        "sum_part2_3": sum_part23,
        "sum_big_values": sum_bv,
        "sum_global_gain": sum_gg,
        "n_short_granules": n_short,
        "max_main_data_begin": max_mdb,
        "n_reservoir_frames": n_reservoir,
        "sum_scf_bits": sum_scf,
        "granules": granules,
    }


def encode_mp3_layer3_sideinfo(
    frames: list[dict], kbps: int = 64, channels: int = 1
) -> bytes:
    """Deterministic Layer III side-info test-vector encoder (the
    closed-form differential's other half: every bit this writes,
    decode_mp3_layer3_sideinfo must read back). Each frame dict:

    ``{"main_data_begin": 0..511, "scfsi": [per-ch 4-bit int],
      "granules": [[per-ch granule dict] x 2]}``

    with granule fields part2_3_length, big_values, global_gain,
    scalefac_compress, window_switching, block_type, mixed_block,
    table_select (2 or 3 values), subblock_gain (3, switching only),
    region0_count/region1_count (non-switching only), preflag,
    scalefac_scale, count1table_select. The main_data region is
    zero-filled (no Huffman payload — the documented boundary).
    44.1 kHz, no CRC, no padding."""
    try:
        brx = _BITRATES.index(kbps)
    except ValueError:
        raise ValueError(f"kbps must be one of {_BITRATES[1:15]}")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    mode = 0b11 if channels == 1 else 0b00
    size = (144 * kbps * 1000) // 44100
    out = bytearray()
    for fr in frames:
        h = (
            (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
            | (brx << 12) | (0 << 10) | (0 << 9) | (mode << 6)
        )
        bw = _BitWriter()
        bw.write(fr["main_data_begin"], 9)
        bw.write(0, 5 if channels == 1 else 3)
        for ch in range(channels):
            bw.write(fr["scfsi"][ch], 4)
        for gr in range(2):
            for ch in range(channels):
                g = fr["granules"][gr][ch]
                bw.write(g["part2_3_length"], 12)
                bw.write(g["big_values"], 9)
                bw.write(g["global_gain"], 8)
                bw.write(g["scalefac_compress"], 4)
                bw.write(g["window_switching"], 1)
                if g["window_switching"]:
                    if g["block_type"] == 0:
                        raise ValueError(
                            "block_type 0 with window_switching is invalid"
                        )
                    bw.write(g["block_type"], 2)
                    bw.write(g["mixed_block"], 1)
                    for t in g["table_select"][:2]:
                        bw.write(t, 5)
                    for s in g["subblock_gain"]:
                        bw.write(s, 3)
                else:
                    for t in g["table_select"][:3]:
                        bw.write(t, 5)
                    bw.write(g["region0_count"], 4)
                    bw.write(g["region1_count"], 3)
                bw.write(g["preflag"], 1)
                bw.write(g["scalefac_scale"], 1)
                bw.write(g["count1table_select"], 1)
        body = bw.tobytes()
        want = 17 if channels == 1 else 32
        if len(body) != want:
            raise AssertionError(f"side info {len(body)} bytes != {want}")
        frame = h.to_bytes(4, "big") + body
        if len(frame) > size:
            raise ValueError(f"side info overflows {size}-byte frame")
        out += frame + bytes(size - len(frame))
    return bytes(out)


# ------------------------------------- Layer III spectral samples
# (user-supplied-table escape hatch)
#
# The ISO 11172-3 constants a sample decode needs — Table B.7 (32
# big_values Huffman tables + count1 tables A/B) and Table B.8 (the
# per-sample-rate scalefactor band partitions) — have no generating
# formula and cannot be responsibly reproduced from memory without
# risking silent wrongness. The honest boundary stands: with no
# tables, decode_mp3_layer3_samples raises, naming them. But the
# ALGORITHM around those constants IS closed-form spec grammar
# (§2.4.2.7/§2.4.3.4: bit-reservoir assembly via main_data_begin,
# scalefactor transmission with scfsi granule-1 reuse, the three
# big_values Huffman regions partitioned by the band table and the
# region counts, linbits escapes, sign bits, the count1 quadruple
# tail, rzero padding to 576 lines) — so a caller who OWNS the spec
# can pass the tables in and get a real decoder. The test suite and
# the gate census exercise the full machinery with clearly-synthetic
# tables (synthetic_l3_tables) round-tripped through the matching
# encoder, which proves every structural bit without shipping a
# single ISO constant. Requantization to xr values is NOT performed:
# it additionally needs the pretab preemphasis table (§2.4.3.4.3.1),
# another named constant — samples return as signed integers.
#
# tables dict shape (all parts caller-supplied):
#   {"huffman": {tid: {"linbits": int, "codes": {(x, y): "0101"}}},
#    "count1":  {0: {(v, w, x, y): "bits"}, 1: {...}},
#    "sfb_long": [b0, b1, ..., 576]  (cumulative line offsets,
#                 len = n_bands + 1, strictly increasing, 0-start),
#    "ws_region0_end": int  (region0 end line when window_switching;
#                 region2 is empty in that mode)}
# A big_values table with codes == {} is the spec's zero table:
# (0, 0) at zero bits. Sign convention: a 1 sign bit negates
# (encoder mirrors it, so round-trip pins the convention).


def _l3_decode_maps(tables: dict) -> tuple[dict, dict, list[int], int]:
    """Validate + invert a user table dict into decoder form:
    (big[tid] -> (linbits, esc_mag, {code: (x, y)}, max_len),
    count1[sel] -> ({code: quad}, max_len), sfb_long, ws_r0_end)."""
    if "huffman" not in tables or "count1" not in tables:
        raise ValueError("tables must carry 'huffman' and 'count1'")
    sfb = list(tables.get("sfb_long") or [])
    if len(sfb) < 2 or sfb[0] != 0 or sfb[-1] != 576 or any(
        a >= b for a, b in zip(sfb, sfb[1:])
    ):
        raise ValueError(
            "sfb_long must be strictly increasing cumulative offsets "
            "from 0 to 576 (Table B.8 shape)"
        )
    big = {}
    for tid, t in tables["huffman"].items():
        codes = dict(t.get("codes", {}))
        inv = {}
        for (x, y), code in codes.items():
            if code in inv:
                raise ValueError(f"table {tid}: duplicate code {code}")
            inv[code] = (int(x), int(y))
        # prefix-freedom: no code may be a proper prefix of another
        cs = sorted(inv)
        for a, b in zip(cs, cs[1:]):
            if b.startswith(a):
                raise ValueError(f"table {tid}: {a} is a prefix of {b}")
        esc = max((max(x, y) for (x, y) in codes), default=0)
        big[int(tid)] = (
            int(t.get("linbits", 0)),
            esc,
            inv,
            max((len(c) for c in inv), default=0),
        )
    c1 = {}
    for sel, codes in tables["count1"].items():
        inv = {}
        for quad, code in codes.items():
            if len(quad) != 4 or any(v not in (0, 1) for v in quad):
                raise ValueError("count1 symbols must be 0/1 quadruples")
            inv[code] = tuple(int(v) for v in quad)
        cs = sorted(inv)
        for a, b in zip(cs, cs[1:]):
            if b.startswith(a):
                raise ValueError(f"count1 {sel}: {a} is a prefix of {b}")
        c1[int(sel)] = (inv, max((len(c) for c in inv), default=0))
    return big, c1, sfb, int(tables.get("ws_region0_end", 36))


def _huff_read(br: "_BitReader", inv: dict, max_len: int, what: str):
    """One prefix-code symbol, MSB-first walk (tiny tables: a string
    accumulate is plenty — this is the test/census path, not a 100 TB
    hot loop; the distributed hot loop is the mapInPandas census over
    many docs, which parallelizes across documents)."""
    code = ""
    while len(code) <= max_len:
        if code in inv:
            return inv[code]
        code += "01"[br.read(1)]
    raise ValueError(f"Huffman desync in {what}: no code matches {code}")


# long-block scalefactor group slices per _SCFSI_GROUPS: sfb 0-5 /
# 6-10 under slen1, 11-15 / 16-20 under slen2
_SCF_SLICES = ((0, 6), (6, 11), (11, 16), (16, 21))


def _read_scalefacs(
    br: "_BitReader", g: dict, gr: int, scfsi: int, prev: list | None,
) -> list[int]:
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    if g["window_switching"] and g["block_type"] == 2:
        n1 = 17 if g["mixed_block"] else 18
        return [br.read(slen1) for _ in range(n1)] + [
            br.read(slen2) for _ in range(18)
        ]
    out: list[int] = []
    for b, ((lo, hi), (n1, n2)) in enumerate(zip(_SCF_SLICES, _SCFSI_GROUPS)):
        slen = slen1 if n1 else slen2
        if gr == 1 and (scfsi >> (3 - b)) & 1:
            if prev is None:
                raise ValueError("scfsi reuse with no granule-0 scalefactors")
            out.extend(prev[lo:hi])
        else:
            out.extend(br.read(slen) for _ in range(hi - lo))
    return out


def _decode_granule(
    br: "_BitReader", g: dict, gr: int, scfsi: int, prev_sf: list | None,
    big: dict, c1: dict, sfb: list[int], ws_r0: int,
) -> tuple[list[int], list[int], int]:
    """One granule-channel: (samples[576], scalefacs, n_stuffing_bits).
    Consumes exactly part2_3_length bits from ``br``."""
    start = br.pos
    end_bit = start + g["part2_3_length"]
    sf = _read_scalefacs(br, g, gr, scfsi, prev_sf)
    if br.pos > end_bit:
        raise ValueError("scalefactors overran part2_3_length")
    bv2 = g["big_values"] * 2
    if g["window_switching"]:
        r0_end, r1_end = min(ws_r0, bv2), bv2  # region2 empty
    else:
        i0 = g["region0_count"] + 1
        i1 = i0 + g["region1_count"] + 1
        if i1 >= len(sfb):
            raise ValueError(
                f"region counts ({g['region0_count']}, "
                f"{g['region1_count']}) exceed the {len(sfb) - 1}-band "
                "sfb_long table"
            )
        r0_end, r1_end = min(sfb[i0], bv2), min(sfb[i1], bv2)
    samples: list[int] = []
    while len(samples) < bv2:
        region = 0 if len(samples) < r0_end else (1 if len(samples) < r1_end else 2)
        tid = g["table_select"][region]
        if tid not in big:
            raise ValueError(f"table_select {tid} not in supplied tables")
        linbits, esc, inv, max_len = big[tid]
        if not inv:  # the zero table: (0, 0) at zero bits
            samples.extend((0, 0))
            continue
        x, y = _huff_read(br, inv, max_len, f"big_values table {tid}")
        vals = []
        for v in (x, y):
            if v == esc and linbits:
                v += br.read(linbits)
            if v and br.read(1):
                v = -v
            vals.append(v)
        samples.extend(vals)
    # an inconsistent stream whose big_values walk reads past the
    # granule's bit budget would otherwise consume the NEXT granule's
    # bits and silently rewind — raise, like the scalefactor overrun
    if br.pos > end_bit:
        raise ValueError("big_values overran part2_3_length")
    # count1 tail: quadruples until the bit budget is exhausted; a
    # quad that would overrun is encoder stuffing — discarded (§2.4.3.4)
    stuffing = 0
    sel = g["count1table_select"]
    if sel not in c1:
        raise ValueError(f"count1table_select {sel} not in supplied tables")
    inv1, max1 = c1[sel]
    while br.pos < end_bit and len(samples) + 4 <= 576:
        mark = br.pos
        try:
            quad = _huff_read(br, inv1, max1, "count1")
            vals = []
            for v in quad:
                if v and br.read(1):
                    v = -v
                vals.append(v)
        except ValueError:
            br.pos = mark
            stuffing = end_bit - mark
            break
        if br.pos > end_bit:
            br.pos = mark
            stuffing = end_bit - mark
            break
        samples.extend(vals)
    if br.pos < end_bit:
        stuffing += end_bit - br.pos
    br.pos = end_bit
    samples.extend([0] * (576 - len(samples)))
    return samples, sf, stuffing


def decode_mp3_layer3_samples(payload: bytes, tables: dict | None = None):
    """MPEG-1 Layer III spectral-sample decode.

    Without ``tables`` this raises, naming the ISO constants it would
    need (module comment above — the honest boundary). WITH a caller-
    supplied table dict it is a real decoder: bit-reservoir assembly
    across frames (main_data_begin), scalefactors with scfsi reuse,
    three-region big_values Huffman decode with linbits escapes and
    sign bits, the count1 quadruple tail, rzero padding. Returns

    ``{"n_frames", "sample_rate", "channels", "granules": [
       {"frame", "gr", "ch", "samples": [576 ints],
        "scalefacs": [...], "stuffing_bits"}]}``

    Samples are SIGNED INTEGER Huffman values — requantization to xr
    needs the pretab table (§2.4.3.4.3.1), not supplied here."""
    if tables is None:
        raise NotImplementedError(
            "MPEG-1 Layer III sample decode requires ISO 11172-3 tables "
            "B.7 (34 Huffman code tables) and B.8 (scalefactor bands); "
            "pass tables={'huffman': ..., 'count1': ..., 'sfb_long': ..."
            "} to decode with caller-supplied constants, or use "
            "decode_mp3_layer3_sideinfo for the bit-exact side-"
            "information layer"
        )
    big, c1, sfb, ws_r0 = _l3_decode_maps(tables)
    data = bytes(payload)
    pos = _skip_id3v2(data)
    n_frames = 0
    rate = None
    channels = None
    reservoir = bytearray()
    # (granule fields, scfsi, reservoir byte offset of the frame's
    # main data) queued per frame, decoded once its bytes are banked
    out_granules: list[dict] = []
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        if (h >> 19) & 0x3 != 0b11 or (h >> 17) & 0x3 != 0b01:
            if n_frames == 0:
                raise ValueError("only MPEG-1 Layer III decodes here")
            break
        protection = (h >> 16) & 0x1
        brx = (h >> 12) & 0xF
        srx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if _BITRATES[brx] is None or _RATES[srx] is None:
            raise ValueError("free/bad bitrate or reserved sample rate")
        frame_rate = _RATES[srx]
        if rate is None:
            rate, channels = frame_rate, (1 if mode == 0b11 else 2)
        elif frame_rate != rate:
            break
        nch = 1 if mode == 0b11 else 2
        size = (144 * _BITRATES[brx] * 1000) // frame_rate + padding
        if pos + size > len(data):
            break
        br = _BitReader(data[pos : pos + size], 32 + (0 if protection else 16))
        mdb = br.read(9)
        br.read(5 if nch == 1 else 3)
        scfsi = [br.read(4) for _ in range(nch)]
        gspecs = []
        for gr in range(2):
            for ch in range(nch):
                g = {
                    "part2_3_length": br.read(12),
                    "big_values": br.read(9),
                    "global_gain": br.read(8),
                    "scalefac_compress": br.read(4),
                    "window_switching": br.read(1),
                }
                if g["window_switching"]:
                    g["block_type"] = br.read(2)
                    g["mixed_block"] = br.read(1)
                    g["table_select"] = [br.read(5) for _ in range(2)]
                    g["subblock_gain"] = [br.read(3) for _ in range(3)]
                    g["region0_count"] = None
                    g["region1_count"] = None
                else:
                    g["block_type"] = 0
                    g["mixed_block"] = 0
                    g["table_select"] = [br.read(5) for _ in range(3)]
                    g["region0_count"] = br.read(4)
                    g["region1_count"] = br.read(3)
                g["preflag"] = br.read(1)
                g["scalefac_scale"] = br.read(1)
                g["count1table_select"] = br.read(1)
                gspecs.append((gr, ch, g))
        side_bytes = 4 + (0 if protection else 2) + (17 if nch == 1 else 32)
        main_start = len(reservoir) - mdb
        if main_start < 0:
            raise ValueError(
                f"main_data_begin {mdb} reaches before the reservoir "
                f"({len(reservoir)} banked bytes)"
            )
        reservoir.extend(data[pos + side_bytes : pos + size])
        gbr = _BitReader(bytes(reservoir), main_start * 8)
        prev_sf: dict[int, list[int]] = {}
        for gr, ch, g in gspecs:
            samples, sf, stuff = _decode_granule(
                gbr, g, gr, scfsi[ch], prev_sf.get(ch), big, c1, sfb, ws_r0
            )
            if gr == 0:
                prev_sf[ch] = sf
            out_granules.append(
                {
                    "frame": n_frames, "gr": gr, "ch": ch,
                    "samples": samples, "scalefacs": sf,
                    "stuffing_bits": stuff,
                }
            )
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise ValueError("no MPEG-1 Layer III frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "granules": out_granules,
    }


def synthetic_l3_tables(
    max_val: int = 2, linbits: int = 0, n_bands: int = 22
) -> dict:
    """A clearly-SYNTHETIC Layer III table set — NOT the ISO B.7/B.8
    values — for round-trip tests and the gate census: fixed-length
    enumeration codes (trivially prefix-free) over value pairs
    0..max_val, a 4-bit count1 enumeration, and an even band
    partition. Exercising the real decode machinery with these proves
    every structural bit of the escape hatch without reproducing a
    single spec constant. With ``linbits`` > 0, magnitude == max_val
    escapes to max_val + read(linbits), like the spec's 15+linbits."""
    side = max_val + 1
    import math

    nbits = max(1, math.ceil(math.log2(side * side)))
    codes = {
        (x, y): format(x * side + y, f"0{nbits}b")
        for x in range(side)
        for y in range(side)
    }
    count1 = {
        (v, w, x, y): format(v * 8 + w * 4 + x * 2 + y, "04b")
        for v in (0, 1)
        for w in (0, 1)
        for x in (0, 1)
        for y in (0, 1)
    }
    sfb = [round(576 * i / n_bands) for i in range(n_bands + 1)]
    return {
        "huffman": {
            0: {"linbits": 0, "codes": {}},  # the zero table
            1: {"linbits": linbits, "codes": codes},
        },
        "count1": {0: count1, 1: count1},
        "sfb_long": sfb,
        "ws_region0_end": 36,
    }


def encode_mp3_layer3_frames(
    frames: list[dict], tables: dict, kbps: int = 64, channels: int = 1
) -> bytes:
    """Layer III FULL-frame test-vector encoder: side information AND
    Huffman-coded main data (main_data_begin = 0 — each frame's data
    follows its own side info), the exact inverse of
    decode_mp3_layer3_samples over the same ``tables``. Frame dicts
    mirror encode_mp3_layer3_sideinfo plus, per granule dict:

    ``"scalefacs"`` (value list sized by §2.4.2.7 for the granule's
    scalefac_compress/block shape; omitted groups under scfsi reuse
    are still listed and skipped), ``"pairs"`` (signed big_values
    (x, y) list) and ``"quads"`` (signed count1 quadruples).
    part2_3_length and big_values are COMPUTED from the payload."""
    big, c1, _sfb, _ws = _l3_decode_maps(tables)
    try:
        brx = _BITRATES.index(kbps)
    except ValueError:
        raise ValueError(f"kbps must be one of {_BITRATES[1:15]}")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    mode = 0b11 if channels == 1 else 0b00
    size = (144 * kbps * 1000) // 44100
    out = bytearray()
    for fr in frames:
        main = _BitWriter()
        gmeta = []
        for gr in range(2):
            for ch in range(channels):
                g = fr["granules"][gr][ch]
                start = len(main.bits)
                sf = list(g.get("scalefacs", []))
                if g["window_switching"] and g["block_type"] == 2:
                    slen1, slen2 = _SLEN[g["scalefac_compress"]]
                    n1 = 17 if g["mixed_block"] else 18
                    if len(sf) != n1 + 18:
                        raise ValueError(
                            f"short granule needs {n1 + 18} scalefacs"
                        )
                    for i, v in enumerate(sf):
                        main.write(v, slen1 if i < n1 else slen2)
                else:
                    slen1, slen2 = _SLEN[g["scalefac_compress"]]
                    if len(sf) != 21:
                        raise ValueError("long granule needs 21 scalefacs")
                    scfsi = fr["scfsi"][ch]
                    for b, ((lo, hi), (n1, _n2)) in enumerate(
                        zip(_SCF_SLICES, _SCFSI_GROUPS)
                    ):
                        if gr == 1 and (scfsi >> (3 - b)) & 1:
                            continue  # reused from granule 0
                        slen = slen1 if n1 else slen2
                        for v in sf[lo:hi]:
                            main.write(v, slen)
                pairs = g.get("pairs", [])
                bv2 = len(pairs) * 2
                if g["window_switching"]:
                    r0_end, r1_end = min(_ws, bv2), bv2
                else:
                    i0 = g["region0_count"] + 1
                    i1 = i0 + g["region1_count"] + 1
                    r0_end = min(_sfb[i0], bv2)
                    r1_end = min(_sfb[i1], bv2)
                for i, (x, y) in enumerate(pairs):
                    line = i * 2
                    region = 0 if line < r0_end else (1 if line < r1_end else 2)
                    tid = g["table_select"][region]
                    linbits, esc, inv, _ml = big[tid]
                    fwd = {v: k for k, v in inv.items()}
                    if not fwd:
                        if x or y:
                            raise ValueError(
                                f"zero table {tid} cannot code ({x}, {y})"
                            )
                        continue
                    vals = []
                    for v in (x, y):
                        mag = abs(v)
                        if mag >= esc and linbits:
                            vals.append((esc, mag - esc, v < 0))
                            if mag - esc >= (1 << linbits):
                                raise ValueError(
                                    f"|{v}| exceeds esc {esc} + {linbits} linbits"
                                )
                        elif mag > esc:
                            raise ValueError(
                                f"|{v}| > table {tid} max {esc} with no linbits"
                            )
                        else:
                            vals.append((mag, None, v < 0))
                    code = fwd[(vals[0][0], vals[1][0])]
                    for bit in code:
                        main.write(int(bit), 1)
                    for mag, lin, neg in vals:
                        if lin is not None:
                            main.write(lin, linbits)
                        if mag or lin:
                            main.write(1 if neg else 0, 1)
                sel = g["count1table_select"]
                inv1, _m1 = c1[sel]
                fwd1 = {v: k for k, v in inv1.items()}
                for quad in g.get("quads", []):
                    key = tuple(1 if v else 0 for v in quad)
                    for bit in fwd1[key]:
                        main.write(int(bit), 1)
                    for v in quad:
                        if v:
                            main.write(1 if v < 0 else 0, 1)
                gmeta.append(
                    {
                        **g,
                        "part2_3_length": len(main.bits) - start,
                        "big_values": len(pairs),
                    }
                )
        side = encode_mp3_layer3_sideinfo(
            [
                {
                    "main_data_begin": 0,
                    "scfsi": fr["scfsi"],
                    "granules": [
                        [gmeta[gr * channels + ch] for ch in range(channels)]
                        for gr in range(2)
                    ],
                }
            ],
            kbps=kbps,
            channels=channels,
        )
        head = side[: 4 + (17 if channels == 1 else 32)]
        body = main.tobytes()
        if len(head) + len(body) > size:
            raise ValueError(
                f"main data ({len(body)} B) overflows the "
                f"{size}-byte frame at {kbps} kbps"
            )
        out += head + body + bytes(size - len(head) - len(body))
    return bytes(out)


# --------------------------------------------------------- PCM synthesis
# Layer III PCM under the SAME user-supplied-tables contract as the
# B.7/B.8 spectral decode: everything the spec prints as a FORMULA
# (requantization power laws, IMDCT, block windows, overlap-add,
# frequency inversion, filterbank matrixing) is implemented; everything
# the spec prints as a TABLE (the B.3 512-tap prototype window, the 8
# alias-reduction ci coefficients, B.6 pretab, B.8 short bands) must be
# supplied by the caller — zero ISO constants ship here, and the tests
# run clearly-synthetic stand-ins through the full machinery.


def _imdct(X: list, n: int) -> list:
    """n-point IMDCT (12 short / 36 long) — the closed §2.4.3.4.10.2
    formula x_i = sum_{k<n/2} X_k cos(pi/(2n)(2i + 1 + n/2)(2k + 1))."""
    import math

    half = n // 2
    return [
        sum(
            X[k]
            * math.cos(math.pi / (2 * n) * (2 * i + 1 + half) * (2 * k + 1))
            for k in range(half)
        )
        for i in range(n)
    ]


def _l3_block_window(block_type: int) -> list:
    """§2.4.3.4.10.3 block windows — the spec prints these as closed
    sine FORMULAS (normal / start / stop 36-tap, short 12-tap), so they
    ship; only tabulated constants stay caller-supplied."""
    import math

    if block_type == 2:
        return [math.sin(math.pi / 12 * (i + 0.5)) for i in range(12)]
    w = [math.sin(math.pi / 36 * (i + 0.5)) for i in range(36)]
    if block_type == 1:  # start: long attack half, short decay half
        for i in range(18, 24):
            w[i] = 1.0
        for i in range(24, 30):
            w[i] = math.sin(math.pi / 12 * (i - 18 + 0.5))
        for i in range(30, 36):
            w[i] = 0.0
    elif block_type == 3:  # stop: mirror of start
        for i in range(0, 6):
            w[i] = 0.0
        for i in range(6, 12):
            w[i] = math.sin(math.pi / 12 * (i - 6 + 0.5))
        for i in range(12, 18):
            w[i] = 1.0
    return w


def synthesize_subband_pcm(blocks: list, window: list) -> list:
    """The polyphase synthesis filterbank (ISO 11172-3 §2.4.3.2, the
    Annex A flow chart) over a CALLER-SUPPLIED 512-tap prototype window
    (table B.3 — tabulated, not shipped; the escape-hatch contract of
    decode_mp3_layer3_samples). ``blocks`` is a sequence of 32-sample
    subband vectors (one filterbank instant each); each yields 32 PCM
    samples. Matrixing is the closed formula
    N_ik = cos((16 + i)(2k + 1) pi / 64); the 1024-value V fifo, the
    U/W gather and the 16-tap comb are the spec's exact flow."""
    import math

    win = [float(x) for x in window]
    if len(win) != 512:
        raise ValueError(
            f"synth window must have 512 taps (B.3 shape), got {len(win)}"
        )
    n_mat = [
        [math.cos((16 + i) * (2 * k + 1) * math.pi / 64) for k in range(32)]
        for i in range(64)
    ]
    v = [0.0] * 1024
    out: list = []
    for s in blocks:
        if len(s) != 32:
            raise ValueError("each subband block must carry 32 samples")
        v = [
            sum(n_mat[i][k] * s[k] for k in range(32)) for i in range(64)
        ] + v[:960]
        u = [0.0] * 512
        for i in range(8):
            for j in range(32):
                u[i * 64 + j] = v[i * 128 + j]
                u[i * 64 + 32 + j] = v[i * 128 + 96 + j]
        w = [u[i] * win[i] for i in range(512)]
        out.extend(
            sum(w[j + 32 * i] for i in range(16)) for j in range(32)
        )
    return out


def _l3_requantize(
    samples: list, sf: list, g: dict, sfb_long: list, tables: dict
) -> list:
    """Coded-order integer samples -> xr floats: the §2.4.3.4.7.1
    power laws. Long: |is|^(4/3) * 2^((gg-210)/4) * 2^(-mult*(sf +
    preflag*pretab)); short: per-window subblock_gain and
    scalefac_s[sfb][win] (flat index sfb*3 + win, the transmitted
    order). ``mult`` = 0.5 (scalefac_scale 0) or 1.0."""
    import math

    gg = g["global_gain"]
    mult = 1.0 if g["scalefac_scale"] else 0.5
    short = g["window_switching"] and g["block_type"] == 2
    out = [0.0] * 576
    if not short:
        pre = [0.0] * (len(sfb_long) - 1)
        if g["preflag"]:
            if "pretab" not in tables:
                raise NotImplementedError(
                    "preflag granule needs caller-supplied 'pretab' "
                    "(ISO 11172-3 table B.6)"
                )
            supplied = list(tables["pretab"])
            pre[: len(supplied)] = [float(p) for p in supplied]
        gain = 2.0 ** (0.25 * (gg - 210))
        band = 0
        for i, v in enumerate(samples):
            while band + 1 < len(sfb_long) - 1 and i >= sfb_long[band + 1]:
                band += 1
            s = float(sf[band]) if band < len(sf) else 0.0
            p = pre[band] if band < len(pre) else 0.0
            mag = abs(v) ** (4.0 / 3.0) * gain * 2.0 ** (-mult * (s + p))
            out[i] = -mag if v < 0 else mag
        return out
    if g["mixed_block"]:
        raise NotImplementedError(
            "mixed short/long granules are not synthesized (the pure "
            "long and pure short paths cover the transmitted shapes "
            "this repo's encoders produce)"
        )
    if "sfb_short" not in tables:
        raise NotImplementedError(
            "short-block granule needs caller-supplied 'sfb_short' "
            "(ISO 11172-3 table B.8 short bands, cumulative 0..192)"
        )
    sfb_s = list(tables["sfb_short"])
    if sfb_s[0] != 0 or sfb_s[-1] != 192 or any(
        a >= b for a, b in zip(sfb_s, sfb_s[1:])
    ):
        raise ValueError(
            "sfb_short must be strictly increasing cumulative offsets "
            "from 0 to 192"
        )
    sbg = g["subblock_gain"]
    cidx = 0
    for n in range(len(sfb_s) - 1):
        start, end = sfb_s[n], sfb_s[n + 1]
        for w in range(3):
            gain = 2.0 ** (0.25 * (gg - 210 - 8 * sbg[w]))
            sidx = n * 3 + w
            s = float(sf[sidx]) if sidx < len(sf) else 0.0
            scale = gain * 2.0 ** (-mult * s)
            for f in range(start, end):
                if cidx >= len(samples):
                    break
                v = samples[cidx]
                cidx += 1
                mag = abs(v) ** (4.0 / 3.0) * scale
                # natural layout: frequency f of window w lands at
                # subband f div 6, line (f mod 6) — stored as
                # 18*sb + 6*w + (f mod 6) for the IMDCT consumer
                out[18 * (f // 6) + 6 * w + (f % 6)] = -mag if v < 0 else mag
    return out


def decode_mp3_layer3_pcm(payload: bytes, tables: dict | None = None) -> dict:
    """FULL Layer III PCM decode under caller-supplied tables — the
    B.3 escape hatch the B.7/B.8 spectral decode established. Requires,
    beyond decode_mp3_layer3_samples' keys:

    - ``synth_window``: the 512-tap prototype window (table B.3);
    - ``alias_ci``: the 8 alias-reduction ci coefficients
      (§2.4.3.4.10.1 — cs/ca are DERIVED here: cs = 1/sqrt(1+ci^2),
      ca = ci/sqrt(1+ci^2));
    - ``pretab`` (only if a granule sets preflag): table B.6;
    - ``sfb_short`` (only if short granules occur): B.8 short bands.

    Pipeline (§2.4.3.4): requantize -> (short: reorder to per-subband
    windows) -> (long: alias-reduction butterflies across subband
    boundaries) -> IMDCT with the closed-form block windows ->
    overlap-add (18 + 18) -> frequency inversion (odd samples of odd
    subbands) -> polyphase synthesis. Returns ``{"n_frames",
    "sample_rate", "channels", "n_granules", "pcm": [per-channel float
    lists, 576 samples per granule]}``. Without the required tables
    this raises, naming them — the honest-boundary default."""
    if tables is None:
        raise NotImplementedError(
            "Layer III PCM decode requires caller-supplied ISO 11172-3 "
            "tables: B.7/B.8 (see decode_mp3_layer3_samples) plus the "
            "B.3 512-tap synthesis window ('synth_window') and the 8 "
            "alias-reduction coefficients ('alias_ci')"
        )
    for key in ("synth_window", "alias_ci"):
        if key not in tables:
            raise NotImplementedError(
                f"Layer III PCM decode needs tables['{key}'] "
                "(B.3 window / §2.4.3.4.10.1 ci coefficients)"
            )
    import math

    ci = [float(c) for c in tables["alias_ci"]]
    if len(ci) != 8:
        raise ValueError(f"alias_ci must carry 8 coefficients, got {len(ci)}")
    cs = [1.0 / math.sqrt(1.0 + c * c) for c in ci]
    ca = [c / math.sqrt(1.0 + c * c) for c in ci]
    dec = decode_mp3_layer3_samples(payload, tables)
    side = decode_mp3_layer3_sideinfo(payload)
    sfb_long = list(tables["sfb_long"])
    nch = dec["channels"]
    overlap = [[0.0] * 576 for _ in range(nch)]
    sub_blocks: list[list] = [[] for _ in range(nch)]
    if len(dec["granules"]) != len(side["granules"]):
        # zip would silently truncate a length mismatch (e.g. a frame
        # decoded by one pass but skipped by the other); the per-key
        # check below only catches reordering within the common prefix
        raise ValueError(
            "granule stream desync: samples pass decoded "
            f"{len(dec['granules'])} granules, side-info pass "
            f"{len(side['granules'])}"
        )
    for gdat, gmeta in zip(dec["granules"], side["granules"]):
        key = (gdat["frame"], gdat["gr"], gdat["ch"])
        if key != (gmeta["frame"], gmeta["gr"], gmeta["ch"]):
            raise ValueError(f"granule stream desync at {key}")
        ch = gdat["ch"]
        xr = _l3_requantize(
            gdat["samples"], gdat["scalefacs"], gmeta, sfb_long, tables
        )
        short = gmeta["window_switching"] and gmeta["block_type"] == 2
        if not short:
            # alias-reduction butterflies across each subband boundary
            for sb in range(1, 32):
                for i in range(8):
                    a = xr[18 * sb - 1 - i]
                    b = xr[18 * sb + i]
                    xr[18 * sb - 1 - i] = a * cs[i] - b * ca[i]
                    xr[18 * sb + i] = b * cs[i] + a * ca[i]
        grane = [[0.0] * 18 for _ in range(32)]
        for sb in range(32):
            if short:
                y = [0.0] * 36
                w12 = _l3_block_window(2)
                for w in range(3):
                    xw = _imdct(
                        xr[18 * sb + 6 * w: 18 * sb + 6 * w + 6], 12
                    )
                    for j in range(12):
                        y[6 + 6 * w + j] += xw[j] * w12[j]
            else:
                x36 = _imdct(xr[18 * sb: 18 * sb + 18], 36)
                w36 = _l3_block_window(gmeta["block_type"])
                y = [x36[j] * w36[j] for j in range(36)]
            for j in range(18):
                grane[sb][j] = y[j] + overlap[ch][18 * sb + j]
                overlap[ch][18 * sb + j] = y[18 + j]
            if sb % 2:  # frequency inversion: odd samples, odd subbands
                for j in range(1, 18, 2):
                    grane[sb][j] = -grane[sb][j]
        for t in range(18):
            sub_blocks[ch].append([grane[sb][t] for sb in range(32)])
    return {
        "n_frames": dec["n_frames"],
        "sample_rate": dec["sample_rate"],
        "channels": nch,
        "n_granules": len(dec["granules"]),
        "pcm": [
            synthesize_subband_pcm(sub_blocks[ch], tables["synth_window"])
            for ch in range(nch)
        ],
    }
