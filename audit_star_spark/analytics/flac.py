"""FLAC decoder/encoder — pure stdlib/numpy, no codec libraries.

FLAC is the dominant lossless audio interchange format in scraped
corpora after WAV; until this module the audio layer raised on its
magic (an honest but user-visible boundary). Decode covers the real
format per the public xiph.org specification (RFC 9639):

- STREAMINFO metadata (other blocks skipped);
- frame headers: UTF-8-coded frame/sample number, all block-size and
  sample-rate encodings, CRC bytes present but not verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  with quantized coefficients, wasted-bits unary prefix;
- residuals: Rice / Rice2 partitioned coding including the 5-bit
  escape (raw residuals);
- stereo decorrelation: independent, left-side, right-side, mid-side
  (side channel carries bits-per-sample + 1).

Truncated or corrupt streams raise ValueError so the mapInPandas
callers degrade per the repo-wide poison-payload contract.

``encode_flac`` is the deterministic test-vector generator (the
``encode_jpeg_progressive`` / ``encode_gif_animation`` analog): it
writes CONSTANT subframes for constant blocks, FIXED order-2 with Rice
residuals when they fit, VERBATIM otherwise — enough to cross every
decoder path differentially; it is a correct encoder, not a
compressing one.

Public spec: RFC 9639 / xiph.org FLAC format documentation.
"""

from __future__ import annotations

import numpy as np


class _BitReader:
    """MSB-first bit reader over bytes; raises ValueError on exhaustion
    (truncation surfaces as a decode error, never garbage samples)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self.pos
        data = self.data
        while n > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 20:
                raise ValueError("runaway unary code")
        return n

    def read_rice(self, param: int) -> int:
        q = self.read_unary()
        r = self.read(param) if param else 0
        v = (q << param) | r
        return (v >> 1) ^ -(v & 1)  # zigzag

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (up to 36
    bits, 7 continuation bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("bad UTF-8 coded number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("block size not divisible into residual partitions")
    out: list[int] = []
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("bad residual partitioning")
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            out.extend(br.read_rice(param) for _ in range(n))
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [br.read_signed(bps) for _ in range(block_size)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + r)
        out = np.array(samples, dtype=np.int64)
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
            samples.append(pred + r)
        out = np.array(samples, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def parse_flac(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """FLAC bytes -> (sample_rate, n_channels, bits_per_sample,
    samples int32 of shape (n, channels))."""
    if payload[:4] != b"fLaC":
        raise ValueError("bad FLAC signature")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        header = payload[pos]
        last = header & 0x80
        btype = header & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if len(body) < 34:
                raise ValueError("short STREAMINFO")
            br = _BitReader(body)
            br.read(16); br.read(16)  # min/max blocksize
            br.read(24); br.read(24)  # min/max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, channels, bps, total)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    rate, channels, bps, total = info
    if rate == 0:
        raise ValueError("bad sample rate")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        br = _BitReader(payload, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_bits = br.read(4)
        sr_bits = br.read(4)
        chan_assign = br.read(4)
        ss_bits = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_bits == 0:
            raise ValueError("reserved block size")
        elif bs_bits == 6:
            block_size = br.read(8) + 1
        elif bs_bits == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZES[bs_bits]
        if sr_bits == 12:
            br.read(8)
        elif sr_bits in (13, 14):
            br.read(16)
        elif sr_bits == 15:
            raise ValueError("invalid sample rate bits")
        if ss_bits == 0:
            frame_bps = bps
        else:
            frame_bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_bits)
            if frame_bps is None:
                raise ValueError("reserved sample size")
        br.read(8)  # CRC-8

        if chan_assign < 8:
            n_ch = chan_assign + 1
            if n_ch != channels:
                raise ValueError("frame channel count mismatch")
            subs = [_decode_subframe(br, block_size, frame_bps) for _ in range(n_ch)]
        elif chan_assign in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if chan_assign == 8:  # left-side
                left = _decode_subframe(br, block_size, frame_bps)
                side = _decode_subframe(br, block_size, frame_bps + 1)
                subs = [left, left - side]
            elif chan_assign == 9:  # right-side
                side = _decode_subframe(br, block_size, frame_bps + 1)
                right = _decode_subframe(br, block_size, frame_bps)
                subs = [right + side, right]
            else:  # mid-side
                mid = _decode_subframe(br, block_size, frame_bps)
                side = _decode_subframe(br, block_size, frame_bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        br.read(16)  # frame CRC-16
        for c in range(channels):
            chans[c].append(subs[c])
        got += block_size
        pos = br.pos // 8
    if got == 0:
        raise ValueError("FLAC stream has no frames")
    if total and got < total:
        raise ValueError("truncated FLAC stream")
    cols = [np.concatenate(c) for c in chans]
    n = total if total else len(cols[0])
    out = np.stack([c[:n] for c in cols], axis=1)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if out.min() < lo or out.max() > hi:
        raise ValueError("decoded sample exceeds bits-per-sample range")
    return rate, channels, bps, out.astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_rice(self, v: int, param: int) -> None:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        for _ in range(z >> param):
            self.bits.append(0)
        self.bits.append(1)
        self.write(z & ((1 << param) - 1), param)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    bps: int = 16,
    block_size: int = 256,
    rice_param: int = 10,
) -> bytes:
    """(n, channels) int samples -> FLAC bytes. Per block and channel:
    CONSTANT when the block is constant, FIXED order-2 + single-partition
    Rice when every zigzagged residual fits ``rice_param`` sanely,
    VERBATIM otherwise — crossing the constant/fixed/verbatim decoder
    paths. Independent channels only (the decorrelated assignments are
    exercised by hand-built vectors in tests). Deterministic bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if not 1 <= channels <= 8:
        raise ValueError("1..8 channels")
    s = samples.astype(np.int64)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError("samples exceed bits-per-sample")

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.tobytes() + b"\x00" * 16  # zero MD5 (not verified)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize - 1 follows
        w.write(0, 4)  # rate from STREAMINFO
        w.write(channels - 1, 4)
        w.write(0, 3)  # bps from STREAMINFO
        w.write(0, 1)
        if frame_no < 0x80:
            w.write(frame_no, 8)
        else:
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        w.write(bs - 1, 16)
        w.write(0, 8)  # CRC-8 unverified
        for c in range(channels):
            ch = blk[:, c]
            if bs and int(ch.min()) == int(ch.max()):
                w.write(0, 1)
                w.write(0, 6)  # CONSTANT
                w.write(0, 1)
                w.write_signed(int(ch[0]), bps)
            elif bs > 2 and _fixed2_fits(ch, rice_param):
                w.write(0, 1)
                w.write(10, 6)  # FIXED order 2
                w.write(0, 1)
                w.write_signed(int(ch[0]), bps)
                w.write_signed(int(ch[1]), bps)
                w.write(0, 2)  # Rice (4-bit params)
                w.write(0, 4)  # partition order 0
                w.write(rice_param, 4)
                for i in range(2, bs):
                    r = int(ch[i]) - (2 * int(ch[i - 1]) - int(ch[i - 2]))
                    w.write_rice(r, rice_param)
            else:
                w.write(0, 1)
                w.write(1, 6)  # VERBATIM
                w.write(0, 1)
                for v in ch:
                    w.write_signed(int(v), bps)
        w.align()
        w.write(0, 16)  # CRC-16 unverified
        out += w.tobytes()
        frame_no += 1
    return bytes(out)


def _fixed2_fits(ch: np.ndarray, rice_param: int) -> bool:
    r = ch[2:] - (2 * ch[1:-1] - ch[:-2])
    z = np.where(r >= 0, r << 1, ((-r) << 1) - 1)
    # keep unary quotients bounded so encodes stay small and decodes fast
    return bool(len(z) == 0 or (z >> rice_param).max() <= 64)
