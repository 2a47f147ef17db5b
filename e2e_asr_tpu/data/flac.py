"""Self-contained FLAC decoder (pure Python oracle; native C++ fast path).

LibriSpeech — the standard public corpus for this model family — ships as
FLAC, and this environment has no flac/ffmpeg/soundfile. This module decodes
the FLAC subset those corpora use (and more): CONSTANT / VERBATIM / FIXED /
LPC subframes, Rice/Rice2 residual partitions with escape codes, wasted bits,
all stereo decorrelation modes, 8/12/16/20/24-bit samples.

The pure-Python implementation is the readable specification and the test
oracle; runtime/flac_decoder.cc mirrors it for corpus-prep speed (see
data/native.py). Format per the FLAC spec (RFC 9639).

Not implemented: CRC verification (headers are parsed, CRCs skipped) and
32-bit samples.
"""
from __future__ import annotations

import struct

import numpy as np


class _BitReader:
    __slots__ = ("data", "pos", "bitpos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # byte position
        self.bitpos = 0         # bit within byte, MSB first

    def read_uint(self, bits: int) -> int:
        out = 0
        data, pos, bitpos = self.data, self.pos, self.bitpos
        while bits > 0:
            avail = 8 - bitpos
            take = avail if avail < bits else bits
            byte = data[pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bitpos += take
            bits -= take
            if bitpos == 8:
                pos += 1
                bitpos = 0
        self.pos, self.bitpos = pos, bitpos
        return out

    def read_int(self, bits: int) -> int:
        v = self.read_uint(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        n = 0
        data, pos, bitpos = self.data, self.pos, self.bitpos
        while True:
            byte = data[pos] & ((1 << (8 - bitpos)) - 1)
            if byte == 0:
                n += 8 - bitpos
                pos += 1
                bitpos = 0
            else:
                top = byte.bit_length()
                zeros = (8 - bitpos) - top
                n += zeros
                bitpos += zeros + 1
                if bitpos == 8:
                    pos += 1
                    bitpos = 0
                self.pos, self.bitpos = pos, bitpos
                return n

    def align(self) -> None:
        if self.bitpos:
            self.pos += 1
            self.bitpos = 0


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's extended UTF-8 coded frame/sample number."""
    b0 = br.read_uint(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read_uint(8) & 0x3F)
    return v


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}

_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_residual(br: _BitReader, block_size: int, order: int
                     ) -> np.ndarray:
    method = br.read_uint(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    plen = 4 + method                     # rice parameter bit width
    escape = (1 << plen) - 1
    porder = br.read_uint(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("block size not divisible by partition count")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        n = block_size // n_part - (order if p == 0 else 0)
        param = br.read_uint(plen)
        if param == escape:
            bits = br.read_uint(5)
            for i in range(n):
                out[idx] = br.read_int(bits) if bits else 0
                idx += 1
        else:
            for i in range(n):
                q = br.read_unary()
                v = (q << param) | (br.read_uint(param) if param else 0)
                out[idx] = (v >> 1) ^ -(v & 1)       # zigzag
                idx += 1
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read_uint(1):
        raise ValueError("subframe padding bit set")
    sf_type = br.read_uint(6)
    wasted = 0
    if br.read_uint(1):
        wasted = br.read_unary() + 1
        bps -= wasted

    if sf_type == 0:                                   # CONSTANT
        v = br.read_int(bps)
        samples = np.full(block_size, v, dtype=np.int64)
    elif sf_type == 1:                                 # VERBATIM
        samples = np.array([br.read_int(bps) for _ in range(block_size)],
                           dtype=np.int64)
    elif 8 <= sf_type <= 12:                           # FIXED order 0-4
        order = sf_type - 8
        warm = [br.read_int(bps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * samples[i - 1 - j]
            samples[i] = pred + resid[i - order]
    elif sf_type >= 32:                                # LPC order 1-32
        order = sf_type - 31
        warm = [br.read_int(bps) for _ in range(order)]
        precision = br.read_uint(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_int(5)
        coeffs = [br.read_int(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coeffs[j] * int(samples[i - 1 - j])
            samples[i] = (pred >> shift) + resid[i - order]
    else:
        raise ValueError(f"reserved subframe type {sf_type}")

    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream -> (int32 samples [n, channels], sample_rate,
    bits_per_sample)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    stream_bps = 16
    stream_rate = 16000
    total = 0
    channels = 1
    # Metadata blocks.
    while True:
        header = data[pos]
        last = header & 0x80
        btype = header & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        pos += 4 + length
        if btype == 0:                                 # STREAMINFO
            br = _BitReader(body)
            br.read_uint(16)                           # min block
            br.read_uint(16)                           # max block
            br.read_uint(24)                           # min frame
            br.read_uint(24)                           # max frame
            stream_rate = br.read_uint(20)
            channels = br.read_uint(3) + 1
            stream_bps = br.read_uint(5) + 1
            total = br.read_uint(36)
        if last:
            break

    chunks = []
    n_decoded = 0
    while pos < len(data) and (total == 0 or n_decoded < total):
        br = _BitReader(data, pos)
        sync = br.read_uint(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {pos}")
        br.read_uint(1)                                # reserved
        br.read_uint(1)                                # blocking strategy
        bs_code = br.read_uint(4)
        sr_code = br.read_uint(4)
        ch_code = br.read_uint(4)
        ss_code = br.read_uint(3)
        br.read_uint(1)                                # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            block_size = br.read_uint(8) + 1
        elif bs_code == 7:
            block_size = br.read_uint(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read_uint(8)
        elif sr_code in (13, 14):
            br.read_uint(16)
        bps = stream_bps if ss_code == 0 else _SAMPLE_SIZES[ss_code]
        br.read_uint(8)                                # header CRC-8

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_decode_subframe(br, block_size, bps)
                    for _ in range(n_ch)]
        else:                                          # stereo decorrelation
            n_ch = 2
            if ch_code == 8:                           # left/side
                left = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:                         # right/side
                side = _decode_subframe(br, block_size, bps + 1)
                right = _decode_subframe(br, block_size, bps)
                subs = [right + side, right]
            elif ch_code == 10:                        # mid/side
                mid = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                mid2 = (mid << 1) | (side & 1)
                subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
            else:
                raise ValueError(f"reserved channel assignment {ch_code}")

        br.align()
        br.read_uint(16)                               # frame CRC-16
        pos = br.pos
        chunks.append(np.stack(subs, axis=1))
        n_decoded += block_size

    out = (np.concatenate(chunks, axis=0) if chunks
           else np.zeros((0, channels), np.int64))
    if total:
        out = out[:total]
    return out.astype(np.int32), stream_rate, stream_bps


def read_flac(path: str, *, prefer_native: bool = True
              ) -> tuple[np.ndarray, int]:
    """Read a FLAC file -> (float32 mono waveform in [-1, 1], sample_rate).

    Uses the native C++ decoder (runtime/flac_decoder.cc via data/native.py)
    when built; falls back to the pure-Python decoder above.
    """
    with open(path, "rb") as f:
        data = f.read()
    decoded = None
    if prefer_native:
        from e2e_asr_tpu.data import native
        decoded = native.decode_flac_bytes(data)
    if decoded is None:
        decoded = decode_flac(data)
    samples, rate, bps = decoded
    mono = samples.astype(np.float32).mean(axis=1)
    return mono / float(1 << (bps - 1)), rate
