"""FLAC decoder tests against hand-built bitstreams.

A minimal test-only FLAC *encoder* lives here: it produces spec-conformant
streams exercising every subframe type (CONSTANT/VERBATIM/FIXED/LPC), Rice
and escape residual partitions, multi-partition residuals, wasted bits,
mid/side stereo, and multi-frame streams. The decoder under test
(e2e_asr_tpu/data/flac.py, and the native C++ mirror when built) must
reconstruct the exact constructed signals.
"""
import numpy as np
import pytest

from e2e_asr_tpu.data import flac


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write_uint(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_int(self, value: int, bits: int):
        self.write_uint(value & ((1 << bits) - 1), bits)

    def write_unary(self, n: int):
        for _ in range(n):
            self.write_uint(0, 1)
        self.write_uint(1, 1)

    def align(self):
        while self.nbits:
            self.write_uint(0, 1)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def streaminfo(rate: int, channels: int, bps: int, total: int) -> bytes:
    w = BitWriter()
    w.write_uint(0x80, 8)          # last block, type 0 (STREAMINFO)
    w.write_uint(34, 24)
    w.write_uint(16, 16)           # min block
    w.write_uint(65535, 16)        # max block
    w.write_uint(0, 24)
    w.write_uint(0, 24)
    w.write_uint(rate, 20)
    w.write_uint(channels - 1, 3)
    w.write_uint(bps - 1, 5)
    w.write_uint(total, 36)
    for _ in range(16):            # md5
        w.write_uint(0, 8)
    return w.data()


def frame_header(w: BitWriter, block_size: int, ch_code: int, frame_no: int):
    w.write_uint(0b11111111111110, 14)
    w.write_uint(0, 1)             # reserved
    w.write_uint(0, 1)             # fixed blocksize strategy
    w.write_uint(6, 4)             # blocksize: 8-bit at end of header
    w.write_uint(0, 4)             # sample rate: from STREAMINFO
    w.write_uint(ch_code, 4)
    w.write_uint(0, 3)             # sample size: from STREAMINFO
    w.write_uint(0, 1)             # reserved
    assert frame_no < 0x80
    w.write_uint(frame_no, 8)      # UTF-8 single byte
    w.write_uint(block_size - 1, 8)
    w.write_uint(0, 8)             # header CRC-8 (decoder skips)


def rice_residual(w: BitWriter, resid, param: int, porder: int = 0,
                  order: int = 0, escape_bits: int | None = None):
    """method 0 (4-bit params), porder partitions; escape_bits forces the
    raw-escape encoding in every partition."""
    w.write_uint(0, 2)
    w.write_uint(porder, 4)
    n_part = 1 << porder
    block = len(resid) + order
    assert block % n_part == 0
    idx = 0
    for p in range(n_part):
        n = block // n_part - (order if p == 0 else 0)
        if escape_bits is not None:
            w.write_uint(0b1111, 4)
            w.write_uint(escape_bits, 5)
            for _ in range(n):
                w.write_int(int(resid[idx]), escape_bits)
                idx += 1
        else:
            w.write_uint(param, 4)
            for _ in range(n):
                v = int(resid[idx])
                u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
                w.write_unary(u >> param)
                if param:
                    w.write_uint(u & ((1 << param) - 1), param)
                idx += 1


def sub_verbatim(w: BitWriter, samples, bps: int, wasted: int = 0):
    w.write_uint(0, 1)
    w.write_uint(1, 6)
    if wasted:
        w.write_uint(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write_uint(0, 1)
    for s in samples:
        w.write_int(int(s) >> wasted, bps - wasted)


def sub_constant(w: BitWriter, value: int, bps: int):
    w.write_uint(0, 1)
    w.write_uint(0, 6)
    w.write_uint(0, 1)
    w.write_int(value, bps)


def sub_fixed(w: BitWriter, samples, order: int, bps: int, param: int = 3,
              porder: int = 0):
    w.write_uint(0, 1)
    w.write_uint(8 + order, 6)
    w.write_uint(0, 1)
    coeffs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    for s in samples[:order]:
        w.write_int(int(s), bps)
    resid = []
    for i in range(order, len(samples)):
        pred = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coeffs))
        resid.append(int(samples[i]) - pred)
    rice_residual(w, resid, param, porder=porder, order=order)


def sub_lpc(w: BitWriter, warm, coeffs, shift: int, resid, bps: int,
            precision: int = 12, param: int = 4):
    order = len(coeffs)
    w.write_uint(0, 1)
    w.write_uint(32 + order - 1, 6)
    w.write_uint(0, 1)
    for s in warm:
        w.write_int(int(s), bps)
    w.write_uint(precision - 1, 4)
    w.write_int(shift, 5)
    for c in coeffs:
        w.write_int(int(c), precision)
    rice_residual(w, resid, param, order=order)


def finish_frame(w: BitWriter):
    w.align()
    w.write_uint(0, 16)            # frame CRC-16 (decoder skips)


def lpc_reconstruct(warm, coeffs, shift, resid):
    out = list(int(x) for x in warm)
    for r in resid:
        pred = sum(int(c) * out[-1 - j] for j, c in enumerate(coeffs))
        out.append((pred >> shift) + int(r))
    return np.array(out, dtype=np.int64)


@pytest.fixture(params=["python", "native"])
def decode(request):
    if request.param == "python":
        return flac.decode_flac

    from e2e_asr_tpu.data import native

    def native_dec(data):
        out = native.decode_flac_bytes(data)
        if out is None:
            pytest.skip("native flac decoder not built")
        return out
    return native_dec


def test_verbatim_roundtrip(decode):
    rng = np.random.default_rng(0)
    samples = rng.integers(-32768, 32768, size=40, dtype=np.int64)
    w = BitWriter()
    frame_header(w, 40, ch_code=0, frame_no=0)
    sub_verbatim(w, samples, 16)
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, 40) + w.data()
    out, rate, bps = decode(data)
    assert rate == 16000 and bps == 16
    np.testing.assert_array_equal(out[:, 0], samples)


def test_constant_and_multiframe(decode):
    w1 = BitWriter()
    frame_header(w1, 24, ch_code=0, frame_no=0)
    sub_constant(w1, -123, 16)
    finish_frame(w1)
    w2 = BitWriter()
    frame_header(w2, 24, ch_code=0, frame_no=1)
    sub_constant(w2, 99, 16)
    finish_frame(w2)
    data = b"fLaC" + streaminfo(8000, 1, 16, 48) + w1.data() + w2.data()
    out, rate, _ = decode(data)
    assert rate == 8000
    np.testing.assert_array_equal(out[:24, 0], -123)
    np.testing.assert_array_equal(out[24:, 0], 99)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(decode, order):
    t = np.arange(64)
    samples = (1000 * np.sin(t / 5.0)).astype(np.int64)
    w = BitWriter()
    frame_header(w, 64, ch_code=0, frame_no=0)
    sub_fixed(w, samples, order, 16, param=6)
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, 64) + w.data()
    out, _, _ = decode(data)
    np.testing.assert_array_equal(out[:, 0], samples)


def test_fixed_multi_partition(decode):
    t = np.arange(64)
    samples = (500 * np.cos(t / 3.0)).astype(np.int64)
    w = BitWriter()
    frame_header(w, 64, ch_code=0, frame_no=0)
    sub_fixed(w, samples, 2, 16, param=5, porder=2)   # 4 partitions
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, 64) + w.data()
    out, _, _ = decode(data)
    np.testing.assert_array_equal(out[:, 0], samples)


def test_lpc_subframe(decode):
    rng = np.random.default_rng(1)
    warm = [100, -50]
    coeffs = [1536, -512]                  # ~0.75, -0.25 at shift 11
    shift = 11
    resid = rng.integers(-40, 40, size=62).astype(np.int64)
    expect = lpc_reconstruct(warm, coeffs, shift, resid)
    w = BitWriter()
    frame_header(w, 64, ch_code=0, frame_no=0)
    sub_lpc(w, warm, coeffs, shift, resid, 16)
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, 64) + w.data()
    out, _, _ = decode(data)
    np.testing.assert_array_equal(out[:, 0], expect)


def test_escape_partition(decode):
    rng = np.random.default_rng(2)
    samples = rng.integers(-100, 100, size=32, dtype=np.int64)
    w = BitWriter()
    frame_header(w, 32, ch_code=0, frame_no=0)
    # fixed order 0 => residual == samples, escape-coded raw at 9 bits
    w.write_uint(0, 1)
    w.write_uint(8, 6)
    w.write_uint(0, 1)
    rice_residual(w, samples, 0, escape_bits=9)
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, 32) + w.data()
    out, _, _ = decode(data)
    np.testing.assert_array_equal(out[:, 0], samples)


def test_wasted_bits(decode):
    samples = np.arange(-40, 40, 2, dtype=np.int64) * 4   # 3 trailing zeros
    w = BitWriter()
    frame_header(w, 40, ch_code=0, frame_no=0)
    sub_verbatim(w, samples, 16, wasted=3)
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, 40) + w.data()
    out, _, _ = decode(data)
    np.testing.assert_array_equal(out[:, 0], samples)


@pytest.mark.parametrize("ch_code", [1, 8, 9, 10])
def test_stereo_modes(decode, ch_code):
    rng = np.random.default_rng(3)
    left = rng.integers(-2000, 2000, size=32, dtype=np.int64)
    right = rng.integers(-2000, 2000, size=32, dtype=np.int64)
    w = BitWriter()
    frame_header(w, 32, ch_code=ch_code, frame_no=0)
    if ch_code == 1:                       # independent stereo
        sub_verbatim(w, left, 16)
        sub_verbatim(w, right, 16)
    elif ch_code == 8:                     # left/side
        sub_verbatim(w, left, 16)
        sub_verbatim(w, left - right, 17)
    elif ch_code == 9:                     # right/side
        sub_verbatim(w, left - right, 17)
        sub_verbatim(w, right, 16)
    else:                                  # mid/side
        sub_verbatim(w, (left + right) >> 1, 16)
        sub_verbatim(w, left - right, 17)
    finish_frame(w)
    data = b"fLaC" + streaminfo(16000, 2, 16, 32) + w.data()
    out, _, _ = decode(data)
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)


def test_read_flac_float_mono(tmp_path, decode):
    samples = np.array([0, 16384, -16384, 32767, -32768], dtype=np.int64)
    w = BitWriter()
    frame_header(w, 5, ch_code=0, frame_no=0)
    sub_verbatim(w, samples, 16)
    finish_frame(w)
    path = tmp_path / "x.flac"
    path.write_bytes(b"fLaC" + streaminfo(16000, 1, 16, 5) + w.data())
    wave_f32, rate = flac.read_flac(str(path))
    assert rate == 16000
    np.testing.assert_allclose(wave_f32,
                               samples.astype(np.float32) / 32768.0)
