"""TFRecord container format: read / write without TensorFlow.

The reference consumes TFRecord files through tf.data
(/root/reference/speech_dataset.py:49-60). This module implements the on-disk
framing directly so the same corpora work here:

    [uint64 length (LE)] [uint32 masked_crc32c(length)] [data]
    [uint32 masked_crc32c(data)]

CRC32C is the Castagnoli polynomial (reflected 0x82F63B78) with TFRecord's
masking: rotate-right-15 + 0xa282ead8.

A native C++ reader (runtime/) accelerates bulk reads; this pure-Python
implementation is the always-available fallback and the write path.
"""
from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np

_MASK_DELTA = 0xA282EAD8


def _make_crc32c_table() -> np.ndarray:
    poly = 0x82F63B78
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        table[i] = crc
    return table


_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    """Table-driven CRC32C; fine for the write path (reads skip verification
    by default — the native C++ reader handles bulk IO)."""
    table = _TABLE
    crc_val = 0xFFFFFFFF
    for b in data:
        crc_val = (crc_val >> 8) ^ int(table[(crc_val ^ b) & 0xFF])
    return crc_val ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def write_records(path: str, records: Iterator[bytes]) -> int:
    """Write records to a TFRecord file. Returns the count."""
    n = 0
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for rec in records:
            length = struct.pack("<Q", len(rec))
            f.write(length)
            f.write(struct.pack("<I", masked_crc(length)))
            f.write(rec)
            f.write(struct.pack("<I", masked_crc(rec)))
            n += 1
    os.replace(tmp, path)
    return n


def read_records(path: str, *, verify: bool = False) -> Iterator[bytes]:
    """Iterate raw records from a TFRecord file."""
    with open(path, "rb") as f:
        data = f.read()
    pos, end = 0, len(data)
    while pos < end:
        if pos + 12 > end:
            raise ValueError(f"truncated record header in {path} @ {pos}")
        (length,) = struct.unpack_from("<Q", data, pos)
        if verify:
            (len_crc,) = struct.unpack_from("<I", data, pos + 8)
            if masked_crc(data[pos:pos + 8]) != len_crc:
                raise ValueError(f"length CRC mismatch in {path} @ {pos}")
        pos += 12
        if pos + length + 4 > end:
            raise ValueError(f"truncated record body in {path} @ {pos}")
        rec = data[pos:pos + length]
        if verify:
            (rec_crc,) = struct.unpack_from("<I", data, pos + length)
            if masked_crc(rec) != rec_crc:
                raise ValueError(f"data CRC mismatch in {path} @ {pos}")
        pos += length + 4
        yield rec
