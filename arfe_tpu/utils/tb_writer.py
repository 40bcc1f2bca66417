"""Minimal TensorBoard event-file writer (TensorboardLoggerHook equivalent,
ref: configs/_base_/default_runtime.py:2-8 — the hook mmcv registers when
``dict(type='TensorboardLoggerHook')`` appears in log_config.hooks).

Dependency-free: hand-encodes the two protos TensorBoard's scalar dashboard
needs (tensorflow.Event / Summary.Value.simple_value) and the TFRecord
framing (length + masked crc32c). Files are readable by stock TensorBoard.
"""
from __future__ import annotations

import os
import socket
import struct
import time

_CRC_TABLE = []


def _crc32c_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = b''
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out += bytes([bits | 0x80])
        else:
            return out + bytes([bits])


def _field_bytes(num: int, payload: bytes) -> bytes:
    return bytes([(num << 3) | 2]) + _varint(len(payload)) + payload


def _event(wall_time: float, step: int, *, file_version: str = None,
           summary: bytes = None) -> bytes:
    msg = bytes([0x09]) + struct.pack('<d', wall_time)        # 1: wall_time
    if step:
        msg += bytes([0x10]) + _varint(step)                  # 2: step
    if file_version is not None:
        msg += _field_bytes(3, file_version.encode())         # 3: version
    if summary is not None:
        msg += _field_bytes(5, summary)                       # 5: summary
    return msg


def _scalar_summary(tag: str, value: float) -> bytes:
    val = (_field_bytes(1, tag.encode())                      # Value.tag
           + bytes([0x15]) + struct.pack('<f', value))        # simple_value
    return _field_bytes(1, val)                               # Summary.value


class TensorboardWriter:
    """Append-only scalar event writer; one events file per instance."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f'events.out.tfevents.{int(time.time())}.'
                 f'{socket.gethostname()}')
        self._f = open(os.path.join(log_dir, fname), 'wb')
        self._write_record(_event(time.time(), 0,
                                  file_version='brain.Event:2'))
        self.flush()

    def _write_record(self, data: bytes):
        header = struct.pack('<Q', len(data))
        self._f.write(header)
        self._f.write(struct.pack('<I', _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack('<I', _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int):
        self._write_record(_event(time.time(), int(step),
                                  summary=_scalar_summary(tag,
                                                          float(value))))

    def add_scalars(self, scalars: dict, step: int, prefix: str = ''):
        for k, v in scalars.items():
            self.add_scalar(prefix + k, v, step)

    def flush(self):
        self._f.flush()

    def close(self):
        if not self._f.closed:
            self._f.flush()
            self._f.close()
