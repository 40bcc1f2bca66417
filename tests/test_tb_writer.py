"""TensorBoard event writer: format pinned against known vectors and a
record-level round-trip reader (independent decode of the TFRecord framing
and the Event/Summary wire format)."""
import glob
import os
import struct

from arfe_tpu.utils.tb_writer import TensorboardWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / common test vectors for CRC-32C (Castagnoli)
    assert crc32c(b'123456789') == 0xE3069283
    assert crc32c(b'') == 0
    assert crc32c(b'\x00' * 32) == 0x8A9136AA


def _read_records(path):
    out = []
    with open(path, 'rb') as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack('<Q', header)
            (hcrc,) = struct.unpack('<I', f.read(4))
            assert hcrc == _masked_crc(header)
            data = f.read(length)
            (dcrc,) = struct.unpack('<I', f.read(4))
            assert dcrc == _masked_crc(data)
            out.append(data)


def _parse_fields(msg):
    """Minimal protobuf wire-format parser -> {field_num: [values]}."""
    fields = {}
    i = 0
    while i < len(msg):
        tag = msg[i]
        num, wire = tag >> 3, tag & 7
        i += 1
        if wire == 0:          # varint
            val, shift = 0, 0
            while True:
                b = msg[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:        # 64-bit
            (val,) = struct.unpack('<d', msg[i:i + 8])
            i += 8
        elif wire == 5:        # 32-bit
            (val,) = struct.unpack('<f', msg[i:i + 4])
            i += 4
        elif wire == 2:        # length-delimited
            ln, shift = 0, 0
            while True:
                b = msg[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = msg[i:i + ln]
            i += ln
        else:
            raise AssertionError(f'wire type {wire}')
        fields.setdefault(num, []).append(val)
    return fields


def test_scalar_roundtrip(tmp_path):
    w = TensorboardWriter(str(tmp_path))
    w.add_scalar('train/loss', 1.25, 7)
    w.add_scalars({'acc': 0.5, 'lr': 0.02}, 8, prefix='train/')
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), 'events.out.tfevents.*'))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 4  # file_version + 3 scalars
    head = _parse_fields(records[0])
    assert head[3] == [b'brain.Event:2']
    got = {}
    for rec in records[1:]:
        ev = _parse_fields(rec)
        step = ev[2][0]
        summary = _parse_fields(ev[5][0])
        value = _parse_fields(summary[1][0])
        tag = value[1][0].decode()
        got[tag] = (step, value[2][0])
    assert got['train/loss'] == (7, 1.25)
    assert got['train/acc'] == (8, 0.5)
    assert abs(got['train/lr'][1] - 0.02) < 1e-7


def test_train_loop_writes_events(tmp_path, tiny_train_setup=None):
    """dict(type='TensorboardLoggerHook') in log_config produces event
    files under work_dir/tf_logs (integration covered by the CLI drive;
    here: the hook-detection wiring via a minimal config object)."""
    from arfe_tpu import Config
    cfg = Config(dict(log_config=dict(
        interval=1, hooks=[dict(type='TextLoggerHook'),
                           dict(type='TensorboardLoggerHook')])))
    hooks = cfg.todict()['log_config']['hooks']
    assert any(h.get('type') == 'TensorboardLoggerHook' for h in hooks)
