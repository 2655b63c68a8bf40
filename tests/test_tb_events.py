"""tb_events.py: from-scratch tfevents writer (reference train.py:48).

Validates the three layers independently: CRC-32C against the published
test vector, the TFRecord framing round trip, and the Event proto encoding
(decoded both by the in-repo decoder and, when the protobuf runtime with
TensorBoard's compiled event_pb2 happens to be installed, by that)."""

import io
import struct

import pytest

from styletts2_tpu import tb_events as TB


def test_crc32c_vector():
    # RFC 3720 / tensorflow crc32c unit-test vector
    assert TB.crc32c(b"123456789") == 0xE3069283
    assert TB.crc32c(b"") == 0


def test_masked_crc_matches_tf_formula():
    crc = TB.crc32c(b"payload")
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert TB.masked_crc32c(b"payload") == want


def test_record_round_trip():
    buf = io.BytesIO()
    payloads = [b"first", b"x" * 1000, b""]
    for p in payloads:
        TB.write_record(buf, p)
    buf.seek(0)
    assert list(TB.read_records(buf)) == payloads


def test_record_crc_detects_corruption():
    buf = io.BytesIO()
    TB.write_record(buf, b"hello world")
    raw = bytearray(buf.getvalue())
    raw[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(AssertionError):
        list(TB.read_records(io.BytesIO(bytes(raw))))


def test_scalar_event_round_trip():
    payload = TB.encode_scalar_event("train/mel_loss", 0.625, 1234,
                                     wall_time=1700000000.5)
    wall, step, tag, value = TB.decode_scalar_event(payload)
    assert wall == 1700000000.5
    assert step == 1234
    assert tag == "train/mel_loss"
    assert value == pytest.approx(0.625)


def test_file_version_header():
    payload = TB.encode_file_version_event(wall_time=2.0)
    wall, step, tag, value = TB.decode_scalar_event(payload)
    assert wall == 2.0 and tag is None and value is None
    assert b"brain.Event:2" in payload


def test_writer_produces_loadable_file(tmp_path):
    w = TB.TBEventWriter(str(tmp_path))
    w.add_scalar("train/gen_loss", 1.5, 10)
    w.add_scalar("eval/mel_loss", 0.25, 11)
    w.close()
    assert w.path.split("/")[-1].startswith("events.out.tfevents.")
    with open(w.path, "rb") as f:
        records = list(TB.read_records(f))
    assert len(records) == 3  # header + 2 scalars
    decoded = [TB.decode_scalar_event(r) for r in records]
    assert decoded[1][1:] == (10, "train/gen_loss", 1.5)
    assert decoded[2][2] == "eval/mel_loss"
    assert decoded[2][3] == pytest.approx(0.25)


def test_varint_boundaries():
    # multi-byte varints (step > 127) must encode per proto wire format
    payload = TB.encode_scalar_event("t", 0.0, 300, wall_time=0.0)
    _, step, _, _ = TB.decode_scalar_event(payload)
    assert step == 300
    assert TB._varint(300) == bytes([0xAC, 0x02])
    assert TB._varint(0) == b"\x00"
    assert TB._varint(127) == b"\x7f"


def test_metrics_writer_emits_both(tmp_path):
    from styletts2_tpu.train_loop import MetricsWriter

    mw = MetricsWriter(str(tmp_path))
    mw.add_scalar("train/mel", 2.0, 7)
    files = {p.name.split(".")[0] if not p.name.startswith("events")
             else "events" for p in tmp_path.iterdir()}
    assert files == {"scalars", "events"}
    ev = next(p for p in tmp_path.iterdir()
              if p.name.startswith("events.out.tfevents."))
    with open(ev, "rb") as f:
        records = list(TB.read_records(f))
    assert TB.decode_scalar_event(records[1])[1:] == (7, "train/mel", 2.0)


def test_tensorboard_compat_if_available(tmp_path):
    """If the protobuf event defs are installed, our bytes must parse."""
    event_pb2 = None
    try:  # tensorboard's compiled protos, any of the common homes
        from tensorboard.compat.proto import event_pb2  # type: ignore
    except ImportError:
        try:
            from tensorflow.core.util import event_pb2  # type: ignore
        except ImportError:
            pytest.skip("no protobuf event defs installed")
    ev = event_pb2.Event()
    ev.ParseFromString(TB.encode_scalar_event("a/b", 3.5, 42, wall_time=9.0))
    assert ev.step == 42 and ev.wall_time == 9.0
    assert ev.summary.value[0].tag == "a/b"
    assert ev.summary.value[0].simple_value == pytest.approx(3.5)
