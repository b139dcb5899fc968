"""fluent_forward receiver analogue: Fluentd Forward-mode msgpack → records.

The reference bundles the fluentforward receiver (docs/components.md;
opentelemetry-collector-contrib receiver/fluentforwardreceiver), whose wire
format is msgpack Forward mode: each message is
``[tag, [[time, record], ...], option?]`` where ``time`` is either an
integer epoch-seconds or the EventTime ext (type 0: big-endian uint32
seconds + uint32 nanoseconds) and ``record`` is a str→value map
(https://github.com/fluent/fluentd/wiki/Forward-Protocol-Specification-v1).

No msgpack library ships in this environment, so the needed subset is
implemented here from the public spec (nil/bool/int/float64/str/bin/
array/map + ext type 0). The decode is a per-event Python loop — inherent
to a length-prefixed binary wire format and confined to the receiver edge:
one Forward message carries thousands of events, each file one block, so
the loop cost amortizes per message and everything after the decode is
Arrow-native. Encoding exists to stage test fixtures (the transport's
sender side).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# msgpack subset codec (public spec: https://github.com/msgpack/msgpack)
# ---------------------------------------------------------------------------


def pack(obj, out: bytearray) -> None:
    """Serialize ``obj`` (None/bool/int/float/str/bytes/list/dict/EventTime)."""
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, EventTime):
        out += b"\xd7\x00" + struct.pack(">II", obj.sec, obj.nsec)
    elif isinstance(obj, (int, np.integer)):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        elif 0 <= obj <= 0xFFFFFFFF:
            out.append(0xCE)
            out += struct.pack(">I", obj)
        elif obj >= 0:
            out.append(0xCF)
            out += struct.pack(">Q", obj)
        else:
            out.append(0xD3)
            out += struct.pack(">q", obj)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for x in obj:
            pack(x, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            pack(k, out)
            pack(v, out)
    else:
        raise TypeError(f"cannot pack {type(obj).__name__}")


class EventTime:
    """Fluentd EventTime ext (type 0): uint32 seconds + uint32 nanoseconds."""

    __slots__ = ("sec", "nsec")

    def __init__(self, sec: int, nsec: int) -> None:
        self.sec, self.nsec = sec, nsec

    def __eq__(self, other) -> bool:
        return isinstance(other, EventTime) and \
            (self.sec, self.nsec) == (other.sec, other.nsec)


def unpack(buf: "bytes | memoryview", pos: int = 0):
    """Decode one msgpack object; returns (obj, next_pos)."""
    b = buf[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return str(buf[pos:pos + n], "utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):
        w = (1, 2, 4)[b - 0xC4]
        n = int.from_bytes(buf[pos:pos + w], "big")
        pos += w
        return bytes(buf[pos:pos + n]), pos + n
    if b == 0xCA:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        w = 1 << (b - 0xCC)
        return int.from_bytes(buf[pos:pos + w], "big"), pos + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        w = 1 << (b - 0xD0)
        return int.from_bytes(buf[pos:pos + w], "big", signed=True), pos + w
    if b in (0xD9, 0xDA, 0xDB):
        w = (1, 2, 4)[b - 0xD9]
        n = int.from_bytes(buf[pos:pos + w], "big")
        pos += w
        return str(buf[pos:pos + n], "utf-8"), pos + n
    if b == 0xDC:
        return _unpack_array(buf, pos + 2,
                             int.from_bytes(buf[pos:pos + 2], "big"))
    if b == 0xDD:
        return _unpack_array(buf, pos + 4,
                             int.from_bytes(buf[pos:pos + 4], "big"))
    if b == 0xDE:
        return _unpack_map(buf, pos + 2,
                           int.from_bytes(buf[pos:pos + 2], "big"))
    if b == 0xDF:
        return _unpack_map(buf, pos + 4,
                           int.from_bytes(buf[pos:pos + 4], "big"))
    if b == 0xD7 and buf[pos] == 0x00:  # fixext8 type 0 = EventTime
        sec, nsec = struct.unpack_from(">II", buf, pos + 1)
        return EventTime(sec, nsec), pos + 9
    if b == 0xC7:  # ext8 (EventTime sometimes encoded this way)
        n = buf[pos]
        typ = buf[pos + 1]
        pos += 2
        if typ == 0 and n == 8:
            sec, nsec = struct.unpack_from(">II", buf, pos)
            return EventTime(sec, nsec), pos + 8
        return bytes(buf[pos:pos + n]), pos + n
    raise ValueError(f"unsupported msgpack byte 0x{b:02x}")


def _unpack_array(buf, pos, n):
    out = [None] * n
    for i in range(n):
        out[i], pos = unpack(buf, pos)
    return out, pos


def _unpack_map(buf, pos, n):
    out = {}
    for _ in range(n):
        k, pos = unpack(buf, pos)
        out[k], pos = unpack(buf, pos)
    return out, pos


# ---------------------------------------------------------------------------
# Forward mode
# ---------------------------------------------------------------------------


def pack_forward_message(tag: str, entries: "list[tuple[EventTime, dict]]"
                         ) -> bytes:
    """One Forward-mode message ``[tag, [[time, record], ...]]``."""
    out = bytearray()
    pack([tag, [[t, r] for t, r in entries]], out)
    return bytes(out)


def decode_forward_payload(data: "bytes | memoryview"
                           ) -> "tuple[list, list, list]":
    """Decode back-to-back Forward messages; returns (tags, times_us,
    records) flattened over all entries."""
    tags: list[str] = []
    times: list[int] = []
    records: list[dict] = []
    pos, end = 0, len(data)
    while pos < end:
        msg, pos = unpack(data, pos)
        tag, entries = msg[0], msg[1]
        for t, rec in entries:
            if isinstance(t, EventTime):
                us = t.sec * 1_000_000 + t.nsec // 1_000
            else:
                us = int(t) * 1_000_000
            tags.append(tag)
            times.append(us)
            records.append(rec)
    return tags, times, records


def read_fluent_forward(paths: "list[str] | str",
                        record_columns: "list[str] | None" = None
                        ) -> "ray.data.Dataset":
    """Read Forward-mode msgpack files into records: one input file per
    block (read_binary_files), each decoded once per batch; record map
    keys become columns, ``tag`` and ``ts`` ride along.

    Record columns are inferred per batch from that batch's record maps,
    so files whose key sets drift — or a batch whose Forward messages
    carry ZERO entries (spec-legal) — would emit divergent block schemas.
    ``record_columns`` pins the schema: every block carries exactly those
    record columns (missing keys null-filled, extras dropped)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, file_extensions=["msgpack"])

    def decode(batch: pa.Table) -> pa.Table:
        all_tags: list[str] = []
        all_us: list[int] = []
        all_recs: list[dict] = []
        for blob in batch["bytes"]:
            t, u, r = decode_forward_payload(memoryview(blob.as_py()))
            all_tags += t
            all_us += u
            all_recs += r
        cols: dict[str, pa.Array] = {
            "tag": pa.array(all_tags, type=pa.string()),
            "ts": pa.array(np.array(all_us, dtype=np.int64),
                           type=pa.timestamp("us")),
        }
        if all_recs:
            rec_tbl = pa.Table.from_pylist(all_recs)
            names = record_columns if record_columns is not None \
                else rec_tbl.column_names
            for name in names:
                cols[name] = (rec_tbl[name]
                              if name in rec_tbl.column_names
                              else pa.nulls(len(all_recs)))
        elif record_columns is not None:
            for name in record_columns:
                cols[name] = pa.nulls(0)
        return pa.table(cols)

    return ds.map_batches(decode, batch_format="pyarrow")
