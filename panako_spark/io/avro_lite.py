"""Minimal Apache Avro 1.11 object-container-file codec (write + read).

Implemented from the PUBLIC Avro specification
(https://avro.apache.org/docs/1.11.1/specification/) because Apache
Iceberg's manifest and manifest-list files are REQUIRED to be Avro and
neither fastavro nor the Iceberg runtime jar is resolvable in this
offline sandbox. Only what Iceberg metadata needs is implemented:

  * container file: magic ``Obj\\x01``, file-metadata map
    (``avro.schema`` JSON + ``avro.codec``="null"), 16-byte sync
    marker, data blocks of (object count, byte size, objects, sync).
  * binary encoding: zigzag-varint int/long, IEEE LE float/double,
    length-prefixed bytes/string, field-ordered records, index-prefixed
    unions, count-block arrays and maps. No codecs other than null; no
    schema resolution (reader uses the writer schema embedded in the
    header, which is how Iceberg readers consume manifests too).

The codec is deliberately symmetric (our writer's files are verified by
our reader and vice versa); the container/binary layout follows the
spec byte-for-byte so an independent Avro implementation can read these
files — checked structurally in tests/test_iceberg_lite.py.
"""

from __future__ import annotations

import io
import json
import os
import struct

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- encoding --
def _zigzag_encode(n: int) -> bytes:
    # Avro long is 64-bit; Python ints are unbounded, so enforce the
    # range HERE — an out-of-range value would otherwise emit an 11+
    # byte varint that independent Avro readers reject
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"avro long out of int64 range: {n}")
    u = (n << 1) ^ (n >> 63)  # 64-bit zigzag
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _write_long(buf: io.BytesIO, n: int) -> None:
    buf.write(_zigzag_encode(int(n)))


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _write_str(buf: io.BytesIO, s: str) -> None:
    _write_bytes(buf, s.encode("utf-8"))


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_datum(buf: io.BytesIO, schema, datum) -> None:
    """Encode one value against `schema` (parsed-JSON Avro schema)."""
    t = _type_name(schema)
    if t == "null":
        if datum is not None:
            raise ValueError(f"non-null datum {datum!r} for null schema")
    elif t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, datum)
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(buf, bytes(datum))
    elif t == "string":
        _write_str(buf, datum)
    elif t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(b)
    elif t == "union":
        idx = _union_branch(schema, datum)
        _write_long(buf, idx)
        write_datum(buf, schema[idx], datum)
    elif t == "record":
        for f in schema["fields"]:
            name = f["name"]
            if isinstance(datum, dict) and name in datum:
                v = datum[name]
            elif "default" in f:
                v = f["default"]
            else:
                raise ValueError(f"record field {name!r} missing and has "
                                 "no default")
            write_datum(buf, f["type"], v)
    elif t == "array":
        items = list(datum)
        if items:
            _write_long(buf, len(items))
            for it in items:
                write_datum(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(datum)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_str(buf, k)
                write_datum(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _union_branch(union: list, datum) -> int:
    """Pick the union branch for a Python value — the Iceberg metadata
    unions are all ["null", X], so null-vs-not decides; for anything
    richer, first type-compatible branch wins."""
    for i, s in enumerate(union):
        t = _type_name(s)
        if datum is None and t == "null":
            return i
        if datum is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {datum!r} in {union}")


# ---------------------------------------------------------------- decoding --
def _read_long(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("EOF inside varint")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _read_nbytes(buf: io.BytesIO, n: int) -> bytes:
    b = buf.read(n)
    if len(b) != n:
        raise EOFError(f"wanted {n} bytes, got {len(b)}")
    return b


def _read_bytes(buf: io.BytesIO) -> bytes:
    return _read_nbytes(buf, _read_long(buf))


def _read_str(buf: io.BytesIO) -> str:
    return _read_bytes(buf).decode("utf-8")


def read_datum(buf: io.BytesIO, schema):
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return _read_nbytes(buf, 1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_nbytes(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_nbytes(buf, 8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_str(buf)
    if t == "fixed":
        return _read_nbytes(buf, schema["size"])
    if t == "union":
        return read_datum(buf, schema[_read_long(buf)])
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:       # negative count: byte size follows (spec)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_str(buf)  # key strictly before value: the
                out[k] = read_datum(buf, schema["values"])  # statement
                # form d[k()] = v() would evaluate v() FIRST
    raise ValueError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------- container file layer --
def write_container(path: str, schema: dict, records: list[dict],
                    metadata: dict[str, bytes] | None = None) -> None:
    """Write an Avro object container file (codec null, one block)."""
    sync = os.urandom(16)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null"}
    if metadata:
        meta.update(metadata)
    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    payload = body.getvalue()
    buf = io.BytesIO()
    buf.write(MAGIC)
    write_datum(buf, {"type": "map", "values": "bytes"}, meta)
    buf.write(sync)
    if records:
        _write_long(buf, len(records))
        _write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """-> (writer schema, records, file metadata)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if _read_nbytes(buf, 4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta = read_datum(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"{path}: unsupported codec {codec!r}")
    sync = _read_nbytes(buf, 16)
    records: list[dict] = []
    while buf.tell() < len(buf.getvalue()):
        n = _read_long(buf)
        _read_long(buf)  # block byte size (unused with codec null)
        for _ in range(n):
            records.append(read_datum(buf, schema))
        if _read_nbytes(buf, 16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records, meta
