"""Minimal Avro object-container-file codec (pure stdlib).

Why this exists: the Iceberg table format stores its manifests and manifest
lists as Avro files (https://iceberg.apache.org/spec/#manifests), and this
container has no Iceberg runtime jar and no fastavro — but Avro's binary
encoding (https://avro.apache.org/docs/1.12.0/specification/) is small
enough to implement directly: zigzag-varint longs, length-prefixed
strings/bytes, fields in declaration order, unions as branch-index +
value, blocked arrays/maps, and an outer object-container framing (magic,
metadata map, sync-marker-delimited deflate blocks).

Supported schema subset: null / boolean / int / long / float / double /
bytes / string / fixed / record / union / array / map — everything the
Iceberg v2 manifest schemas need. Cross-implementation conformance is
tested against the official Java Avro library bundled with Spark
(``org.apache.avro.file.DataFileReader`` / ``DataFileWriter`` through the
JVM bridge): files we write read back identically in Java, and files Java
writes decode identically here.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


# ------------------------------------------------------------- primitives --

def _zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _is_optional(schema: Any) -> bool:
    return isinstance(schema, list)


# ---------------------------------------------------------------- encoder --

def _encode(value: Any, schema: Any, out: bytearray,
            named: dict[str, Any]) -> None:
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    if _is_optional(schema):                       # union: branch idx + value
        branch = _union_branch(value, schema, named)
        out += _zigzag_encode(branch)
        _encode(value, schema[branch], out, named)
        return
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return
    if value is None:
        # a None reaching a non-optional branch is a caller bug: str(None)
        # would durably serialize the TEXT "None" (and bool(None) a
        # false) into metadata that only fails far downstream — raise at
        # the cause like int(None) already does for numeric fields
        raise ValueError(
            f"None for non-optional Avro type {stype!r} — declare the "
            "field as a [\"null\", ...] union if absence is legal")
    if stype == "boolean":
        out.append(1 if value else 0)
    elif stype in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif stype == "float":
        out += struct.pack("<f", float(value))
    elif stype == "double":
        out += struct.pack("<d", float(value))
    elif stype == "bytes":
        data = bytes(value)
        out += _zigzag_encode(len(data)) + data
    elif stype == "string":
        data = str(value).encode("utf-8")
        out += _zigzag_encode(len(data)) + data
    elif stype == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(data)}")
        out += data
    elif stype == "record":
        _register(schema, named)
        for f in schema["fields"]:
            try:
                _encode(value.get(f["name"]) if isinstance(value, dict)
                        else getattr(value, f["name"]),
                        f["type"], out, named)
            except Exception as exc:
                raise ValueError(
                    f"field {schema.get('name')}.{f['name']}: {exc}") from exc
    elif stype == "array":
        items = list(value or [])
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                _encode(it, schema["items"], out, named)
        out += _zigzag_encode(0)
    elif stype == "map":
        entries = dict(value or {})
        if entries:
            out += _zigzag_encode(len(entries))
            for k, v in entries.items():
                _encode(k, "string", out, named)
                _encode(v, schema["values"], out, named)
        out += _zigzag_encode(0)
    else:
        raise ValueError(f"unsupported Avro type {stype!r}")


def _union_branch(value: Any, union: list, named: dict[str, Any]) -> int:
    for i, s in enumerate(union):
        st = s["type"] if isinstance(s, dict) else s
        if value is None and st == "null":
            return i
        if value is not None and st != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {union}")


def _register(schema: Any, named: dict[str, Any]) -> None:
    if isinstance(schema, dict) and schema.get("name"):
        named.setdefault(schema["name"], schema)


def _register_all(schema: Any, named: dict[str, Any]) -> None:
    """Walk the whole schema tree registering named types UP FRONT: lazy
    registration during value traversal misses a defining occurrence that
    sits in an untaken union branch, making a later by-name reference
    fail data-dependently."""
    if isinstance(schema, list):
        for s in schema:
            _register_all(s, named)
    elif isinstance(schema, dict):
        _register(schema, named)
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", ()):
                _register_all(f.get("type"), named)
        elif t == "array":
            _register_all(schema.get("items"), named)
        elif t == "map":
            _register_all(schema.get("values"), named)
        elif isinstance(t, (dict, list)):
            _register_all(t, named)


# ---------------------------------------------------------------- decoder --

def _decode(buf: io.BytesIO, schema: Any, named: dict[str, Any]) -> Any:
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
    if _is_optional(schema):
        branch = _zigzag_decode(buf)
        return _decode(buf, schema[branch], named)
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return None
    if stype == "boolean":
        return buf.read(1) == b"\x01"
    if stype in ("int", "long"):
        return _zigzag_decode(buf)
    if stype == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if stype == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if stype == "bytes":
        return buf.read(_zigzag_decode(buf))
    if stype == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if stype == "fixed":
        return buf.read(schema["size"])
    if stype == "record":
        _register(schema, named)
        return {f["name"]: _decode(buf, f["type"], named)
                for f in schema["fields"]}
    if stype == "array":
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:                       # size-prefixed block variant
                n = -n
                _zigzag_decode(buf)         # skip byte size
            for _ in range(n):
                out.append(_decode(buf, schema["items"], named))
    if stype == "map":
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _zigzag_decode(buf)
            for _ in range(n):
                k = buf.read(_zigzag_decode(buf)).decode("utf-8")
                out[k] = _decode(buf, schema["values"], named)
    raise ValueError(f"unsupported Avro type {stype!r}")


# ----------------------------------------------------- container file I/O --

def write_container(schema: dict, records: list[Any],
                    metadata: dict[str, str] | None = None,
                    codec: str = "deflate") -> bytes:
    """Serialize records into an Avro object container file (one block)."""
    named: dict[str, Any] = {}
    _register_all(schema, named)
    body = bytearray()
    for rec in records:
        _encode(rec, schema, body, named)
    if codec == "deflate":                  # raw deflate, no zlib wrapper
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(bytes(body)) + comp.flush()
    elif codec == "null":
        payload = bytes(body)
    else:
        raise ValueError(f"unsupported codec {codec!r}")

    sync = os.urandom(16)
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += sync
    if records:
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(payload))
        out += payload
        out += sync
    return bytes(out)


def read_container(data: bytes) -> tuple[dict, dict[str, bytes], list[Any]]:
    """Parse an Avro object container file → (schema, metadata, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            k = buf.read(_zigzag_decode(buf)).decode("utf-8")
            meta[k] = buf.read(_zigzag_decode(buf))
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    named: dict[str, Any] = {}
    _register_all(schema, named)
    records: list[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(_decode(bbuf, schema, named))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, meta, records
