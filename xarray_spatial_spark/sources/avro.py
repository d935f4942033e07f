"""Apache Avro object-container codec — from scratch, stdlib only.

Iceberg's metadata layer (manifest lists + manifest files) is Avro;
this sandbox has no avro python package and no spark-avro datasource,
so the from-scratch Iceberg table format (sources/iceberg_format.py)
carries its own codec, written against the public Avro 1.12
specification: zigzag-varint primitives, schema-driven generic
record encoding, object container files (magic, metadata map, sync
markers, blocks) with null/deflate codecs.

The CORE Avro Java library ships inside pyspark's jars, so the test
suite cross-validates both directions against the real implementation
through py4j (tests/test_avro_iceberg.py) — the libwebp/libjpeg oracle
pattern.

Scale note: Iceberg metadata is small by design (one manifest row per
DATA FILE, not per record) — this codec runs driver-side on KB-MB
inputs; the data plane stays parquet on executors.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive encoding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: bytearray, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc), pos


# ---------------------------------------------------------------------------
# schema-driven generic encode/decode
# ---------------------------------------------------------------------------


class _Names:
    """Registry for named-type references ("r502" used as a type)."""

    def __init__(self):
        self.by_name: dict[str, dict] = {}

    def resolve(self, schema):
        if isinstance(schema, str) and schema in self.by_name:
            return self.by_name[schema]
        if isinstance(schema, dict):
            nm = schema.get("name")
            if nm and schema.get("type") in ("record", "fixed", "enum"):
                self.by_name[nm] = schema
        return schema


def _encode(out: bytearray, schema, value, names: _Names) -> None:
    schema = names.resolve(schema)
    if isinstance(schema, list):  # union: pick the branch
        for idx, branch in enumerate(schema):
            b = names.resolve(branch)
            t = b if isinstance(b, str) else b.get("type")
            if value is None and t == "null":
                write_long(out, idx)
                return
            if value is not None and t != "null":
                write_long(out, idx)
                _encode(out, b, value, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        write_long(out, int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t in ("bytes", "string"):
        raw = value.encode("utf-8") if t == "string" else bytes(value)
        write_long(out, len(raw))
        out += raw
    elif t == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += raw
    elif t == "enum":
        write_long(out, schema["symbols"].index(value))
    elif t == "array":
        if value:
            write_long(out, len(value))
            for v in value:
                _encode(out, schema["items"], v, names)
        write_long(out, 0)
    elif t == "map":
        if value:
            write_long(out, len(value))
            for k, v in value.items():
                _encode(out, "string", k, names)
                _encode(out, schema["values"], v, names)
        write_long(out, 0)
    elif t == "record":
        names.resolve(schema)
        for f in schema["fields"]:
            try:
                _encode(out, f["type"], value.get(f["name"]), names)
            except Exception as e:
                raise ValueError(f"field {f['name']}: {e}") from e
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _decode(buf: bytes, pos: int, schema, names: _Names):
    schema = names.resolve(schema)
    if isinstance(schema, list):  # union
        idx, pos = read_long(buf, pos)
        return _decode(buf, pos, schema[idx], names)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        ln, pos = read_long(buf, pos)
        raw = buf[pos: pos + ln]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + ln
    if t == "fixed":
        sz = schema["size"]
        return bytes(buf[pos: pos + sz]), pos + sz
    if t == "enum":
        idx, pos = read_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "array":
        out = []
        while True:
            cnt, pos = read_long(buf, pos)
            if cnt == 0:
                break
            if cnt < 0:  # block with byte size prefix
                cnt = -cnt
                _, pos = read_long(buf, pos)
            for _ in range(cnt):
                v, pos = _decode(buf, pos, schema["items"], names)
                out.append(v)
        return out, pos
    if t == "map":
        out = {}
        while True:
            cnt, pos = read_long(buf, pos)
            if cnt == 0:
                break
            if cnt < 0:
                cnt = -cnt
                _, pos = read_long(buf, pos)
            for _ in range(cnt):
                k, pos = _decode(buf, pos, "string", names)
                v, pos = _decode(buf, pos, schema["values"], names)
                out[k] = v
        return out, pos
    if t == "record":
        names.resolve(schema)
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(buf, pos, f["type"], names)
        return rec, pos
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_container(path: str, schema: dict, records: list[dict],
                    codec: str = "deflate",
                    sync: bytes = b"\x00" * 16) -> None:
    """Write an Avro object container file (one block).  ``sync`` is
    deterministic by default — metadata files must be reproducible."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec}")
    names = _Names()
    body = bytearray()
    for r in records:
        _encode(body, schema, r, names)
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _encode(out, "string", k, names)
        write_long(out, len(v))
        out += v
    write_long(out, 0)
    out += sync
    write_long(out, len(records))
    write_long(out, len(payload))
    out += payload
    out += sync
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(out)


def read_container(path_or_bytes) -> tuple[dict, list[dict]]:
    """Read an Avro object container file -> (schema, records)."""
    buf = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
           else open(path_or_bytes, "rb").read())
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    names = _Names()
    pos = 4
    meta = {}
    while True:
        cnt, pos = read_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _, pos = read_long(buf, pos)
        for _ in range(cnt):
            k, pos = _decode(buf, pos, "string", names)
            ln, pos = read_long(buf, pos)
            meta[k] = bytes(buf[pos: pos + ln])
            pos += ln
    sync = bytes(buf[pos: pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records = []
    while pos < len(buf):
        cnt, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        block = bytes(buf[pos: pos + size])
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec}")
        bpos = 0
        for _ in range(cnt):
            rec, bpos = _decode(block, bpos, schema, names)
            records.append(rec)
        if bytes(buf[pos: pos + 16]) != sync:
            raise ValueError("avro sync marker mismatch")
        pos += 16
    return schema, records
