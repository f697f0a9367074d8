"""Avro Object Container File (OCF) — pure-Python reader/writer.

The FILE half of the Avro surface (reference anchor: the deployed
stack's S3-sink/source connectors exchange `.avro` container files;
`avro_wire.py` owns the Kafka WIRE framing — magic byte + schema-id +
binary body). Implemented from the public Avro 1.11 spec
(spec.html#Object+Container+Files):

    magic  b'Obj\\x01'
    metadata map: avro.schema (JSON), avro.codec ('null' here)
    16-byte sync marker
    blocks: [record count: zigzag long][serialized size: zigzag long]
            [records][sync marker] ... repeated

Codec support is `null` (uncompressed) — deflate is a one-line
extension but the fixture corpus gains nothing from it and the
cross-engine byte contract stays simpler uncompressed.

The sync marker is derived deterministically (md5 of the schema JSON)
instead of random: the spec only requires the 16 bytes be consistent
within a file, and determinism keeps whole-file bytes replayable for
the hash-checked roundtrip query.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Iterable, Iterator

from .avro_codec import _zigzag_decode, _zigzag_encode, decode, encode

MAGIC = b"Obj\x01"


def _sync_marker(schema_json: str) -> bytes:
    return hashlib.md5(schema_json.encode()).digest()


def _encode_meta(meta: dict[str, bytes], out: bytearray) -> None:
    # avro map<bytes>: one block of len(meta) entries, then end-of-map 0
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        encode(k, "string", out)
        encode(v, "bytes", out)
    out += _zigzag_encode(0)


def write_ocf(
    records: Iterable[dict], schema: dict | str, *, block_records: int = 1000
) -> bytes:
    """Serialize ``records`` into one OCF byte string (header + blocks).
    Streaming-friendly: blocks close every ``block_records`` records so
    a reader can skip/split on sync markers without decoding bodies."""
    schema_json = json.dumps(schema, sort_keys=True) if isinstance(schema, dict) else schema
    sync = _sync_marker(schema_json)
    out = bytearray(MAGIC)
    _encode_meta(
        {"avro.schema": schema_json.encode(), "avro.codec": b"null"}, out
    )
    out += sync

    # parse the (canonicalized) schema ONCE — encode() takes the parsed
    # form, and re-parsing per record would cost one json.loads per row
    parsed_schema = json.loads(schema_json)
    block = bytearray()
    n_in_block = 0
    for rec in records:
        encode(rec, parsed_schema, block)
        n_in_block += 1
        if n_in_block >= block_records:
            out += _zigzag_encode(n_in_block)
            out += _zigzag_encode(len(block))
            out += block
            out += sync
            block = bytearray()
            n_in_block = 0
    if n_in_block:
        out += _zigzag_encode(n_in_block)
        out += _zigzag_encode(len(block))
        out += block
        out += sync
    return bytes(out)


def _decode_meta(buf: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            k, pos = decode(buf, pos, "string")
            v, pos = decode(buf, pos, "bytes")
            meta[k] = v
    return meta, pos


def read_ocf(buf: bytes) -> tuple[list[dict], dict]:
    """Parse one OCF byte string → (records, writer schema). Validates
    the magic and every block's sync marker (a mismatched marker means
    a torn/corrupt block boundary — fail loudly, never resync
    silently)."""
    if buf[:4] != MAGIC:
        raise ValueError(f"not an Avro OCF: magic {buf[:4]!r}")
    meta, pos = _decode_meta(buf, 4)
    codec = meta.get("avro.codec", b"null").decode()
    if codec != "null":
        raise NotImplementedError(f"OCF codec {codec!r} not supported (null only)")
    schema = json.loads(meta["avro.schema"])
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        end = pos + size
        for _ in range(n):
            rec, pos = decode(buf, pos, schema)
            records.append(rec)
        if pos != end:
            raise ValueError(f"block body over/under-read: at {pos}, expected {end}")
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — torn or corrupt block")
        pos += 16
    return records, schema


def iter_ocf(buf: bytes) -> Iterator[dict]:
    records, _ = read_ocf(buf)
    yield from records
