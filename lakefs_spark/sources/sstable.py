"""Pebble/RocksDB SSTable reader — the migration path from a real
lakeFS repository.

lakeFS stores committed metadata as Pebble SSTables (block-based
tables): one SSTable per range holding ``key → Value{identity, Entry
proto}`` records, plus one metarange SSTable per commit holding
``max_key → Value{range_id, RangeData proto}`` rows
(pkg/graveler/sstable/writer.go:48-147 writes them;
clients/spark/src/main/scala/io/treeverse/jpebble/BlockParser.scala is
the reference's own JVM reader of the same format). This engine's
native manifests are Parquet, so adopting it from a live lakeFS repo
needs exactly one bridge: parse the repo's existing ``.sst`` objects
into entry rows once, then import. This module is that bridge,
implemented from the public RocksDB BlockBasedTable format
(https://github.com/facebook/rocksdb/wiki/Rocksdb-BlockBasedTable-Format)
and the lakeFS value codec (pkg/graveler/committed/value.go:25-54) —
no code is taken from either.

Layout parsed here (the subset lakeFS writes: format v2, crc32c,
snappy or no compression, single- or two-level index):

- footer: last 53 bytes = [checksum_type 1B][metaindex BlockHandle]
  [index BlockHandle][padding][version 4B][magic
  ``f7 cf f4 85 b7 41 e2 88`` 8B]; BlockHandle = (offset, size) as
  unsigned varints.
- each block = payload + 5-byte trailer (compression type byte +
  crc32c over payload+type, mixed with RocksDB's mask
  ``rot17(crc) + 0xa282ead8``).
- block payload = prefix-compressed entries (shared/unshared/value-len
  varints) with a restart array (num_restarts at the tail).
- record keys are InternalKeys: user key + 8 trailer bytes (seqnum +
  kind) — stripped, lakeFS tables are immutable.
- record values are graveler Values: zigzag-varint-length-prefixed
  identity then data; data is a ``catalog.Entry`` (ranges) or
  ``committed.RangeData`` (metaranges) protobuf.

Scale: the driver parses exactly one metarange (a manifest, ~MBs);
the per-range SSTables — the 100 TB side — parse EXECUTOR-side via
names-sharded ``mapInPandas`` over a :class:`RangeFS`
(:func:`sst_entries_df_fs`), so a million-range migration distributes
like any other scan. (NOT ``binaryFile``: Spark packs small files
into ~maxPartitionBytes partitions, collapsing the parse parallelism
— see :func:`sst_entries_df_fs`'s docstring.)
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Iterator

FOOTER_LEN = 53  # checksum byte + 2 max-len handles + version + magic
MAGIC = bytes((0xF7, 0xCF, 0xF4, 0x85, 0xB7, 0x41, 0xE2, 0x88))
BLOCK_TRAILER_LEN = 5  # compression type + crc32
COMPRESSION_NONE = 0
COMPRESSION_SNAPPY = 1
CHECKSUM_CRC32C = 1
INDEX_TYPE_KEY = b"rocksdb.block.based.table.index.type"
INDEX_TYPE_TWO_LEVEL = 2


class BadSSTable(ValueError):
    """Not a (supported) Pebble/RocksDB block-based table."""


# ---------------------------------------------------------------------------
# crc32c (Castagnoli, reflected poly 0x82F63B78) — no stdlib impl
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)

# slicing-by-8 (Intel's technique): 8 derived tables let the hot loop
# consume 8 bytes per iteration — ~4x faster in pure Python, which
# matters because every 4 KiB block is checksummed on both the write
# and the read path of a migration
_CRC8_TABLES = [_CRC32C_TABLE]
for _k in range(7):
    _prev = _CRC8_TABLES[-1]
    _CRC8_TABLES.append(
        [_CRC32C_TABLE[_prev[_i] & 0xFF] ^ (_prev[_i] >> 8) for _i in range(256)]
    )
_T0, _T1, _T2, _T3, _T4, _T5, _T6, _T7 = _CRC8_TABLES


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    n = len(data)
    i = 0
    end8 = n - (n % 8)
    while i < end8:
        crc ^= data[i] | data[i + 1] << 8 | data[i + 2] << 16 | data[i + 3] << 24
        crc = (
            _T7[crc & 0xFF]
            ^ _T6[(crc >> 8) & 0xFF]
            ^ _T5[(crc >> 16) & 0xFF]
            ^ _T4[(crc >> 24) & 0xFF]
            ^ _T3[data[i + 4]]
            ^ _T2[data[i + 5]]
            ^ _T1[data[i + 6]]
            ^ _T0[data[i + 7]]
        )
        i += 8
    while i < n:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ data[i]) & 0xFF]
        i += 1
    return crc ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    # RocksDB stores CRCs inside later-checksummed data; masking keeps
    # nested CRCs honest (format requirement, BlockParser fixupCRC)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------


def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    try:  # single-byte fast path (the common case by far)
        b = buf[pos]
    except IndexError:
        raise BadSSTable("truncated varint") from None
    if b < 0x80:
        return b, pos + 1
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise BadSSTable("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise BadSSTable("varint too long")


def read_svarint(buf: bytes, pos: int) -> tuple[int, int]:
    # Go binary.PutVarint zigzag encoding (value.go varintBytes)
    raw, pos = read_uvarint(buf, pos)
    return (raw >> 1) ^ -(raw & 1), pos


# ---------------------------------------------------------------------------
# block-level parsing
# ---------------------------------------------------------------------------


def _snappy_decompress(data: bytes) -> bytes:
    # raw-snappy's first varint is the uncompressed length; pyarrow's
    # snappy codec needs it passed explicitly
    n, _ = read_uvarint(data, 0)
    try:
        import pyarrow as pa

        return bytes(pa.Codec("snappy").decompress(data, decompressed_size=n))
    except ImportError as e:  # pragma: no cover — pyarrow is baked in
        raise BadSSTable(f"snappy block but no codec available: {e}") from None


def _snappy_compress(data: bytes) -> bytes:
    import pyarrow as pa

    return pa.Codec("snappy").compress(data, asbytes=True)


def _read_block(buf: bytes, offset: int, size: int) -> bytes:
    """Verify + decompress the block at BlockHandle(offset, size)."""
    end = offset + size + BLOCK_TRAILER_LEN
    if end > len(buf):
        raise BadSSTable(f"block [{offset}+{size}] past EOF {len(buf)}")
    payload = buf[offset : offset + size]
    ctype = buf[offset + size]
    stored = struct.unpack("<I", buf[offset + size + 1 : end])[0]
    computed = _mask_crc(crc32c(buf[offset : offset + size + 1]))
    if stored != computed:
        raise BadSSTable(
            f"block crc mismatch at {offset}: {computed:08x} != {stored:08x}"
        )
    if ctype == COMPRESSION_NONE:
        return payload
    if ctype == COMPRESSION_SNAPPY:
        return _snappy_decompress(payload)
    raise BadSSTable(f"unsupported compression type {ctype}")


def _iter_block_entries(block: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Prefix-compressed (key, value) pairs of one data/index block."""
    if len(block) < 4:
        raise BadSSTable("block too short for restart count")
    (num_restarts,) = struct.unpack("<I", block[-4:])
    body_end = len(block) - 4 * (num_restarts + 1)
    if body_end < 0:
        raise BadSSTable("restart array larger than block")
    pos = 0
    key = b""
    while pos < body_end:
        shared, pos = read_uvarint(block, pos)
        unshared, pos = read_uvarint(block, pos)
        vlen, pos = read_uvarint(block, pos)
        if shared > len(key) or pos + unshared + vlen > body_end:
            raise BadSSTable("corrupt block entry")
        key = key[:shared] + block[pos : pos + unshared]
        pos += unshared
        value = block[pos : pos + vlen]
        pos += vlen
        yield key, value


@dataclass
class _Footer:
    metaindex: tuple[int, int]
    index: tuple[int, int]
    checksum_type: int


def _read_footer(buf: bytes) -> _Footer:
    if len(buf) < FOOTER_LEN:
        raise BadSSTable(f"file of {len(buf)} bytes has no footer")
    if buf[-len(MAGIC):] != MAGIC:
        raise BadSSTable(
            "bad magic (not a Pebble non-legacy block-based table): "
            + buf[-len(MAGIC):].hex()
        )
    footer = buf[-FOOTER_LEN:]
    checksum_type = footer[0]
    if checksum_type != CHECKSUM_CRC32C:
        raise BadSSTable(f"unsupported checksum type {checksum_type}")
    pos = 1
    mi_off, pos = read_uvarint(footer, pos)
    mi_size, pos = read_uvarint(footer, pos)
    ix_off, pos = read_uvarint(footer, pos)
    ix_size, pos = read_uvarint(footer, pos)
    return _Footer((mi_off, mi_size), (ix_off, ix_size), checksum_type)


def read_properties(buf: bytes) -> dict[bytes, bytes]:
    """The table's property block (incl. lakeFS's static collector
    metadata: type, min_key, max_key, count, estimated_size)."""
    footer = _read_footer(buf)
    metaindex = dict(_iter_block_entries(_read_block(buf, *footer.metaindex)))
    bh = metaindex.get(b"rocksdb.properties")
    if bh is None:
        return {}
    off, pos = read_uvarint(bh, 0)
    size, _ = read_uvarint(bh, pos)
    return dict(_iter_block_entries(_read_block(buf, off, size)))


def iter_raw_entries(buf: bytes) -> Iterator[tuple[bytes, bytes]]:
    """All (user_key, raw_value) records of an SSTable, in key order.
    Handles single- and two-level indexes; filter/bloom blocks are
    never touched (full-scan reader)."""
    footer = _read_footer(buf)
    props = read_properties(buf)
    two_level = False
    itype = props.get(INDEX_TYPE_KEY)
    if itype is not None and len(itype) >= 4:
        two_level = struct.unpack("<I", itype[:4])[0] == INDEX_TYPE_TWO_LEVEL

    def _handles(block: bytes) -> Iterator[tuple[int, int]]:
        for _key, value in _iter_block_entries(block):
            off, pos = read_uvarint(value, 0)
            size, _pos = read_uvarint(value, pos)
            yield off, size

    index_block = _read_block(buf, *footer.index)
    if two_level:
        data_handles = (
            h
            for top in _handles(index_block)
            for h in _handles(_read_block(buf, *top))
        )
    else:
        data_handles = _handles(index_block)

    for off, size in data_handles:
        for ikey, value in _iter_block_entries(_read_block(buf, off, size)):
            if len(ikey) < 8:
                raise BadSSTable(f"internal key shorter than trailer: {ikey!r}")
            # strip the 8-byte InternalKey trailer (seqnum+kind) —
            # lakeFS tables are immutable, user key is the first part
            yield ikey[:-8], value


# ---------------------------------------------------------------------------
# graveler value codec + minimal proto decode
# ---------------------------------------------------------------------------


def split_graveler_value(value: bytes) -> tuple[bytes, bytes]:
    """value.go MarshalValue: |len(identity)|identity|len(data)|data|
    with SIGNED (zigzag) varint lengths; trailing bytes ignored."""
    ilen, pos = read_svarint(value, 0)
    if ilen < 0 or pos + ilen > len(value):
        raise BadSSTable(f"bad identity length {ilen}")
    identity = value[pos : pos + ilen]
    pos += ilen
    dlen, pos = read_svarint(value, pos)
    if dlen < 0 or pos + dlen > len(value):
        raise BadSSTable(f"bad data length {dlen}")
    return identity, value[pos : pos + dlen]


def _iter_proto_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """(field_number, wire_type, value) triples of one message."""
    pos = 0
    while pos < len(buf):
        tag, pos = read_uvarint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = read_uvarint(buf, pos)
        elif wire == 1:  # 64-bit
            if pos + 8 > len(buf):
                raise BadSSTable("truncated 64-bit proto field")
            val = struct.unpack("<Q", buf[pos : pos + 8])[0]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = read_uvarint(buf, pos)
            if pos + ln > len(buf):
                raise BadSSTable("truncated length-delimited proto field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            if pos + 4 > len(buf):
                raise BadSSTable("truncated 32-bit proto field")
            val = struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
        else:
            raise BadSSTable(f"unsupported proto wire type {wire}")
        yield field, wire, val


def _want_wire(field: int, wire: int, expected: int) -> None:
    # a known field arriving with the wrong wire type is a malformed
    # message — fail typed, never duck-type into a wrong decode (an
    # int has no .decode; worse, bytes where an int is expected would
    # decode to garbage silently)
    if wire != expected:
        raise BadSSTable(
            f"proto field {field}: wire type {wire}, expected {expected}"
        )


def _sint64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_entry_proto(data: bytes) -> dict:
    """catalog.Entry (pkg/catalog/catalog.proto:10-26) → plain dict."""
    out = {
        "address": "",
        "last_modified_s": None,
        "last_modified_ns": 0,
        "size": 0,
        "etag": "",
        "metadata": {},
        "address_type": 0,
        "content_type": "",
    }
    for field, wire, val in _iter_proto_fields(data):
        if field == 1:
            _want_wire(field, wire, 2)
            out["address"] = val.decode("utf-8", "replace")
        elif field == 2:  # google.protobuf.Timestamp {1: seconds, 2: nanos}
            _want_wire(field, wire, 2)
            secs, nanos = 0, 0
            for f2, w2, v2 in _iter_proto_fields(val):
                if f2 == 1:
                    _want_wire(f2, w2, 0)
                    secs = _sint64(v2)
                elif f2 == 2:
                    _want_wire(f2, w2, 0)
                    nanos = _sint64(v2)
            out["last_modified_s"] = secs
            out["last_modified_ns"] = nanos
        elif field == 3:
            _want_wire(field, wire, 0)
            out["size"] = _sint64(val)
        elif field == 4:
            _want_wire(field, wire, 2)
            out["etag"] = val.decode("utf-8", "replace")
        elif field == 5:  # map<string,string> entry {1: key, 2: value}
            _want_wire(field, wire, 2)
            k = v = ""
            for f2, w2, v2 in _iter_proto_fields(val):
                if f2 == 1:
                    _want_wire(f2, w2, 2)
                    k = v2.decode("utf-8", "replace")
                elif f2 == 2:
                    _want_wire(f2, w2, 2)
                    v = v2.decode("utf-8", "replace")
            out["metadata"][k] = v
        elif field == 6:
            _want_wire(field, wire, 0)
            out["address_type"] = val
        elif field == 7:
            _want_wire(field, wire, 2)
            out["content_type"] = val.decode("utf-8", "replace")
    return out


def decode_range_proto(data: bytes) -> dict:
    """committed.RangeData (committed.proto:6-12) → plain dict."""
    out = {"min_key": b"", "max_key": b"", "estimated_size": 0, "count": 0}
    for field, wire, val in _iter_proto_fields(data):
        if field == 1:
            _want_wire(field, wire, 2)
            out["min_key"] = val
        elif field == 2:
            _want_wire(field, wire, 2)
            out["max_key"] = val
        elif field == 3:
            _want_wire(field, wire, 0)
            out["estimated_size"] = val
        elif field == 4:
            _want_wire(field, wire, 0)
            out["count"] = _sint64(val)
    return out


_ADDRESS_TYPES = {0: "BY_PREFIX_DEPRECATED", 1: "RELATIVE", 2: "FULL"}


def read_range_sstable(buf: bytes) -> list[dict]:
    """A lakeFS range SSTable → entry dicts (ENTRY_SCHEMA-shaped,
    identity as lowercase hex like the rest of the engine)."""
    rows = []
    for key, value in iter_raw_entries(buf):
        identity, data = split_graveler_value(value)
        e = decode_entry_proto(data)
        rows.append(
            {
                "key": key.decode("utf-8", "replace"),
                "identity": identity.hex(),
                "address": e["address"],
                "address_type": _ADDRESS_TYPES.get(e["address_type"], "FULL"),
                "size": e["size"],
                "etag": e["etag"],
                "last_modified_s": e["last_modified_s"],
                "last_modified_ns": e["last_modified_ns"],
                "metadata": e["metadata"] or None,
                "content_type": e["content_type"] or None,
            }
        )
    return rows


def read_metarange_sstable(buf: bytes) -> list[dict]:
    """A lakeFS metarange SSTable → range descriptors. The record key
    is the range's max key; the identity bytes ARE the range id (an
    ascii hex string in lakeFS)."""
    rows = []
    for key, value in iter_raw_entries(buf):
        identity, data = split_graveler_value(value)
        r = decode_range_proto(data)
        rows.append(
            {
                "range_id": identity.decode("ascii", "replace"),
                "key": key.decode("utf-8", "replace"),
                "min_key": r["min_key"].decode("utf-8", "replace"),
                "max_key": (r["max_key"] or key).decode("utf-8", "replace"),
                "estimated_size": r["estimated_size"],
                "count": r["count"],
            }
        )
    return rows


def read_file(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# Spark plane: distributed range parsing + migration
# ---------------------------------------------------------------------------


def sst_entries_df(spark, paths):
    """Entries DataFrame from lakeFS range SSTables at explicit PATHS,
    parsed executor-side via ``binaryFile`` + Arrow-batched
    ``mapInPandas``. Convenient for ad-hoc path-based reads (driver
    gates, tests); migrations use :func:`sst_entries_df_fs` instead —
    binaryFile's small-file partition packing collapses parallelism
    on many-range repos (see that function's docstring). Output
    matches ENTRY_SCHEMA."""
    import pandas as pd

    from lakefs_spark.schema import ENTRY_SCHEMA

    if isinstance(paths, str):
        paths = [paths]

    files = spark.read.format("binaryFile").load(paths)

    def _decode(batches):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                for e in read_range_sstable(bytes(content)):
                    ts = e.pop("last_modified_s")
                    # `is not None`: epoch 0 is a PRESENT timestamp
                    e["last_modified"] = (
                        pd.Timestamp(ts, unit="s") if ts is not None else None
                    )
                    out.append(e)
            cols = [f.name for f in ENTRY_SCHEMA.fields]
            yield (
                pd.DataFrame(out, columns=cols)
                if out
                else pd.DataFrame(columns=cols)
            )

    return files.select("content").mapInPandas(_decode, ENTRY_SCHEMA)


# ---------------------------------------------------------------------------
# writer: export THIS engine's snapshots AS lakeFS SSTables
# ---------------------------------------------------------------------------
#
# The reverse migration: write Pebble/RocksDB block-based tables the
# reference (and this module's reader) can read, with range IDs derived
# by the reference's EXACT ident protocol (pkg/graveler/sstable/
# writer.go WriteRecord/Close + pkg/ident/ident.go MarshalStringMap) —
# pinned against the golden fixtures: re-deriving range.sst's ID from
# its records yields precisely the ID metarange.sst references
# (tests/test_sstable.py::test_range_id_derivation_matches_reference).

RESTART_INTERVAL = 16
TARGET_BLOCK_SIZE = 4096
# switch to a partitioned (two-level) index past this estimated
# single-level index payload size — Pebble does the same for large
# tables; one giant index block on a multi-million-range metarange
# would otherwise have to be decoded whole before the first entry
INDEX_TWO_LEVEL_THRESHOLD = 4 * 1024 * 1024
FOOTER_VERSION = 2  # RocksDBv2, what the fixtures carry
INTERNAL_SET_TRAILER = bytes([1, 0, 0, 0, 0, 0, 0, 0])  # seq 0, kind SET


def write_uvarint(n: int) -> bytes:
    if n < 0x80:  # the overwhelmingly common case (lens, small offsets)
        return bytes((n,))
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_svarint(n: int) -> bytes:
    # Go binary.PutVarint zigzag
    return write_uvarint((n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


def build_graveler_value(identity: bytes, data: bytes) -> bytes:
    """value.go MarshalValue: |len|identity|len|data| (zigzag lens)."""
    return (
        write_svarint(len(identity))
        + identity
        + write_svarint(len(data))
        + data
    )


def _proto_tag(field: int, wire: int) -> bytes:
    return write_uvarint(field << 3 | wire)


def _proto_bytes(field: int, b: bytes) -> bytes:
    return _proto_tag(field, 2) + write_uvarint(len(b)) + b


def _proto_varint(field: int, v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # proto int64 two's complement
    return _proto_tag(field, 0) + write_uvarint(v)


def encode_entry_proto(e: dict) -> bytes:
    """catalog.Entry, proto3 canonical form (tag order, defaults
    omitted) — round-trips decode_entry_proto byte-exactly on the
    golden fixtures."""
    out = bytearray()
    if e.get("address"):
        out += _proto_bytes(1, e["address"].encode("utf-8"))
    lm = e.get("last_modified_s")
    lm_ns = e.get("last_modified_ns") or 0
    if lm is not None or lm_ns:
        # presence-tracked: a present-but-zero Timestamp (epoch 0) is
        # emitted as the empty nested message, exactly like Go's
        # marshaler (inner zero fields omitted, field 2 present)
        ts = b""
        if lm:
            ts += _proto_varint(1, int(lm))
        if lm_ns:
            ts += _proto_varint(2, int(lm_ns))
        out += _proto_bytes(2, ts)
    if e.get("size"):
        out += _proto_varint(3, int(e["size"]))
    if e.get("etag"):
        out += _proto_bytes(4, e["etag"].encode("utf-8"))
    for k in sorted(e.get("metadata") or {}):
        v = (e["metadata"] or {})[k]
        entry = _proto_bytes(1, k.encode("utf-8")) + _proto_bytes(
            2, str(v).encode("utf-8")
        )
        out += _proto_bytes(5, entry)
    at = e.get("address_type", 0)
    if isinstance(at, str):
        at = {"BY_PREFIX_DEPRECATED": 0, "RELATIVE": 1, "FULL": 2}.get(at, 2)
    if at:
        out += _proto_varint(6, at)
    if e.get("content_type"):
        out += _proto_bytes(7, e["content_type"].encode("utf-8"))
    return bytes(out)


def encode_range_proto(r: dict) -> bytes:
    """committed.RangeData, proto3 canonical form."""
    out = bytearray()
    mk = r.get("min_key") or b""
    xk = r.get("max_key") or b""
    if isinstance(mk, str):
        mk = mk.encode("utf-8")
    if isinstance(xk, str):
        xk = xk.encode("utf-8")
    if mk:
        out += _proto_bytes(1, mk)
    if xk:
        out += _proto_bytes(2, xk)
    if r.get("estimated_size"):
        out += _proto_varint(3, int(r["estimated_size"]))
    if r.get("count"):
        out += _proto_varint(4, int(r["count"]))
    return bytes(out)


def _build_block(items: list[tuple[bytes, bytes]], restart_interval: int = RESTART_INTERVAL) -> bytes:
    """Prefix-compressed block payload + restart array."""
    out = bytearray()
    restarts = []
    prev = b""
    for i, (key, value) in enumerate(items):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            for a, b in zip(prev, key):
                if a != b:
                    break
                shared += 1
        out += write_uvarint(shared)
        out += write_uvarint(len(key) - shared)
        out += write_uvarint(len(value))
        out += key[shared:]
        out += value
        prev = key
    for r in restarts or [0]:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts) or 1)
    return bytes(out)


class SSTableBuilder:
    """Minimal block-based-table writer: Snappy-compressed blocks by
    default — what lakeFS itself writes (sstable.SnappyCompression,
    pkg/graveler/sstable/writer.go:48-51) — with per-block fallback to
    uncompressed when compression doesn't shrink (Pebble's own rule),
    and ``compression=COMPRESSION_NONE`` as an escape hatch (also a
    valid table the reference reads fine). crc32c trailers,
    single-level index, RocksDBv2 footer."""

    def __init__(self, compression: int = COMPRESSION_SNAPPY):
        self._out = bytearray()
        self._data_items: list[tuple[bytes, bytes]] = []
        self._block_bytes = 0
        self._index: list[tuple[bytes, bytes]] = []
        self._last_key = b""
        self._compression = compression

    def _emit_block(self, payload: bytes) -> tuple[int, int]:
        ctype = COMPRESSION_NONE
        if self._compression == COMPRESSION_SNAPPY:
            comp = _snappy_compress(payload)
            if len(comp) < len(payload):
                payload, ctype = comp, COMPRESSION_SNAPPY
        off = len(self._out)
        self._out += payload
        self._out.append(ctype)
        crc = _mask_crc(crc32c(payload + bytes([ctype])))
        self._out += struct.pack("<I", crc)
        return off, len(payload)

    def _flush_data_block(self) -> None:
        if not self._data_items:
            return
        off, size = self._emit_block(_build_block(self._data_items))
        handle = write_uvarint(off) + write_uvarint(size)
        # index key = the block's last internal key (a valid separator:
        # >= every key in the block, < the next block's first)
        self._index.append((self._data_items[-1][0], handle))
        self._data_items = []
        self._block_bytes = 0

    def add(self, user_key: bytes, value: bytes) -> None:
        if user_key <= self._last_key and self._last_key:
            raise ValueError(
                f"keys must be strictly ascending: {user_key!r} after "
                f"{self._last_key!r}"
            )
        self._last_key = user_key
        self._data_items.append((user_key + INTERNAL_SET_TRAILER, value))
        # running size, not a re-sum per add (that was O(block²))
        self._block_bytes += len(user_key) + 8 + len(value) + 6
        if self._block_bytes >= TARGET_BLOCK_SIZE:
            self._flush_data_block()

    def finish(self, properties: dict[bytes, bytes]) -> bytes:
        self._flush_data_block()
        # Pebble partitions the index of large tables (two-level); a
        # multi-million-range metarange would otherwise make one giant
        # index block. Estimate the single-level payload size (same
        # per-entry arithmetic as add()'s block accounting) and switch
        # above the threshold.
        est_index = sum(len(k) + len(h) + 6 for k, h in self._index)
        if est_index <= INDEX_TWO_LEVEL_THRESHOLD:
            index_type = 0
            index_off, index_size = self._emit_block(
                _build_block(self._index, restart_interval=1)
            )
        else:
            index_type = INDEX_TYPE_TWO_LEVEL
            top: list[tuple[bytes, bytes]] = []
            part: list[tuple[bytes, bytes]] = []
            part_bytes = 0

            def _flush_part() -> None:
                nonlocal part, part_bytes
                if not part:
                    return
                off, size = self._emit_block(
                    _build_block(part, restart_interval=1)
                )
                top.append(
                    (part[-1][0], write_uvarint(off) + write_uvarint(size))
                )
                part, part_bytes = [], 0

            for key, handle in self._index:
                part.append((key, handle))
                part_bytes += len(key) + len(handle) + 6
                if part_bytes >= TARGET_BLOCK_SIZE:
                    _flush_part()
            _flush_part()
            index_off, index_size = self._emit_block(
                _build_block(top, restart_interval=1)
            )
        props = dict(properties)
        props.setdefault(INDEX_TYPE_KEY, struct.pack("<I", index_type))
        props_off, props_size = self._emit_block(
            _build_block(sorted(props.items()), restart_interval=1)
        )
        meta_items = [
            (
                b"rocksdb.properties",
                write_uvarint(props_off) + write_uvarint(props_size),
            )
        ]
        mi_off, mi_size = self._emit_block(
            _build_block(meta_items, restart_interval=1)
        )
        footer = bytearray([CHECKSUM_CRC32C])
        footer += write_uvarint(mi_off) + write_uvarint(mi_size)
        footer += write_uvarint(index_off) + write_uvarint(index_size)
        footer += bytes(41 - len(footer))  # pad handles area to 40 bytes
        footer += struct.pack("<I", FOOTER_VERSION)
        footer += MAGIC
        assert len(footer) == FOOTER_LEN
        self._out += footer
        return bytes(self._out)


def _ident_string_map(h, props: dict[bytes, bytes]) -> None:
    """pkg/ident/ident.go MarshalStringMap over the writer's metadata —
    byte-verified against the golden fixtures (re-deriving range.sst's
    records yields exactly the range id metarange.sst references)."""

    def mstring(s: bytes) -> None:
        h.update(bytes([1]))  # AddressTypeString
        h.update(bytes([2, 8]))  # MarshalInt64: type tag + length byte
        h.update(len(s).to_bytes(8, "big"))
        h.update(s)

    h.update(bytes([4]))  # AddressTypeStringMap
    h.update(bytes([2, 8]))
    h.update(len(props).to_bytes(8, "big"))
    for k in sorted(props):
        mstring(k)
        mstring(props[k])


def derive_table_id(records: list[tuple[bytes, bytes]], metadata: dict[bytes, bytes]) -> str:
    """writer.go WriteRecord/writeHashWithLen + Close: sha256 over
    'len|key|len|value' per record then MarshalStringMap(constructor
    metadata). The CONTENT ADDRESS lakeFS itself would assign."""
    import hashlib

    h = hashlib.sha256()
    for key, value in records:
        for buf in (key, value):
            h.update(str(len(buf)).encode())
            h.update(buf)
            h.update(b"|")
    _ident_string_map(h, metadata)
    return h.hexdigest()


def _lakefs_props(kind: bytes, records, estimated_size: int) -> dict[bytes, bytes]:
    return {
        b"type": kind,
        b"min_key": records[0][0] if records else b"",
        b"max_key": records[-1][0] if records else b"",
        b"count": str(len(records)).encode(),
        b"estimated_size_bytes": str(estimated_size).encode(),
    }


def _encode_entry_record(e: dict) -> tuple[bytes, bytes]:
    """One entry row (ENTRY_SCHEMA-shaped dict) → a (key,
    graveler-value) record pair — the byte form whose length drives
    range splitting and whose content derives the lakeFS range id."""
    import re as _re

    # deterministic boundary: ONLY canonical lowercase even-length
    # hex takes the hex path (bytes.fromhex alone also accepts
    # uppercase and internal whitespace, which would mutate such
    # identities on a round-trip); everything else is a foreign
    # identity and exports as its utf-8 bytes — valid for lakeFS
    # (Identity is raw bytes), though a re-IMPORT through our
    # reader renders it as hex
    if _re.fullmatch(r"(?:[0-9a-f]{2})+", e["identity"] or ""):
        ident = bytes.fromhex(e["identity"])
    else:
        ident = e["identity"].encode("utf-8")
    lm = e.get("last_modified_s")
    lmv = e.get("last_modified")
    # NaT-safe: pandas NaT is not None but NaT != NaT
    if lm is None and lmv is not None and lmv == lmv:
        import calendar

        lm = calendar.timegm(lmv.timetuple())
    data = encode_entry_proto({**e, "last_modified_s": lm})
    return e["key"].encode("utf-8"), build_graveler_value(ident, data)


def encode_entry_records(entries: list[dict]) -> list[tuple[bytes, bytes]]:
    """Entry rows → (key, graveler-value) record pairs."""
    return [_encode_entry_record(e) for e in entries]


def write_range_records(
    records: list[tuple[bytes, bytes]], *, compression: int = COMPRESSION_SNAPPY
) -> tuple[bytes, str, dict]:
    """Pre-encoded (key, value) records (sorted, non-empty) → a lakeFS
    range SSTable. Returns (bytes, range_id, RangeData-shaped dict)."""
    if not records:
        raise ValueError("cannot write an empty range")
    est = sum(len(k) + len(v) for k, v in records)
    rid = derive_table_id(records, {b"type": b"ranges"})
    builder = SSTableBuilder(compression)
    for k, v in records:
        builder.add(k, v)
    buf = builder.finish(_lakefs_props(b"ranges", records, est))
    rd = {
        "range_id": rid,
        "min_key": records[0][0].decode("utf-8", "replace"),
        "max_key": records[-1][0].decode("utf-8", "replace"),
        "estimated_size": est,
        "count": len(records),
    }
    return buf, rid, rd


def write_range_sstable(
    entries: list[dict], *, compression: int = COMPRESSION_SNAPPY
) -> tuple[bytes, str, dict]:
    """Entry rows (ENTRY_SCHEMA-shaped dicts, sorted by key) → a lakeFS
    range SSTable. Returns (bytes, range_id, RangeData-shaped dict)."""
    return write_range_records(
        encode_entry_records(entries), compression=compression
    )


def write_metarange_sstable(
    ranges: list[dict], *, compression: int = COMPRESSION_SNAPPY
) -> tuple[bytes, str]:
    """Range descriptors (write_range_sstable's dicts, in key order) →
    a lakeFS metarange SSTable. Returns (bytes, metarange_id). An
    EMPTY descriptor list is valid — a commit whose tree is empty (all
    keys deleted) has a metarange with zero ranges in the reference
    too, and such chains must export/round-trip."""
    records = []
    for r in ranges:
        data = encode_range_proto(r)
        records.append(
            (
                r["max_key"].encode("utf-8"),
                build_graveler_value(r["range_id"].encode("ascii"), data),
            )
        )
    est = sum(len(k) + len(v) for k, v in records)
    mid = derive_table_id(records, {b"type": b"metaranges"})
    builder = SSTableBuilder(compression)
    for k, v in records:
        builder.add(k, v)
    buf = builder.finish(_lakefs_props(b"metaranges", records, est))
    return buf, mid




# ---------------------------------------------------------------------------
# RangeFS: where exported range/metarange SSTables live
# ---------------------------------------------------------------------------
#
# Every byte of range content written or read by an EXECUTOR task goes
# through one of these objects — never a bare `open()` on a path the
# driver happened to have (on a real cluster with node-local disks that
# silently scatters ranges across machines). Implementations must be
# PICKLABLE: write/read/exists run inside tasks.


class RangeFS:
    """Content-addressed .sst storage seam.

    ``write`` is put-if-absent: an existing name wins (same bytes by
    construction — names ARE lakeFS content addresses), which is what
    makes successive exports share unchanged range files."""

    def write(self, name: str, data: bytes) -> bool:
        """Store ``data`` under ``name`` unless present. True if newly
        written, False if the address already existed (reuse hit)."""
        raise NotImplementedError

    def read(self, name: str) -> bytes:
        raise NotImplementedError

    def exists(self, name: str) -> bool:
        raise NotImplementedError

    def spark_paths(self, names: list[str]) -> list[str] | None:
        """Filesystem paths Spark's ``binaryFile`` can scan, or None if
        contents are only reachable through :meth:`read`."""
        return None

    def names(self) -> set[str] | None:
        """The full stored-name set in one call, or None when a single
        listing isn't cheaper than per-name :meth:`exists` probes."""
        return None


class DirRangeFS(RangeFS):
    """A directory visible to driver AND executors (tmpdir under
    local[*]; NFS or a mounted object store on a real cluster — this
    class is exactly the 'shared filesystem required' contract, stated
    once here instead of implied by raw opens in task closures)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, name: str, data: bytes) -> bool:
        os.makedirs(self.root, exist_ok=True)
        dest = self._path(name)
        if os.path.exists(dest):
            return False
        tmp = f"{dest}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, dest)  # atomic; racing writers carry equal bytes
        return True

    def read(self, name: str) -> bytes:
        with open(self._path(name), "rb") as f:
            return f.read()

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def spark_paths(self, names: list[str]) -> list[str]:
        return [self._path(n) for n in names]


class StoreRangeFS(RangeFS):
    """Ranges as content-addressed blobs of any Store driver (Local or
    the S3 conditional store) — the cluster-safe path: executors
    publish through the store API's put-if-absent ``publish_blob``,
    never a bare filesystem path."""

    def __init__(self, store, prefix: str = "sstables"):
        self.store = store
        self.prefix = prefix.strip("/")

    def _rel(self, name: str) -> str:
        return f"{self.prefix}/{name}"

    def write(self, name: str, data: bytes) -> bool:
        import tempfile

        if self.store.blob_exists(self._rel(name)):
            return False
        fd, tmp = tempfile.mkstemp(prefix="sst-")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        self.store.publish_blob(tmp, self._rel(name))
        return True

    def read(self, name: str) -> bytes:
        return self.store.read_blob(self._rel(name))

    def exists(self, name: str) -> bool:
        return self.store.blob_exists(self._rel(name))

    def names(self) -> set[str] | None:
        # one LIST instead of N HEADs — _resolve_names over a
        # million-range metarange must not issue a million round trips
        return set(self.store.list_blobs(self.prefix))


def _as_rangefs(out) -> RangeFS:
    """Coerce a directory path to :class:`DirRangeFS`; pass a RangeFS
    through — every export/migrate entry point takes either."""
    return out if isinstance(out, RangeFS) else DirRangeFS(out)


def _resolve_names(ranges: list[dict], fs: RangeFS) -> list[str]:
    """Locate each referenced range in ``fs`` — bare range id first,
    then the ``.sst``-suffixed form real lakeFS namespaces use. When
    the fs can enumerate itself (store-backed), ONE listing resolves
    every name; otherwise per-name existence probes (local paths)."""
    listed = fs.names()
    if listed is not None:
        have = lambda n: n in listed  # noqa: E731
    else:
        have = fs.exists
    names = []
    for r in ranges:
        name = r["range_id"]
        if not have(name):
            if have(name + ".sst"):
                name += ".sst"
            else:
                raise FileNotFoundError(
                    f"range {r['range_id']} (keys {r['min_key']}.."
                    f"{r['max_key']}) not found in {fs!r}"
                )
        names.append(name)
    return names


def _entries_checked(spark, fs: RangeFS, ranges: list[dict]):
    """Entries DataFrame for metarange descriptors, with the per-range
    descriptor-count cross-check armed (see :func:`_entries_pdf`)."""
    names = _resolve_names(ranges, fs)
    return sst_entries_df_fs(
        spark, fs, names,
        expected_counts={n: r["count"] for n, r in zip(names, ranges)},
    )


def _read_metarange(metarange, fs: RangeFS) -> list[dict]:
    """Metarange descriptors from a filesystem path OR a name in fs."""
    if isinstance(metarange, str) and os.path.isfile(metarange):
        return read_metarange_sstable(read_file(metarange))
    return read_metarange_sstable(fs.read(metarange))


def _entries_pdf(items):
    """Decode an iterable of ``(buf, expected_count, label)`` range-
    SSTable items to ONE pandas frame shaped like ENTRY_SCHEMA.
    ``expected_count`` (when not None) is the row count the metarange
    descriptor promised for this range — cross-checked against the
    rows actually parsed (typed BadSSTable on mismatch), so a
    migration's ``entries_imported`` (the descriptor sum) is verified
    per-range executor-side rather than trusted."""
    import pandas as pd

    from lakefs_spark.schema import ENTRY_SCHEMA

    out = []
    for buf, want, label in items:
        entries = read_range_sstable(bytes(buf))
        if want is not None and len(entries) != want:
            raise BadSSTable(
                f"range {label}: metarange descriptor promises {want} "
                f"entries, table holds {len(entries)}"
            )
        for e in entries:
            ts = e.pop("last_modified_s")
            # `is not None`: epoch 0 is a PRESENT timestamp
            e["last_modified"] = (
                pd.Timestamp(ts, unit="s") if ts is not None else None
            )
            out.append(e)
    cols = [f.name for f in ENTRY_SCHEMA.fields]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def sst_entries_df_fs(spark, fs: RangeFS, names: list[str],
                      expected_counts: dict[str, int] | None = None):
    """Entries DataFrame for named ranges in ``fs``, parsed
    EXECUTOR-side: the (picklable) fs object and the name list ship to
    tasks, which fetch bytes through the seam and decode — the driver
    never holds range contents. ``expected_counts`` (resolved name →
    metarange descriptor count) arms the per-range row-count
    cross-check in :func:`_entries_pdf`.

    Deliberately NOT ``binaryFile`` for directory-backed fs: Spark
    packs small files into ~maxPartitionBytes partitions (a 6 MB .sst
    costs ~10 MB effective with openCost), collapsing a 141-range
    parse to ~11 tasks on 32 cores. Distributing NAMES instead gives
    one task per couple of ranges and skips copying the bytes into
    Spark rows; the RangeFS contract already guarantees executors can
    read (shared dir or store API)."""
    from lakefs_spark.schema import ENTRY_SCHEMA

    if not names:
        return spark.createDataFrame([], ENTRY_SCHEMA)
    par = max(spark.sparkContext.defaultParallelism, 2)
    names_df = spark.createDataFrame(
        [(n,) for n in names], "name string"
    ).repartition(min(len(names), par * 2))
    counts = expected_counts or {}

    def _decode(batches):
        for pdf in batches:
            yield _entries_pdf(
                (fs.read(n), counts.get(n), n) for n in pdf["name"]
            )

    return names_df.mapInPandas(_decode, ENTRY_SCHEMA)


# ---------------------------------------------------------------------------
# export: snapshots → lakeFS SSTables, content-defined range boundaries
# ---------------------------------------------------------------------------

_DESC_COLS = ["range_id", "min_key", "max_key", "estimated_size", "count"]

# Content-defined (hash-rule) chunk sizes are geometric: the LARGEST of
# n chunks runs ~ln(n) times the mean, and one oversized .sst serializes
# a whole executor task on both the build and the re-import parse. A
# level-1 chunk is therefore split on TWO budgets by the reference's
# own greedy accumulator (ShouldBreakAtKey,
# pkg/graveler/sstable/writer.go:168-183): close the range AFTER the
# record that crosses max_range_size_bytes (20 MiB,
# pkg/config/defaults.go:97), or at the row cap (FACTOR x raggedness,
# a parse-cost bound bytes alone can't give when values are tiny).
# The accumulator restarts at every content-defined boundary, so the
# split stays a pure function of that chunk's own sorted records —
# locality (edits elsewhere never move these boundaries) and canonical
# chunking (incremental == full) both survive.
EXPORT_MAX_ROWS_FACTOR = 3
EXPORT_MAX_RANGE_BYTES = 20 * 1024 * 1024  # defaults.go:97


def _desc_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("range_id", T.StringType()),
            T.StructField("min_key", T.StringType()),
            T.StructField("max_key", T.StringType()),
            T.StructField("estimated_size", T.LongType()),
            T.StructField("count", T.LongType()),
        ]
    )


def _write_ranges(entries_df, fs: RangeFS, boundaries: list[str], raggedness: int) -> list[dict]:
    """Chunk a (sub)snapshot by the content-defined boundary rule and
    build .sst files EXECUTOR-side with a STREAMING builder:
    ``assign_chunks`` is a broadcast binary-search (no shuffle), ONE
    shuffle co-locates each chunk (hash of chunk_idx) sorted by key,
    then ``mapInPandas`` streams Arrow batches through a builder whose
    working set is the CURRENT range (~20 MiB), never a whole chunk —
    so a chunk with multi-MB metadata values cannot OOM a task the way
    an applyInPandas group materialization would (the groups here are
    geometric: the largest runs ~ln(n) times the mean). Each closed
    range publishes through the RangeFS put-if-absent write; only
    descriptor rows flow back, and the driver never sees contents.

    In-chunk splitting is the reference's greedy accumulator
    (ShouldBreakAtKey, writer.go:168-183): close AFTER the record that
    crosses EXPORT_MAX_RANGE_BYTES (so a range can exceed the budget
    by at most one record — the reference has the same property), or
    at the row cap; ALWAYS close at a chunk boundary, which restarts
    the accumulator and keeps the split a pure function of the chunk's
    own records (canonical chunking: incremental == full)."""
    from lakefs_spark.plans.chunker import assign_chunks

    chunked = assign_chunks(entries_df, "key", raggedness, boundaries)
    max_rows = raggedness * EXPORT_MAX_ROWS_FACTOR
    spark = entries_df.sparkSession
    par = max(spark.sparkContext.defaultParallelism * 2, 2)
    # chunk_idx is monotone in key, so sorting (chunk_idx, key) within
    # a partition leaves every chunk contiguous and internally ordered
    dist = chunked.repartition(par, "chunk_idx").sortWithinPartitions(
        "chunk_idx", "key"
    )

    def _build_stream(batches):
        import pandas as pd

        cur_chunk = None
        records: list[tuple[bytes, bytes]] = []
        nbytes = 0
        descs: list[dict] = []

        def _close() -> None:
            nonlocal records, nbytes
            if records:
                buf, rid, rd = write_range_records(records)
                fs.write(rid, buf)
                descs.append(rd)
                records, nbytes = [], 0

        for pdf in batches:
            if not len(pdf):
                continue
            chunk_ids = pdf["chunk_idx"].tolist()
            entries = pdf.drop(columns=["chunk_idx"]).to_dict("records")
            for e, ci in zip(entries, chunk_ids):
                if ci != cur_chunk:
                    _close()
                    cur_chunk = ci
                lm = e.get("last_modified")
                e["last_modified_s"] = (
                    None
                    if lm is None or pd.isna(lm)
                    else int(pd.Timestamp(lm).timestamp())
                )
                if not isinstance(e.get("metadata"), dict):
                    e["metadata"] = None
                k, v = _encode_entry_record(e)
                records.append((k, v))
                nbytes += len(k) + len(v)
                if len(records) >= max_rows or nbytes >= EXPORT_MAX_RANGE_BYTES:
                    _close()
        _close()
        yield (
            pd.DataFrame(descs, columns=_DESC_COLS)
            if descs
            else pd.DataFrame(columns=_DESC_COLS)
        )

    descs = dist.mapInPandas(_build_stream, _desc_schema()).collect()
    return [r.asDict() for r in descs]


#: Boundary hash for EXPORTED ranges: the reference's own fnv64a
#: (writer.go:178-182). With the default min_range_size_bytes=0
#: (defaults.go:96) the reference's whole break rule IS this pure
#: per-key hash until a size cap fires, so for every chunk where no
#: cap fires — the common case: mean chunk ≈ raggedness·record_size,
#: well under 20 MiB for typical entries — our exported record
#: grouping, and therefore the ident-protocol range ids, are
#: IDENTICAL to what a live lakeFS writes for the same keys (pinned
#: by a ShouldBreakAtKey simulation in tests). Where a cap does fire
#: both writers break near 20 MiB but not necessarily at the same
#: record (raw-bytes accumulator here vs Pebble's size estimate
#: there; plus our rows cap, a parse-cost bound the reference lacks),
#: so only those oversized chunks diverge. Internal parquet ranges
#: keep JVM-side xxhash64.
EXPORT_BOUNDARY_ALGO = "fnv64a"


def _export_snapshot(repo, ref: str, fs: RangeFS, raggedness: int):
    """Full export of one snapshot. Returns (metarange_id, ranges)."""
    from lakefs_spark.plans.chunker import boundary_keys

    snap = repo.snapshot(ref)
    boundaries = boundary_keys(snap, "key", raggedness, EXPORT_BOUNDARY_ALGO)
    ranges = sorted(
        _write_ranges(snap, fs, boundaries, raggedness),
        key=lambda r: r["max_key"],
    )
    # zero ranges is a VALID snapshot (a commit whose tree is empty —
    # all keys deleted): it exports as an empty metarange, mirroring
    # the reference, so such commits round-trip through export/migrate
    buf, mid = write_metarange_sstable(ranges)
    fs.write(mid, buf)
    return mid, ranges


def export_to_lakefs(repo, ref: str, out, *, raggedness=None):
    """Export a snapshot AS lakeFS SSTables: one .sst per range (named
    by its lakeFS-protocol content address) plus the metarange .sst.
    ``out``: a shared directory path or any :class:`RangeFS`.
    Returns (metarange_id, n_ranges, n_entries).

    Range boundaries are CONTENT-DEFINED with the reference's OWN
    hash: a key ends its range iff ``fnv64a(key) % raggedness == 0``
    (pkg/graveler/sstable/writer.go:168-183; with the default
    min_range_size_bytes=0, defaults.go:96, that IS the reference's
    whole break rule until its 20 MiB accumulator fires — which this
    writer mirrors too). Same keys ⇒ same record grouping ⇒ the same
    ident-protocol range ids a live lakeFS would write, so exports
    share ranges not just with each other but with native lakeFS
    commits over the same keys. Boundaries are a pure function of the
    keys, so exporting two overlapping snapshots
    re-writes ONLY the ranges whose key spans changed — every other
    range keeps its content address and the put-if-absent RangeFS
    write skips it. Chunking is also canonical: any snapshot has
    exactly one chunking, so incremental (:func:`export_history`) and
    full exports of the same commit produce byte-identical metaranges.

    Scale shape: one boundary collect (1/raggedness of keys), one
    chunk-grouping shuffle, ranges built executor-side; only
    (range_id, min, max, count, size) descriptors return to the
    driver, which writes the one manifest-sized metarange."""
    from lakefs_spark.plans.chunker import DEFAULT_RAGGEDNESS

    fs = _as_rangefs(out)
    mid, ranges = _export_snapshot(
        repo, ref, fs, raggedness or DEFAULT_RAGGEDNESS
    )
    return mid, len(ranges), sum(r["count"] for r in ranges)


def export_history(repo, refs: list, out, *, raggedness=None, on_step=None):
    """Export a commit CHAIN (oldest→newest) as a lakeFS metarange
    chain with structural sharing — the inverse of
    :func:`migrate_history`, and incremental the same way: commit 1
    exports whole; every later commit re-chunks ONLY the key spans its
    native diff touched and reuses every other range descriptor
    verbatim, so exporting N commits costs O(repo + total changes),
    not O(N × repo). Because chunk boundaries are a pure function of
    the keys, the incremental metarange is byte-identical to what a
    full export of that commit would produce (pinned in tests).

    Returns [(resolved_commit_id, metarange_id), ...].

    ``on_step`` (tests/profiling): called per commit with a dict
    holding ``ranges_total``, ``ranges_rebuilt``, ``ranges_reused``.

    Dirty-range rule (mirrors the identical-range fast path of the
    reference's diff, pkg/graveler/committed/diff.go:151, run in
    reverse): consecutive commits' NATIVE manifests are compared
    descriptor-side on the driver — native ranges are content-
    addressed and COW-reused, so a native range id present in exactly
    one side marks its (min_key, max_key) span dirty. NOT repo.diff:
    that diff is identity-based (lakeFS semantics) and blind to
    payload-only updates (same identity, new etag/size/metadata),
    which DO change the manifest and must re-export. Every export
    chunk intersecting a dirty span is re-chunked from the new
    snapshot; a span ending exactly on a chunk's boundary key also
    dirties the next chunk (a removed boundary key merges the two).
    Over-marking is harmless — chunking is a pure function of the
    keys, so a rebuilt clean chunk reproduces its exact id."""
    import bisect

    from pyspark.sql import functions as F

    from lakefs_spark.plans.chunker import DEFAULT_RAGGEDNESS, boundary_keys
    from lakefs_spark.storage.ranges import EMPTY_METARANGE, read_manifest

    def _native_mf(commit_id):
        import pandas as pd

        mid = repo._metarange_of(commit_id)
        if mid == EMPTY_METARANGE:  # empty tree: no native ranges
            return pd.DataFrame(columns=["range_id", "min_key", "max_key"])
        return read_manifest(repo.root, mid)

    raggedness = raggedness or DEFAULT_RAGGEDNESS
    fs = _as_rangefs(out)
    results = []
    prev_commit = None
    prev_ranges: list[dict] | None = None
    for ref in refs:
        commit_id = repo.resolve(ref).commit_id
        if not prev_ranges:
            # first commit, or previous snapshot was EMPTY (no ranges
            # to diff against / reuse): export whole
            mid, ranges = _export_snapshot(repo, ref, fs, raggedness)
            rebuilt = len(ranges)
        else:
            max_keys = [r["max_key"] for r in prev_ranges]
            dirty_spans = _native_dirty_spans(
                _native_mf(prev_commit), _native_mf(commit_id)
            )
            dirty: set[int] = set()
            last = len(max_keys) - 1
            for lo_k, hi_k in dirty_spans:
                i0 = min(bisect.bisect_left(max_keys, lo_k), last)
                i1 = min(bisect.bisect_left(max_keys, hi_k), last)
                dirty.update(range(i0, i1 + 1))
                if i1 < last and max_keys[i1] == hi_k:
                    # the span reaches chunk i1's boundary key — if that
                    # key was removed, chunks i1 and i1+1 merge
                    dirty.add(i1 + 1)
            # bounded splitting means some max_keys are FORCED slice
            # edges, not hash boundaries; slices of one level-1 chunk
            # re-chunk TOGETHER, so expand dirty runs across any
            # non-hash-boundary edge in either direction
            if dirty:
                flags = _level1_flags(max_keys, raggedness)
                frontier = sorted(dirty)
                while frontier:
                    j = frontier.pop()
                    if j < last and not flags[j] and (j + 1) not in dirty:
                        dirty.add(j + 1)
                        frontier.append(j + 1)
                    if j > 0 and not flags[j - 1] and (j - 1) not in dirty:
                        dirty.add(j - 1)
                        frontier.append(j - 1)
            snap = repo.snapshot(ref)
            rebuilt_descs: list[dict] = []
            for lo_i, hi_i in _merge_runs(sorted(dirty)):
                lo = max_keys[lo_i - 1] if lo_i > 0 else None
                hi = max_keys[hi_i] if hi_i < last else None
                region = snap
                if lo is not None:
                    region = region.where(F.col("key") > lo)
                if hi is not None:
                    region = region.where(F.col("key") <= hi)
                bounds = boundary_keys(
                    region, "key", raggedness, EXPORT_BOUNDARY_ALGO
                )
                rebuilt_descs.extend(
                    _write_ranges(region, fs, bounds, raggedness)
                )
            ranges = sorted(
                [r for i, r in enumerate(prev_ranges) if i not in dirty]
                + rebuilt_descs,
                key=lambda r: r["max_key"],
            )
            # zero ranges = this commit's tree is empty (everything
            # deleted): write the empty metarange, same as a full export
            rebuilt = len(rebuilt_descs)
            buf, mid = write_metarange_sstable(ranges)
            fs.write(mid, buf)
        if on_step is not None:
            on_step(
                {
                    "ref": ref,
                    "metarange_id": mid,
                    "ranges_total": len(ranges),
                    "ranges_rebuilt": rebuilt,
                    "ranges_reused": len(ranges) - rebuilt,
                }
            )
        results.append((commit_id, mid))
        prev_commit, prev_ranges = commit_id, ranges
    return results


def _level1_flags(keys: list[str], raggedness: int) -> list[bool]:
    """Whether each key is a level-1 (hash-rule) chunk boundary —
    the same fnv64a_np fold that backs ``boundary_flag(algo='fnv64a')``,
    run driver-side over the descriptor-sized key list (no Spark job)."""
    from lakefs_spark.plans.chunker import boundary_flags_local

    return boundary_flags_local(keys, raggedness)


def _native_dirty_spans(prev_mf, cur_mf) -> list[tuple[str, str]]:
    """Key spans of native manifest ranges present in exactly one of
    two consecutive commits (pandas frames with range_id/min_key/
    max_key). Content-addressed ids: identical id ⇒ identical
    contents ⇒ nothing in that span changed."""
    prev_ids = set(prev_mf["range_id"])
    cur_ids = set(cur_mf["range_id"])
    spans = []
    for mf, other in ((prev_mf, cur_ids), (cur_mf, prev_ids)):
        for rid, lo, hi in zip(mf["range_id"], mf["min_key"], mf["max_key"]):
            if rid not in other:
                spans.append((lo, hi))
    return spans


def _merge_runs(indices: list[int]):
    """[1,2,3,7,8] → [(1,3), (7,8)] — consecutive dirty chunks rebuild
    as one contiguous key region."""
    runs = []
    for i in indices:
        if runs and i == runs[-1][1] + 1:
            runs[-1][1] = i
        else:
            runs.append([i, i])
    return [tuple(r) for r in runs]


# ---------------------------------------------------------------------------
# import: lakeFS SSTables → native commits
# ---------------------------------------------------------------------------


def migrate_from_lakefs(
    repo,
    metarange_sst,
    ranges_src,
    *,
    branch: str = "main",
    message: str = "import from lakeFS SSTables",
):
    """Import a real lakeFS commit into this engine: parse its
    metarange manifest on the driver (one small .sst), locate each
    referenced range in ``ranges_src`` (a directory path or any
    :class:`RangeFS`), parse all ranges distributed, and land the
    entries as one commit on ``branch``.
    Returns (commit, ranges_read, entries_imported) —
    entries_imported is the metarange descriptor sum, VERIFIED: every
    range's parsed row count is cross-checked executor-side against
    its descriptor (typed BadSSTable on mismatch), so a metarange
    with inconsistent counts fails loud instead of misreporting."""
    fs = _as_rangefs(ranges_src)
    ranges = _read_metarange(metarange_sst, fs)
    entries = _entries_checked(repo.spark, fs, ranges)
    # import_entries, not stage+commit: committing a bulk adoption via
    # staging materializes every row TWICE (staging parquet write, then
    # the commit's re-read); the import path chunks and lands the
    # stream in one pass
    commit = repo.import_entries(branch, entries, message=message)
    return commit, len(ranges), sum(r["count"] for r in ranges)


def migrate_history(
    repo,
    metaranges: list,
    ranges_src,
    *,
    branch: str = "main",
    on_step=None,
):
    """Replay a lakeFS commit HISTORY (oldest→newest) as native
    commits: the first snapshot imports whole; every later one stages
    only its DIFF vs the previous (adds/changes as entries, removals
    as tombstones), so the commits diff/log/revert like a
    natively-grown branch. A step whose delta is empty (the source had
    an allow-empty commit) replays as an allow_empty commit, keeping
    the histories 1:1.

    ``metaranges``: [(metarange_path_or_name, message), ...] in commit
    order. ``ranges_src``: directory path or RangeFS. Returns the list
    of created commits. ``on_step`` (tests/profiling): called per step
    with ``ranges_total`` / ``ranges_parsed`` counts.

    Scale — RANGE-PRUNED, the reference's own fast path
    (pkg/graveler/committed/diff.go:151): metaranges are compared
    DESCRIPTOR-side on the driver first; an identical range_id between
    consecutive snapshots means identical contents (ranges are
    content-addressed, sorted and disjoint), so only ranges present in
    exactly one side are ever opened. Step N's parse work is
    O(changed ranges), not O(repo): replaying a 1,000-commit history
    over a large repo costs the sum of the deltas in BOTH staging
    volume and parse work. (Keys inside a changed range still get a
    fingerprint join — a range rewrite does not mean every key in it
    changed.)"""
    from pyspark.sql import functions as F

    fs = _as_rangefs(ranges_src)
    commits = []
    prev_ranges: list[dict] | None = None
    step = 0
    for metarange, message in metaranges:
        cur_ranges = _read_metarange(metarange, fs)
        if prev_ranges is None:
            entries = _entries_checked(repo.spark, fs, cur_ranges)
            commits.append(repo.import_entries(branch, entries,
                                               message=message))
            parsed = len(cur_ranges)
            cur_e = prev_e = None
        else:
            prev_ids = {r["range_id"] for r in prev_ranges}
            cur_ids = {r["range_id"] for r in cur_ranges}
            cur_only = [r for r in cur_ranges if r["range_id"] not in prev_ids]
            prev_only = [
                r for r in prev_ranges if r["range_id"] not in cur_ids
            ]
            # Disjointness argument for why the delta computed over the
            # symmetric-difference ranges alone is COMPLETE: a key
            # lives in exactly one range per snapshot, so a key of a
            # prev-only range either reappears in some cur-only range
            # (same or new payload) or was removed — it cannot hide in
            # a shared range, because that range would then also have
            # held it in prev, contradicting disjointness.
            cur_e = _with_entry_fp(
                _entries_checked(repo.spark, fs, cur_only)
            ).persist()
            prev_e = _with_entry_fp(
                _entries_checked(repo.spark, fs, prev_only)
            ).persist()
            changed = (
                cur_e.join(
                    prev_e.select("key", F.col("_fp").alias("_pfp")),
                    "key",
                    "left",
                )
                .where(F.col("_pfp").isNull() | (F.col("_pfp") != F.col("_fp")))
                .drop("_pfp", "_fp")
            )
            removed = prev_e.select("key").join(
                cur_e.select("key"), "key", "left_anti"
            )
            repo.stage_entries(branch, changed)
            repo.stage_deletes(branch, removed)
            parsed = len(cur_only) + len(prev_only)
            commits.append(repo.commit(branch, message, allow_empty=True))
        if cur_e is not None:
            cur_e.unpersist()
            prev_e.unpersist()
        if on_step is not None:
            on_step(
                {
                    "step": step,
                    "message": message,
                    "ranges_total": len(cur_ranges),
                    "ranges_parsed": parsed,
                }
            )
        step += 1
        prev_ranges = cur_ranges
    return commits


def _with_entry_fp(df):
    from pyspark.sql import functions as F

    # FULL-ROW fingerprint: identity alone misses payload-only
    # updates (same identity, new etag/size/metadata) — those are
    # real manifest changes in the source and must replay. Maps
    # can't ride set ops, so fingerprint sorted entries instead.
    return df.withColumn(
        "_fp",
        F.sha2(
            F.to_json(
                F.struct(
                    "identity",
                    "address",
                    "address_type",
                    "size",
                    "etag",
                    F.col("last_modified").cast("string").alias("lm"),
                    F.array_sort(
                        F.map_entries(
                            F.coalesce(
                                "metadata",
                                F.create_map().cast("map<string,string>"),
                            )
                        )
                    ).alias("md"),
                    "content_type",
                )
            ),
            256,
        ),
    )
