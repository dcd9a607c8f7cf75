"""Lua host modules: crypto / time / uuid / encodings / formats-delta /
glue / databricks.

Completes the reference's curated module registry
(pkg/actions/lua/open.go) so ALL stock hooks resolve their requires:

- ``crypto/hmac`` ``crypto/sha256`` ``crypto/md5`` ``crypto/aes``
  (pkg/actions/lua/crypto/*) — hashlib/hmac-backed, plus a pure-Python
  AES-CBC (the container has no crypto lib; AES is a fixed public
  algorithm).
- ``time`` (pkg/actions/lua/time/time.go) — epoch-NANOSECOND numbers,
  Go reference-layout formatting/parsing, IANA zones via zoneinfo.
- ``uuid`` (pkg/actions/lua/uuid/uuid.go).
- ``encoding/base64`` ``encoding/hex`` ``encoding/z85enc``
  (pkg/actions/lua/encoding/*).
- ``formats`` (pkg/actions/lua/formats/delta.go) — ``delta_client``
  whose get_table reads a Delta Lake ``_delta_log`` committed in THIS
  engine's repository (the reference reads it back through its own S3
  gateway; same log-JSON in, same (version→actions, metadata) out).
- ``aws.glue_client`` (pkg/actions/lua/storage/aws/glue.go) and
  ``databricks.client`` (pkg/actions/lua/databricks/client.go) —
  RECORDING stand-ins (disclosed): the sandbox has no network, so the
  calls validate + record their requests for assertion instead of
  hitting AWS/Databricks; the exported Lua modules that drive them are
  byte-for-byte the reference's semantics.

Binary-in-string convention: Lua strings are byte strings in Go; this
interpreter's strings are Python str. Byte-producing functions return
latin-1-decoded text (chars 0-255 ↔ bytes), and byte-consuming
functions encode latin-1 when possible, utf-8 otherwise — round-trips
digest bytes exactly and matches Go for ASCII text (disclosed
deviation for literal non-ASCII text in the U+0080-U+00FF range).
"""

from __future__ import annotations

import base64 as _b64
import binascii
import hashlib
import hmac as _hmac
import json as _json
import os
import time as _time
import uuid as _uuid

from lakefs_spark.lua.interp import LuaError, LuaTable

__all__ = [
    "PY_HOST_MODULES",
    "make_formats_module",
    "make_databricks_module",
    "make_glue_client",
    "lua_bytes",
    "lua_str",
]


def lua_bytes(s) -> bytes:
    if isinstance(s, bytes):
        return s
    s = str(s)
    try:
        return s.encode("latin-1")
    except UnicodeEncodeError:
        return s.encode("utf-8")


def lua_str(b: bytes) -> str:
    return b.decode("latin-1")


# ---------------------------------------------------------------------------
# crypto/* (pkg/actions/lua/crypto)
# ---------------------------------------------------------------------------


def _mod_crypto_hmac() -> LuaTable:
    # hmac.go: sign_sha256 / sign_sha1 return the RAW mac bytes
    def sign(algo):
        def f(message, key):
            return lua_str(
                _hmac.new(lua_bytes(key), lua_bytes(message), algo).digest()
            )

        return f

    return LuaTable(
        {"sign_sha256": sign(hashlib.sha256), "sign_sha1": sign(hashlib.sha1)}
    )


def _mod_crypto_sha256() -> LuaTable:
    # sha256.go: digest returns RAW bytes
    return LuaTable(
        {"digest": lambda m: lua_str(hashlib.sha256(lua_bytes(m)).digest())}
    )


def _mod_crypto_md5() -> LuaTable:
    # md5.go: digest returns the HEX string (fmt %x — unlike sha256!)
    return LuaTable(
        {"digest": lambda m: hashlib.md5(lua_bytes(m)).hexdigest()}
    )


# -- AES (FIPS-197) — pure Python; hook-rate traffic only -------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL = {}
for _c in (2, 3, 9, 11, 13, 14):
    _MUL[_c] = bytes(
        (lambda x, c: (
            (_xtime(x) if c & 2 else 0)
            ^ (x if c & 1 else 0)
            ^ (_xtime(_xtime(x)) if c & 4 else 0)
            ^ (_xtime(_xtime(_xtime(x))) if c & 8 else 0)
        ))(x, _c)
        for x in range(256)
    )


def _key_expand(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    w = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(
                _SBOX[t[(j + 1) % 4]] ^ (_RCON[i // nk - 1] if j == 0 else 0)
                for j in range(4)
            )
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _aes_encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rks[0]))
    for rnd in range(1, len(rks)):
        s = bytearray(_SBOX[b] for b in s)  # SubBytes
        # ShiftRows (column-major state: byte r + 4c)
        s = bytearray(s[(i + 4 * (i % 4)) % 16] for i in range(16))
        if rnd != len(rks) - 1:  # MixColumns
            m2, m3 = _MUL[2], _MUL[3]
            t = bytearray(16)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c : c + 4]
                t[c] = m2[a0] ^ m3[a1] ^ a2 ^ a3
                t[c + 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
                t[c + 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
                t[c + 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
            s = t
        s = bytearray(a ^ b for a, b in zip(s, rks[rnd]))
    return bytes(s)


def _aes_decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rks[-1]))
    for rnd in range(len(rks) - 2, -1, -1):
        # InvShiftRows
        s = bytearray(s[(i - 4 * (i % 4)) % 16] for i in range(16))
        s = bytearray(_INV_SBOX[b] for b in s)  # InvSubBytes
        s = bytearray(a ^ b for a, b in zip(s, rks[rnd]))
        if rnd != 0:  # InvMixColumns
            m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
            t = bytearray(16)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c : c + 4]
                t[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
                t[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
                t[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
                t[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
            s = t
    return bytes(s)


def _mod_crypto_aes() -> LuaTable:
    # aes.go: encryptCBC(key, plaintext) — PKCS5 pad, random IV
    # PREPENDED to the ciphertext; decryptCBC strips it back off.
    def encrypt_cbc(key, plaintext):
        kb = lua_bytes(key)
        if len(kb) not in (16, 24, 32):
            raise LuaError(f"crypto/aes: invalid key size {len(kb)}")
        rks = _key_expand(kb)
        pt = lua_bytes(plaintext)
        pad = 16 - len(pt) % 16
        pt += bytes([pad]) * pad
        iv = os.urandom(16)
        out = bytearray(iv)
        prev = iv
        for i in range(0, len(pt), 16):
            blk = bytes(a ^ b for a, b in zip(pt[i : i + 16], prev))
            prev = _aes_encrypt_block(blk, rks)
            out += prev
        return lua_str(bytes(out))

    def decrypt_cbc(key, ciphertext):
        kb = lua_bytes(key)
        if len(kb) not in (16, 24, 32):
            raise LuaError(f"crypto/aes: invalid key size {len(kb)}")
        ct = lua_bytes(ciphertext)
        if len(ct) < 32 or len(ct) % 16:
            raise LuaError("crypto/aes: bad ciphertext length")
        rks = _key_expand(kb)
        iv, body = ct[:16], ct[16:]
        out = bytearray()
        prev = iv
        for i in range(0, len(body), 16):
            blk = body[i : i + 16]
            out += bytes(a ^ b for a, b in zip(_aes_decrypt_block(blk, rks), prev))
            prev = blk
        pad = out[-1]
        if not 1 <= pad <= 16:
            raise LuaError("crypto/aes: bad padding")
        return lua_str(bytes(out[:-pad]))

    return LuaTable({"encryptCBC": encrypt_cbc, "decryptCBC": decrypt_cbc})


# ---------------------------------------------------------------------------
# time (pkg/actions/lua/time/time.go) — epoch NANOSECONDS everywhere
# ---------------------------------------------------------------------------

# Go reference-layout tokens → handled explicitly (longest first).
# Values are strftime codes, or a callable(dt) for Go-isms strftime
# can't express.
_GO_TOKENS: list[tuple[str, object]] = [
    ("2006", "%Y"),
    ("January", "%B"),
    ("Monday", "%A"),
    ("Jan", "%b"),
    ("Mon", "%a"),
    (".000000000", lambda dt: ".%09d" % (dt.microsecond * 1000)),
    (".000000", lambda dt: ".%06d" % dt.microsecond),
    (".000", lambda dt: ".%03d" % (dt.microsecond // 1000)),
    ("-07:00", lambda dt: _offset_str(dt, colon=True)),
    ("-0700", lambda dt: _offset_str(dt, colon=False)),
    ("Z07:00", lambda dt: "Z" if _is_utc(dt) else _offset_str(dt, colon=True)),
    ("Z0700", lambda dt: "Z" if _is_utc(dt) else _offset_str(dt, colon=False)),
    ("MST", "%Z"),
    ("PM", "%p"),
    ("15", "%H"),
    ("01", "%m"),
    ("02", "%d"),
    ("03", "%I"),
    ("04", "%M"),
    ("05", "%S"),
    ("06", "%y"),
    ("2", lambda dt: str(dt.day)),
    ("1", lambda dt: str(dt.month)),
]

ISO8601_LAYOUT = "2006-01-02T15:04:05-07:00"


def _offset_str(dt, colon: bool) -> str:
    off = dt.utcoffset()
    total = int(off.total_seconds()) if off is not None else 0
    sign = "-" if total < 0 else "+"
    total = abs(total)
    hh, mm = total // 3600, (total % 3600) // 60
    return f"{sign}{hh:02d}:{mm:02d}" if colon else f"{sign}{hh:02d}{mm:02d}"


def _is_utc(dt) -> bool:
    off = dt.utcoffset()
    return off is not None and off.total_seconds() == 0


def _split_layout(layout: str) -> list:
    """Layout → [literal | token] pieces, longest-token-first match."""
    out = []
    i = 0
    while i < len(layout):
        for tok, code in _GO_TOKENS:
            if layout.startswith(tok, i):
                out.append(("tok", tok, code))
                i += len(tok)
                break
        else:
            out.append(("lit", layout[i]))
            i += 1
    return out


def _go_format(dt, layout: str) -> str:
    parts = []
    for piece in _split_layout(layout):
        if piece[0] == "lit":
            parts.append(piece[1])
        else:
            _, _tok, code = piece
            parts.append(code(dt) if callable(code) else dt.strftime(code))
    return "".join(parts)


def _go_parse(layout: str, value: str) -> float:
    """time.Parse: layout → strptime. Returns epoch ns; a layout with
    no zone information parses as UTC (Go's documented behavior)."""
    from datetime import datetime, timezone

    fmt = []
    has_zone = False
    for piece in _split_layout(layout):
        if piece[0] == "lit":
            ch = piece[1]
            fmt.append("%%" if ch == "%" else ch)
            continue
        _, tok, code = piece
        if tok in ("-07:00", "-0700", "Z07:00", "Z0700"):
            fmt.append("%z")
            has_zone = True
        elif tok == "MST":
            fmt.append("%Z")
            has_zone = True
        elif tok.startswith(".000"):
            fmt.append(".%f")
        elif tok == "2":
            fmt.append("%d")  # strptime accepts non-padded with %d
        elif tok == "1":
            fmt.append("%m")
        elif callable(code):
            raise LuaError(f"time.parse: unsupported layout token {tok!r}")
        else:
            fmt.append(code)
    try:
        dt = datetime.strptime(value, "".join(fmt))
    except ValueError as e:
        raise LuaError(f"time.parse: {e}") from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
        _ = has_zone  # layout had a zone but the value parsed naive (%Z)
    return dt.timestamp() * 1e9


def _load_zone(zone: str):
    from datetime import timezone

    if not zone or zone == "UTC":
        return timezone.utc
    if zone == "Local":
        return None  # astimezone(None) → local
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(zone)
    except Exception as e:  # noqa: BLE001 — unknown zone, no tzdata, ...
        raise LuaError(f"time: unknown time zone {zone}: {e}") from None


# Hooks must not stall the commit pipeline forever: time.sleep is
# faithful up to this bound (the reference sleeps unboundedly; the Lua
# instruction budget can't see inside a host sleep, so we bound it).
MAX_SLEEP_SECONDS = float(os.environ.get("LAKEFS_SPARK_LUA_MAX_SLEEP", "60"))


def _mod_time() -> LuaTable:
    from datetime import datetime, timezone

    def _to_zone(epoch_ns, zone):
        # Go: time.Unix(ns/1e9, 0) — TRUNCATES to whole seconds
        secs = int(float(epoch_ns)) // 1_000_000_000
        dt = datetime.fromtimestamp(secs, tz=timezone.utc)
        tz = _load_zone(zone)
        return dt.astimezone(tz)

    def now():
        return float(_time.time_ns())

    def fmt(epoch_ns, layout, zone):
        return _go_format(_to_zone(epoch_ns, zone), layout)

    def format_iso(epoch_ns, zone=""):
        return _go_format(_to_zone(epoch_ns, zone), ISO8601_LAYOUT)

    def sleep(ns):
        _time.sleep(min(float(ns) / 1e9, MAX_SLEEP_SECONDS))

    def since(start_ns):
        return float(_time.time_ns()) - float(start_ns)

    def add(start_ns, parts):
        h = parts.get("hour") or 0
        m = parts.get("minute") or 0
        s = parts.get("second") or 0
        return float(start_ns) + (h * 3600 + m * 60 + s) * 1e9

    def parse(layout, value):
        return _go_parse(layout, value)

    def parse_iso(value):
        return _go_parse(ISO8601_LAYOUT, value)

    return LuaTable(
        {
            "now": now,
            "format": fmt,
            "format_iso": format_iso,
            "sleep": sleep,
            "since": since,
            "add": add,
            "parse": parse,
            "parse_iso": parse_iso,
        }
    )


# ---------------------------------------------------------------------------
# uuid / encodings
# ---------------------------------------------------------------------------


def _mod_uuid() -> LuaTable:
    return LuaTable({"new": lambda: str(_uuid.uuid4())})


def _mod_base64() -> LuaTable:
    def decode(data, *, altchars=None):
        # validate=True: Go's StdEncoding ERRORS on non-alphabet bytes;
        # python's default silently drops them — a validator hook must
        # see the failure, not a silently-reshaped payload
        try:
            return lua_str(
                _b64.b64decode(lua_bytes(data), altchars=altchars, validate=True)
            )
        except (binascii.Error, ValueError) as e:
            raise LuaError(f"base64: {e}") from None

    def url_decode(data):
        # Go RawURLEncoding: unpadded URL-SAFE alphabet; '+'/'/' are
        # not in it (python's altchars only remaps, it doesn't exclude)
        d = str(data)
        if "+" in d or "/" in d:
            raise LuaError("base64: illegal character in url encoding")
        return decode(d + "=" * (-len(d) % 4), altchars=b"-_")

    return LuaTable(
        {
            "encode": lambda d: lua_str(_b64.standard_b64encode(lua_bytes(d))),
            "decode": decode,
            # Go RawURLEncoding (url-safe alphabet, NO padding)
            "url_encode": lambda d: lua_str(
                _b64.urlsafe_b64encode(lua_bytes(d)).rstrip(b"=")
            ),
            "url_decode": url_decode,
        }
    )


def _mod_hex() -> LuaTable:
    def decode(v):
        try:
            return lua_str(bytes.fromhex(str(v)))
        except ValueError as e:
            raise LuaError(f"hex: {e}") from None

    return LuaTable(
        {"encode": lambda v: lua_bytes(v).hex(), "decode": decode}
    )


# Z85 (ZeroMQ spec 32) — 5 chars ↔ 4 bytes, big-endian base 85
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def _z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise LuaError(f"z85: length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            d = _Z85_INDEX.get(c)
            if d is None:
                raise LuaError(f"z85: invalid character {c!r}")
            v = v * 85 + d
        if v > 0xFFFFFFFF:
            raise LuaError("z85: chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


def _mod_z85enc() -> LuaTable:
    # z85enc.go decodeUUID: last 20 chars decode to the 16-byte UUID;
    # anything before is an optional subdirectory prefix. Returns
    # (uuid_string, prefix).
    def decode_uuid(data):
        data = str(data)
        prefix, encoded = ("", data) if len(data) <= 20 else (
            data[:-20],
            data[-20:],
        )
        if len(encoded) != 20:
            # Go z85.Decode errors when the output isn't exactly the
            # 16-byte dst — a short input must fail, not mis-decode
            raise LuaError(
                f"z85: uuid payload must be 20 chars, got {len(encoded)}"
            )
        raw = _z85_decode(encoded)
        u = raw.hex()
        return (
            f"{u[0:8]}-{u[8:12]}-{u[12:16]}-{u[16:20]}-{u[20:32]}",
            prefix,
        )

    return LuaTable({"decode_uuid": decode_uuid})


# ---------------------------------------------------------------------------
# formats.delta_client (pkg/actions/lua/formats/delta.go)
# ---------------------------------------------------------------------------


def make_formats_module(repo, content_loader=None) -> LuaTable:
    """``formats.delta_client(key, secret, region?)`` → client whose
    ``get_table(repo, ref, prefix)`` returns (version → [action-JSON
    strings], metadata) exactly like delta.go's fetchTableLog — except
    it reads the ``_delta_log`` directly from THIS engine's committed
    snapshot instead of round-tripping through an S3 gateway. JSON
    commit files only (the stand-in raises on checkpoint-only logs)."""
    from lakefs_spark.catalog import Catalog
    from lakefs_spark.lua.modules import load_entry_content

    def delta_client(_key, _secret, _region=None):
        cat = Catalog(repo)

        def get_table(_repo_id, ref, prefix):
            log_prefix = prefix.rstrip("/") + "/_delta_log/"
            entries = []
            after = ""
            while True:
                resp = cat.list_objects(
                    ref, prefix=log_prefix, after=after, delimiter="", amount=1000
                )
                entries.extend(resp["results"])
                if not resp["pagination"]["has_more"]:
                    break
                after = resp["pagination"]["next_offset"]
            log: dict[int, list[str]] = {}
            latest_meta = None
            latest_meta_version = -1
            saw_checkpoint = False
            for row in entries:
                d = dict(row.asDict()) if hasattr(row, "asDict") else dict(row)
                base = d["key"][len(log_prefix):]
                if not base.endswith(".json") or not base[:-5].isdigit():
                    # checkpoints coexist with JSON commits (one every
                    # ~10 commits by default) — skip them; only a log
                    # with NO json commits at all is unreadable here
                    if ".checkpoint." in base:
                        saw_checkpoint = True
                    continue
                version = int(base[:-5])
                actions = [
                    ln
                    for ln in load_entry_content(repo, d, content_loader).splitlines()
                    if ln.strip()
                ]
                log[version] = actions
                if version > latest_meta_version:
                    for a in actions:
                        try:
                            parsed = _json.loads(a)
                        except ValueError:
                            continue
                        if "metaData" in parsed:
                            latest_meta = parsed["metaData"]
                            latest_meta_version = version
            if not log:
                detail = (
                    " (checkpoint parquet present but JSON commits "
                    "vacuumed — checkpoint-only logs are not supported "
                    "by this stand-in)"
                    if saw_checkpoint
                    else ""
                )
                raise LuaError(
                    f"formats/delta: no _delta_log JSON commits under "
                    f"{prefix!r} at {ref!r}{detail}"
                )
            if latest_meta is None:
                raise LuaError("formats/delta: log has no metaData action")
            meta = {
                "description": latest_meta.get("description") or "",
                "id": latest_meta.get("id") or "",
                "name": latest_meta.get("name") or "",
                "schema_string": latest_meta.get("schemaString") or "",
                "partition_columns": latest_meta.get("partitionColumns") or [],
                "configuration": latest_meta.get("configuration") or {},
                "created_time": latest_meta.get("createdTime") or 0,
            }
            from lakefs_spark.lua.modules import py_to_lua

            # keys must be NUMBERS (Go map[int64][]string); sortedKeys +
            # `t[key]` in delta_exporter.lua rely on that
            t = LuaTable()
            for version, actions in log.items():
                t.set(version, py_to_lua(actions))
            return (t, py_to_lua(meta))

        return LuaTable({"get_table": get_table})

    return LuaTable({"delta_client": delta_client})


# ---------------------------------------------------------------------------
# aws glue_client / databricks.client — recording stand-ins (no network)
# ---------------------------------------------------------------------------


def make_glue_client(recorder: list | None = None):
    """``aws.glue_client(key, secret, region?, endpoint?)`` — the
    surface of pkg/actions/lua/storage/aws/glue.go (get/create/update/
    delete table, create/delete database) over an in-memory catalog;
    every call appends to ``recorder`` for test assertion."""

    def glue_client(_key, _secret, _region=None, _endpoint=None):
        databases: dict[str, dict] = {}
        tables: dict[tuple, dict] = {}

        def _rec(op, **kw):
            if recorder is not None:
                recorder.append({"service": "glue", "op": op, **kw})

        def create_database(db, opts=None):
            error_on_exists = True
            if opts is not None and hasattr(opts, "get"):
                eoe = opts.get("error_on_already_exists")
                if eoe is not None:
                    error_on_exists = bool(eoe)
            _rec("create_database", database=db)
            if db in databases:
                if error_on_exists:
                    raise LuaError(f"glue: database {db} already exists")
                return
            databases[db] = {}

        def delete_database(db):
            _rec("delete_database", database=db)
            if db not in databases:
                raise LuaError(f"glue: database {db} not found")
            del databases[db]

        def create_table(db, table_input_json, _region=None):
            try:
                inp = _json.loads(str(table_input_json))
            except ValueError as e:
                raise LuaError(f"glue: bad table input JSON: {e}") from None
            name = inp.get("Name")
            if not name:
                raise LuaError("glue: table input missing Name")
            _rec("create_table", database=db, table=name, table_input=inp)
            if (db, name) in tables:
                raise LuaError(f"glue: table {db}.{name} already exists")
            tables[(db, name)] = inp

        def update_table(db, table_input_json, _region=None):
            try:
                inp = _json.loads(str(table_input_json))
            except ValueError as e:
                raise LuaError(f"glue: bad table input JSON: {e}") from None
            name = inp.get("Name")
            _rec("update_table", database=db, table=name, table_input=inp)
            if (db, name) not in tables:
                raise LuaError(f"glue: table {db}.{name} not found")
            tables[(db, name)] = inp

        def delete_table(db, table):
            _rec("delete_table", database=db, table=table)
            if (db, table) not in tables:
                raise LuaError(f"glue: table {db}.{table} not found")
            del tables[(db, table)]

        def get_table(db, table):
            _rec("get_table", database=db, table=table)
            got = tables.get((db, table))
            if got is None:
                raise LuaError(f"glue: table {db}.{table} not found")
            from lakefs_spark.lua.modules import py_to_lua

            return py_to_lua({"Table": got})

        return LuaTable(
            {
                "create_database": create_database,
                "delete_database": delete_database,
                "create_table": create_table,
                "update_table": update_table,
                "delete_table": delete_table,
                "get_table": get_table,
            }
        )

    return glue_client


def make_azure_module(export_root: str | None = None, recorder: list | None = None) -> LuaTable:
    """``azure`` (pkg/actions/lua/storage/azure): abfss_transform_path
    is the reference's PURE path rewrite (same regex); blob_client is a
    recording stand-in over export_root/azure/<account>/<container>/
    <key> (paths are 'container/key', per parsePath)."""
    import re

    _ABFSS = re.compile(
        r"^https://(\w+)\.(?:blob|adls)\.core\.windows\.net/([^/]*)/(.+)$"
    )

    def abfss_transform_path(p):
        m = _ABFSS.match(str(p))
        if not m:
            raise LuaError(f"expected valid Azure https URL: {p}")
        account, container, blob = m.groups()
        return f"abfss://{container}@{account}.dfs.core.windows.net/{blob}"

    def blob_client(storage_account, _access_key):
        if export_root is None:
            raise LuaError("azure blob stand-in: no export_root configured")
        base = os.path.join(export_root, "azure", str(storage_account))

        def _rec(op, **kw):
            if recorder is not None:
                recorder.append({"service": "azure", "op": op,
                                 "account": str(storage_account), **kw})

        def _safe(path):
            container, sep, key = str(path).partition("/")
            if not sep:
                raise LuaError(
                    f"azure client: invalid path, missing container name "
                    f"from path: {path}"
                )
            p = os.path.realpath(os.path.join(base, container, key))
            root = os.path.realpath(base)
            if p != root and not p.startswith(root + os.sep):
                raise LuaError("azure stand-in: path escapes the export root")
            return p

        def get_object(path):
            p = _safe(path)
            _rec("get_object", path=str(path))
            if not os.path.exists(p):
                return ("", False)
            with open(p, "rb") as f:
                return (lua_str(f.read()), True)

        def put_object(path, data):
            p = _safe(path)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(lua_bytes(data))
            _rec("put_object", path=str(path), size=len(lua_bytes(data)))

        def delete_object(path):
            p = _safe(path)
            _rec("delete_object", path=str(path))
            try:
                os.remove(p)
            except FileNotFoundError:
                raise LuaError(f"azure client: blob not found: {path}") from None

        return LuaTable(
            {
                "get_object": get_object,
                "put_object": put_object,
                "delete_object": delete_object,
            }
        )

    return LuaTable(
        {
            "abfss_transform_path": abfss_transform_path,
            "blob_client": blob_client,
        }
    )


def make_gcloud_module(export_root: str | None = None, recorder: list | None = None) -> LuaTable:
    """``gcloud`` (pkg/actions/lua/storage/gcloud): gs_client whose
    write_fuse_symlink mirrors the reference — an empty object at the
    gs:// output address carrying gcsfuse_symlink_target metadata (the
    stand-in records the metadata as the file body + recorder row)."""

    def gs_client(_credentials_json):
        if export_root is None:
            raise LuaError("gcloud gs stand-in: no export_root configured")
        base = os.path.join(export_root, "gs")

        def write_fuse_symlink(physical_address, output_address, mount_info):
            target = str(physical_address)
            frm = mount_info.get("from") if hasattr(mount_info, "get") else None
            to = mount_info.get("to") if hasattr(mount_info, "get") else None
            if frm and target.startswith(str(frm)):
                target = target[len(str(frm)):]
            if to:
                target = "/" + "/".join(
                    s for s in (str(to).strip("/") + "/" + target.lstrip("/")).split("/") if s
                )
            out = str(output_address)
            if not out.startswith("gs://"):
                raise LuaError(f"could not parse destination object \"{out}\"")
            rel = out[len("gs://"):]
            p = os.path.realpath(os.path.join(base, rel))
            root = os.path.realpath(base)
            if p != root and not p.startswith(root + os.sep):
                raise LuaError("gs stand-in: path escapes the export root")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            # the real object is EMPTY with metadata; the stand-in keeps
            # the target as the body so tests can assert it
            with open(p, "w") as f:
                f.write(target)
            if recorder is not None:
                recorder.append(
                    {"service": "gs", "op": "write_fuse_symlink",
                     "output": out, "gcsfuse_symlink_target": target}
                )

        return LuaTable({"write_fuse_symlink": write_fuse_symlink})

    return LuaTable({"gs_client": gs_client})


def make_databricks_module(recorder: list | None = None) -> LuaTable:
    """``databricks.client(host, token)`` — the surface of
    pkg/actions/lua/databricks/client.go (create_schema,
    register_external_table, execute_statement); records the SQL the
    reference would send to a warehouse instead of sending it."""

    def client(_host=None, _token=None):
        schemas: set[tuple] = set()
        ext_tables: dict[tuple, str] = {}

        def _rec(op, **kw):
            if recorder is not None:
                recorder.append({"service": "databricks", "op": op, **kw})

        def create_schema(ref, catalog, get_if_exists=False):
            key = (catalog, ref)
            _rec("create_schema", catalog=catalog, schema=ref)
            if key in schemas and not get_if_exists:
                raise LuaError(f"databricks: schema {catalog}.{ref} already exists")
            schemas.add(key)
            return ref

        def register_external_table(
            table_name, location, warehouse_id, catalog, schema, metadata=None
        ):
            # client.go RegisterExternalTable: '-' → '_', CREATE
            # EXTERNAL TABLE ... LOCATION, re-create on already-exists
            name = str(table_name).replace("-", "_")
            if not name:
                raise LuaError("databricks: empty table name")
            stmt = f"CREATE EXTERNAL TABLE {name} LOCATION '{location}'"
            desc = None
            if metadata is not None and hasattr(metadata, "get"):
                desc = metadata.get("description")
            if desc:
                stmt += f" COMMENT '{desc}'"
            _rec(
                "register_external_table",
                table=name,
                location=str(location),
                warehouse_id=str(warehouse_id),
                catalog=str(catalog),
                schema=str(schema),
                statement=stmt,
            )
            ext_tables[(catalog, schema, name)] = str(location)
            return "SUCCEEDED"

        def execute_statement(statement, warehouse_id, catalog, schema):
            _rec(
                "execute_statement",
                statement=str(statement),
                warehouse_id=str(warehouse_id),
                catalog=str(catalog),
                schema=str(schema),
            )
            return "SUCCEEDED"

        return LuaTable(
            {
                "create_schema": create_schema,
                "register_external_table": register_external_table,
                "execute_statement": execute_statement,
            }
        )

    return LuaTable({"client": client})


def _mod_parquet() -> LuaTable:
    """``encoding/parquet`` (pkg/actions/lua/encoding/parquet/
    parquet.go): get_schema(content) → [{name, type}] with parquet
    PHYSICAL type names (BYTE_ARRAY, INT32, ...). Backed by pyarrow;
    lists leaf columns (the Go version also emits group nodes as
    type=N/A — a disclosed flattening difference; block-list
    validators match leaf names either way)."""

    def get_schema(payload):
        import io

        s = str(payload)
        bufs = []
        for codec in ("latin-1", "utf-8"):
            try:
                bufs.append(s.encode(codec))
            except UnicodeEncodeError:
                continue
        last_err = None
        for b in bufs:
            if b[:4] != b"PAR1":
                continue
            try:
                import pyarrow.parquet as pq

                schema = pq.ParquetFile(io.BytesIO(b)).schema
                out = []
                for i in range(len(schema)):
                    col = schema.column(i)
                    out.append({"name": col.name, "type": col.physical_type})
                from lakefs_spark.lua.modules import py_to_lua

                return py_to_lua(out)
            except Exception as e:  # noqa: BLE001 — try the other codec
                last_err = e
        raise LuaError(f"parquet.get_schema: not a parquet payload ({last_err})")

    return LuaTable({"get_schema": get_schema})


# static (repo-independent) modules
PY_HOST_MODULES = {
    "crypto/hmac": _mod_crypto_hmac,
    "crypto/sha256": _mod_crypto_sha256,
    "crypto/md5": _mod_crypto_md5,
    "crypto/aes": _mod_crypto_aes,
    "time": _mod_time,
    "uuid": _mod_uuid,
    "encoding/base64": _mod_base64,
    "encoding/hex": _mod_hex,
    "encoding/z85enc": _mod_z85enc,
    "encoding/parquet": _mod_parquet,
}
