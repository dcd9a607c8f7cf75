"""Host modules for Lua hooks + the ``require`` resolver.

Python ports of the reference's curated Lua stdlib
(pkg/actions/lua/strings/strings.go, path/path.go, regexp/regexp.go,
encoding/json, encoding/yaml, net/url, lakefs/client.go,
storage/aws/s3.go) plus original Lua re-implementations of the
catalogexport helper modules (pkg/actions/lua/lakefs/catalogexport/
internal.lua, table_extractor.lua, hive.lua, symlink_exporter.lua —
same exported surface so unmodified user hooks resolve them; the Lua
texts here are written fresh for this engine).

``make_hook_env`` assembles the sandboxed globals the reference
injects (pkg/actions/lua.go:38-171): ``action`` (the event payload),
``args`` (expanded hook properties), ``print`` routed to the hook's
output log, and ``require`` over the module registry. No io/os/network
escape exists: every effectful surface is a shim over the engine's own
Repository/Catalog.
"""

from __future__ import annotations

import json as _json
import os
import re as _re
from urllib.parse import urlsplit

from lakefs_spark.lua.interp import (
    LuaError,
    LuaTable,
    LuaUnsupportedFeature,
    lua_tostring,
    lua_truthy,
    run_lua,
)
from lakefs_spark.lua.stdlib import make_base_env

# ---------------------------------------------------------------------------
# value conversion
# ---------------------------------------------------------------------------


def py_to_lua(v):
    if isinstance(v, dict):
        t = LuaTable()
        for k, val in v.items():
            t.set(k, py_to_lua(val))
        return t
    if isinstance(v, (list, tuple)):
        t = LuaTable()
        for i, val in enumerate(v, start=1):
            t.set(i, py_to_lua(val))
        return t
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    return v


def lua_to_py(v, _depth=0):
    if _depth > 64:
        raise LuaError("table nesting too deep to convert")
    if isinstance(v, LuaTable):
        n = v.length()
        keys = set(v.hash.keys())
        if n > 0 and keys == set(range(1, n + 1)):
            return [lua_to_py(v.get(i), _depth + 1) for i in range(1, n + 1)]
        if not keys:
            # array()-tagged empty table marshals as [] (the reference's
            # arrayMarkerField metatable convention, util/deep_pull.go)
            mt = v.metatable
            if isinstance(mt, LuaTable) and mt.get("__lua_array"):
                return []
            return {}
        out = {}
        for k in v.hash:
            out[k if isinstance(k, str) else lua_tostring(k)] = lua_to_py(
                v.hash[k], _depth + 1
            )
        return out
    return v


# ---------------------------------------------------------------------------
# strings / path / regexp / encoding / net-url  (Go-module ports)
# ---------------------------------------------------------------------------


def _mod_strings() -> LuaTable:
    def split(s, sep):
        t = LuaTable()
        parts = s.split(sep) if sep else list(s)
        for i, p in enumerate(parts, start=1):
            t.set(i, p)
        return t

    return LuaTable(
        {
            "split": split,
            "trim": lambda s: s.strip(),
            "replace": lambda s, old, new, n=-1: s.replace(old, new, int(n) if int(n) >= 0 else -1),
            "has_prefix": lambda s, p: s.startswith(p),
            "has_suffix": lambda s, p: s.endswith(p),
            "contains": lambda s, sub: sub in s,
        }
    )


def _path_parse(pth: str, sep: str = "/") -> LuaTable:
    # pkg/actions/lua/path/path.go:59-78 Parse
    if pth.endswith(sep):
        pth = pth[: len(pth) - 1]
    idx = pth.rfind(sep)
    if idx == -1:
        return LuaTable({"parent": "", "base_name": pth})
    return LuaTable({"parent": pth[: idx + 1], "base_name": pth[idx + 1 :]})


def _path_join(sep: str, *parts) -> str:
    # pkg/actions/lua/path/path.go:86-101 Join: keep first part's prefix
    # sep, ensure a single sep between parts, last part's suffix optional
    out = []
    for i, part in enumerate(parts):
        part = lua_tostring(part)
        if i != 0 and part.startswith(sep):
            part = part[len(sep):]
        out.append(part)
        if i != len(parts) - 1 and not part.endswith(sep):
            out.append(sep)
    return "".join(out)


def _path_is_hidden(pth: str, sep: str = "/", prefix: str = "_") -> bool:
    # pkg/actions/lua/path/path.go:103-113 IsHidden: any path component
    # starting with the hidden prefix
    while pth:
        parsed = _path_parse(pth, sep)
        if parsed.get("base_name").startswith(prefix):
            return True
        pth = parsed.get("parent")
    return False


def _mod_path() -> LuaTable:
    return LuaTable(
        {
            "parse": lambda p, sep="/": _path_parse(p, sep),
            "join": _path_join,
            "is_hidden": lambda p, sep="/", prefix="_": _path_is_hidden(p, sep, prefix),
            "default_separator": lambda: "/",
            "extract_dir_name": lambda p: _path_parse(p, "/").get("parent").rstrip("/"),
        }
    )


def _mod_regexp() -> LuaTable:
    # Go regexp is RE2 — linear-time, no catastrophic backtracking. A
    # hook pattern is author-supplied but the SUBJECT is often
    # attacker-supplied (commit metadata), so this surface uses the
    # repo's own Pike-VM engine (lua/re2.py) rather than Python's
    # backtracking re: `(a+)+$` against a long metadata value stays
    # O(pattern × subject) instead of stalling the commit. Constructs
    # outside the supported RE2 subset raise LuaUnsupportedFeature —
    # loud, never a mis-match. Mirrors pkg/actions/lua/regexp/regexp.go
    # (match / quote_meta / compile → find, find_submatch, find_all,
    # find_all_submatch).
    from lakefs_spark.lua import re2 as _re2

    def _compile(pattern):
        try:
            return _re2.Re2(pattern)
        except _re2.UnsupportedRegex as e:
            raise LuaUnsupportedFeature(f"regexp: {e}") from None
        except ValueError as e:
            raise LuaError(f"regexp.compile: {e}") from None

    def compile_(pattern):
        rx = _compile(pattern)

        def find_submatch(s):
            got = rx.find_submatch(s)
            return py_to_lua(got) if got is not None else None

        return LuaTable(
            {
                "match": lambda s: rx.match(s),
                "find": lambda s: rx.find(s),
                "find_submatch": find_submatch,
                # Go FindAllString: whole matches, never groups
                "find_all": lambda s, n=-1: py_to_lua(rx.find_all(s, int(n))),
                "find_all_submatch": lambda s, n=-1: py_to_lua(
                    rx.find_all_submatch(s, int(n))
                ),
            }
        )

    def match(pattern, s):
        return _compile(pattern).match(s)

    return LuaTable(
        {"match": match, "quote_meta": _re2.quote_meta, "compile": compile_}
    )


def _mod_hook() -> LuaTable:
    # pkg/actions/lua/hook/hook.go: fail(msg) raises the explicit
    # <HookFailure> marker (a deliberate veto, not a script bug)
    def fail(msg):
        raise LuaError(f"<HookFailure>{lua_tostring(msg)}</HookFailure>")

    return LuaTable({"fail": fail})


def _mod_json() -> LuaTable:
    def marshal(v):
        return _json.dumps(lua_to_py(v), sort_keys=True)

    def unmarshal(s):
        try:
            return py_to_lua(_json.loads(s))
        except (_json.JSONDecodeError, TypeError) as e:
            raise LuaError(f"json.unmarshal: {e}") from None

    return LuaTable({"marshal": marshal, "unmarshal": unmarshal})


def _mod_yaml() -> LuaTable:
    def unmarshal(s):
        try:
            import yaml

            return py_to_lua(yaml.safe_load(s))
        except ImportError:  # pragma: no cover — yaml present in CI image
            return py_to_lua(_json.loads(s))
        except Exception as e:  # noqa: BLE001
            raise LuaError(f"yaml.unmarshal: {e}") from None

    def marshal(v):
        try:
            import yaml

            return yaml.safe_dump(lua_to_py(v), sort_keys=True)
        except ImportError:  # pragma: no cover
            return _json.dumps(lua_to_py(v), sort_keys=True)

    return LuaTable({"marshal": marshal, "unmarshal": unmarshal})


def _mod_url() -> LuaTable:
    def parse(u):
        parts = urlsplit(u)
        return LuaTable(
            {
                "scheme": parts.scheme,
                "host": parts.hostname or "",
                "path": parts.path,
                "query": parts.query or None,
                "fragment": parts.fragment or None,
            }
        )

    def query_unescape(s):
        from urllib.parse import unquote_plus

        return unquote_plus(s)

    def path_escape(s):
        from urllib.parse import quote

        return quote(str(s), safe="")

    def build_url(scheme, host, path=None, query=None, fragment=None):
        # net/url build_url: Go url.URL{...}.String() — path is escaped
        # (spaces, non-ASCII) but '/' and sub-delims stay literal
        from urllib.parse import quote

        out = f"{scheme}://{host}"
        if path is not None:
            p = quote(str(path), safe="/$&+,:;=@~!*'()")
            if p and not p.startswith("/"):
                p = "/" + p
            out += p
        if query is not None and str(query) != "":
            out += "?" + str(query)
        if fragment is not None and str(fragment) != "":
            out += "#" + str(fragment)
        return out

    return LuaTable(
        {
            "parse": parse,
            "query_unescape": query_unescape,
            "path_escape": path_escape,
            "build_url": build_url,
        }
    )


# ---------------------------------------------------------------------------
# lakefs client shim (pkg/actions/lua/lakefs/client.go surface, backed
# by the engine's Catalog — returns (status_code, body) pairs like the
# reference's in-process HTTP round-trips)
# ---------------------------------------------------------------------------


def load_entry_content(repo, row, content_loader=None) -> str:
    """Object bytes for an entry row, as text. Relative physical
    addresses resolve under the store's data root — the single copy of
    the rule RepoActionSource's default loader and the lakefs client
    shim share (used for in-repo specs, script_path hooks, and Lua
    get_object). Pass ``content_loader(row) -> bytes|str`` to read from
    a non-filesystem store."""
    if hasattr(row, "asDict"):
        row = row.asDict()
    else:
        row = dict(row)
    if content_loader is not None:
        data = content_loader(row)
    else:
        if row.get("address_type") not in (None, "RELATIVE"):
            # a FULL/EXTERNAL address must not be resolved under the
            # local data root — that would silently read the wrong file
            raise ValueError(
                f"cannot load non-relative address "
                f"{row.get('address')!r} without a content_loader"
            )
        addr = row.get("address") or ""
        base = getattr(repo.store, "data_root", repo.root)
        p = addr if os.path.isabs(addr) else os.path.join(base, addr)
        if not os.path.exists(p):
            raise FileNotFoundError(addr)
        with open(p, "rb") as f:
            data = f.read()
    if not isinstance(data, bytes):
        return data
    # valid utf-8 stays real text; anything else (parquet, images)
    # decodes latin-1 so EVERY byte round-trips through Lua strings —
    # encoding/parquet & crypto re-encode with the same convention
    # (hostmods.lua_bytes); utf-8-replace would corrupt binary payloads
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def _entry_to_object_stats(row) -> dict:
    if hasattr(row, "asDict"):  # pyspark Row
        row = row.asDict()
    lm = row.get("last_modified")
    mtime = 0
    if lm is not None:
        try:
            mtime = int(lm.timestamp())
        except (AttributeError, OSError, ValueError):
            mtime = 0
    if row.get("is_common_prefix"):
        return {"path": row["key"], "path_type": "common_prefix"}
    return {
        "path": row["key"],
        "path_type": "object",
        "physical_address": row.get("address"),
        "checksum": row.get("etag"),
        "size_bytes": row.get("size"),
        "mtime": mtime,
        "content_type": row.get("content_type"),
    }


def make_lakefs_client(repo, content_loader=None, cleanups: list | None = None) -> LuaTable:
    """The ``lakefs`` module: a client over THIS engine's repository
    (the reference routes these through its own API server in-process —
    client.go:258-283; same contract, no HTTP hop here)."""
    from lakefs_spark.catalog import Catalog

    cat = Catalog(repo)
    _diff_cache: dict = {}  # (left, right) -> cached diff DataFrame

    def _drop_diff_cache():
        for df in _diff_cache.values():
            df.unpersist()
        _diff_cache.clear()

    if cleanups is not None:
        # run_lua_hook unpersists at hook end — a cached diff must not
        # occupy executor storage after the hook returns
        cleanups.append(_drop_diff_cache)

    def list_objects(repo_id, ref, after=None, prefix=None, delimiter=None,
                     amount=None, _user_meta=None):
        try:
            resp = cat.list_objects(
                ref,
                prefix=prefix or "",
                after=after or "",
                delimiter=delimiter if delimiter is not None else "",
                amount=int(amount) if amount else 100,
            )
        except Exception as e:  # noqa: BLE001 — HTTP-shaped errors
            return (400, py_to_lua({"message": str(e)}))
        body = {
            "pagination": resp["pagination"],
            "results": [_entry_to_object_stats(r) for r in resp["results"]],
        }
        return (200, py_to_lua(body))

    def get_object(repo_id, ref, path):
        row = cat.get_object(ref, path)
        if row is None:
            return (404, "")
        try:
            return (200, load_entry_content(repo, row, content_loader))
        except (FileNotFoundError, ValueError):
            # gone, or an external address this deployment can't read
            return (410, "")

    def stat_object(repo_id, ref, path, _user_meta=None):
        # parity: the reference returns the RAW JSON body, not a table
        # (client.go statObject pushes rr.Body.String(); stock hooks —
        # delta_exporter.lua — json.unmarshal it themselves)
        row = cat.stat_object(ref, path)
        if row is None:
            return (404, _json.dumps({"message": "not found"}))
        d = dict(row.asDict()) if hasattr(row, "asDict") else dict(row)
        return (200, _json.dumps(_entry_to_object_stats(d), sort_keys=True))

    def create_tag(repo_id, ref, tag_id):
        try:
            repo.create_tag(tag_id, ref)
            return (201, py_to_lua({"id": tag_id}))
        except Exception as e:  # noqa: BLE001
            return (409, py_to_lua({"message": str(e)}))

    def diff_refs(repo_id, left, right, after=None, prefix=None,
                  delimiter=None, amount=None):
        # positional parity with client.go diffRefs: arg 6 is DELIMITER
        # (stock hooks pass "" for a recursive diff), arg 7 amount.
        # Paging stays inside the Spark plan: prefix/after filter +
        # limit(amount+1) BEFORE collect(), so a hook paging a huge
        # post-merge diff pulls O(amount) rows to the driver per call,
        # not O(D) (the reference paginates server-side the same way —
        # pkg/api/controller.go DiffRefs). The diff plan itself is
        # cached per (left, right) so an N-page walk doesn't recompute
        # the range-granular diff N times.
        from lakefs_spark.operators.listing import fold_diff

        limit = int(amount) if amount else 100
        try:
            cache_key = (left, right)
            df = _diff_cache.get(cache_key)
            if df is None:
                for old in _diff_cache.values():  # hooks page one diff at a time
                    old.unpersist()
                _diff_cache.clear()
                df = repo.diff(left, right).cache()
                _diff_cache[cache_key] = df
            # grouped diff + cursor seek = the shared listDiffHelper
            # fold (operators/listing.fold_diff — the same transform
            # backing Catalog.diff_refs_paged)
            folded = fold_diff(
                df, prefix or "", after or "", delimiter or ""
            )
            rows = [r.asDict() for r in folded.limit(limit + 1).collect()]
        except Exception as e:  # noqa: BLE001
            return (400, py_to_lua({"message": str(e)}))
        page, has_more = rows[:limit], len(rows) > limit
        results = [
            {
                "path": r["key"],
                "path_type": (
                    "common_prefix" if r["is_common"] else "object"
                ),
                "type": {"added": "added", "removed": "removed", "changed": "changed",
                         "conflict": "conflict",
                         "prefix_changed": "prefix_changed"}[r["diff_type"]],
            }
            for r in page
        ]
        body = {
            "pagination": {
                "has_more": has_more,
                # the raw diff rows carry "key" (the results rename it
                # to "path"); the cursor must come from the raw row
                "next_offset": page[-1]["key"] if has_more and page else "",
                "results": len(page),
            },
            "results": results,
        }
        return (200, py_to_lua(body))

    return LuaTable(
        {
            "list_objects": list_objects,
            "get_object": get_object,
            "stat_object": stat_object,
            "create_tag": create_tag,
            "diff_refs": diff_refs,
        }
    )


def make_aws_module(export_root: str | None, recorder: list | None = None) -> LuaTable:
    """``aws.s3_client(...)``: a RECORDING stand-in (disclosed) — the
    sandbox has no network, so put_object writes under
    ``export_root/<bucket>/<key>`` and appends to ``recorder``. The
    shape matches pkg/actions/lua/storage/aws/s3.go (put_object /
    get_object / delete_object)."""

    def _safe_path(bucket, key) -> str:
        """Resolve bucket/key under export_root, REJECTING escapes: an
        absolute key would make os.path.join discard the root entirely
        and '..' segments walk out of it — sandboxed Lua must never
        reach arbitrary host paths (the actions.py sandbox contract)."""
        rel = os.path.join(str(bucket).lstrip("/"), str(key).lstrip("/"))
        p = os.path.realpath(os.path.join(export_root, rel))
        root = os.path.realpath(export_root)
        if p != root and not p.startswith(root + os.sep):
            raise LuaError(
                f"s3 stand-in: path escapes the export root: "
                f"s3://{bucket}/{key}"
            )
        return p

    def s3_client(_key=None, _secret=None, _region=None, _endpoint=None):
        def put_object(bucket, key, data):
            if recorder is not None:
                recorder.append({"bucket": bucket, "key": key, "data": data})
            if export_root is not None:
                p = _safe_path(bucket, key)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "w") as f:
                    f.write(lua_tostring(data) if not isinstance(data, str) else data)

        def get_object(bucket, key):
            # reference shape (storage/aws/s3.go GetObject): TWO return
            # values — ("", false) on NoSuchKey, (body, true) on hit;
            # stock hooks (s3_hive_manifest_exporter.lua) branch on the
            # second value, so raising here would abort them
            if export_root is None:
                raise LuaError("s3 stand-in has no export root configured")
            p = _safe_path(bucket, key)
            if not os.path.exists(p):
                return ("", False)
            with open(p) as f:
                return (f.read(), True)

        def delete_object(bucket, key):
            if export_root is not None:
                try:
                    os.remove(_safe_path(bucket, key))
                except FileNotFoundError:
                    pass

        def delete_recursive(bucket, prefix):
            if export_root is None:
                return
            base = _safe_path(bucket, "")  # validates the bucket too
            for dirpath, _dirs, files in os.walk(base):
                for fn in files:
                    p = os.path.join(dirpath, fn)
                    if os.path.relpath(p, base).startswith(str(prefix)):
                        os.remove(p)

        return LuaTable(
            {
                "put_object": put_object,
                "get_object": get_object,
                "delete_object": delete_object,
                "delete_recursive": delete_recursive,
            }
        )

    from lakefs_spark.lua.hostmods import make_glue_client

    return LuaTable(
        {"s3_client": s3_client, "glue_client": make_glue_client(recorder)}
    )


# ---------------------------------------------------------------------------
# catalogexport Lua modules — ORIGINAL re-implementations with the same
# exported names as the reference's shipped scripts, so stock hooks that
# require("lakefs/catalogexport/...") resolve. Cited per module.
# ---------------------------------------------------------------------------

_CATALOGEXPORT_INTERNAL = r"""
-- lakefs/catalogexport/internal: pagination + uri helpers
-- (surface of pkg/actions/lua/lakefs/catalogexport/internal.lua)
local url = require("net/url")
local pathlib = require("path")
local SHORT_LEN = 6

local function short_digest(digest, len)
  return digest:sub(1, len or SHORT_LEN)
end

local function lakefs_paginiated_api(api_call, after)
  local cursor = after
  local more = true
  return function()
    if not more then return nil end
    local code, resp = api_call(cursor)
    if code < 200 or code >= 300 then
      error("lakeFS: api return non-2xx" .. tostring(code))
    end
    more = resp.pagination.has_more
    cursor = resp.pagination.next_offset
    return resp.results
  end
end

local function lakefs_object_pager(client, repo_id, commit_id, after, prefix, delimiter, page_size)
  return lakefs_paginiated_api(function(cursor)
    return client.list_objects(repo_id, commit_id, cursor, prefix, delimiter, page_size or 30)
  end, after)
end

local function ref_from_branch_or_tag(info)
  local ev = info.event_type
  if ev == "pre-create-tag" or ev == "post-create-tag" then
    return info.tag_id
  end
  return info.branch_id
end

local function parse_storage_uri(uri)
  local u = url.parse(uri)
  local key = u.path
  if key:sub(1, 1) == "/" then key = key:sub(2) end
  return { protocol = u.scheme, bucket = u.host, key = key }
end

local function get_storage_uri_prefix(storage_ns, commit_id, info)
  local ref = ref_from_branch_or_tag(info)
  return pathlib.join("/", storage_ns,
    string.format("_lakefs/exported/%s/%s/", ref, short_digest(commit_id)))
end

local function deepcopy(orig)
  if type(orig) ~= "table" then return orig end
  local copy = {}
  for k, v in pairs(orig) do
    copy[deepcopy(k)] = deepcopy(v)
  end
  setmetatable(copy, deepcopy(getmetatable(orig)))
  return copy
end

local function sortedKeys(query, sortFunction)
  local keys, len = {}, 0
  for k, _ in pairs(query) do
    len = len + 1
    keys[len] = k
  end
  table.sort(keys, sortFunction)
  return keys
end

return {
  deepcopy = deepcopy,
  sortedKeys = sortedKeys,
  short_digest = short_digest,
  lakefs_paginiated_api = lakefs_paginiated_api,
  lakefs_object_pager = lakefs_object_pager,
  ref_from_branch_or_tag = ref_from_branch_or_tag,
  parse_storage_uri = parse_storage_uri,
  get_storage_uri_prefix = get_storage_uri_prefix,
}
"""

_CATALOGEXPORT_TABLE_EXTRACTOR = r"""
-- lakefs/catalogexport/table_extractor: _lakefs_tables/ spec loading
-- (surface of pkg/actions/lua/lakefs/catalogexport/table_extractor.lua)
local pathlib = require("path")
local strings = require("strings")
local yaml = require("encoding/yaml")
local utils = require("lakefs/catalogexport/internal")

local TABLES_BASE = "_lakefs_tables/"

local function list_table_descriptor_entries(client, repo_id, commit_id)
  local found = {}
  local pager = utils.lakefs_object_pager(client, repo_id, commit_id, "", TABLES_BASE, "", 30)
  for page in pager do
    for _, entry in ipairs(page) do
      if entry.path_type == "object" and strings.has_suffix(entry.path, ".yaml") then
        local rel = entry.path
        if strings.has_prefix(rel, TABLES_BASE) then
          rel = rel:sub(#TABLES_BASE + 1, #rel)
        end
        if not pathlib.is_hidden(rel) then
          table.insert(found, { physical_address = entry.physical_address, path = entry.path })
        end
      end
    end
  end
  return found
end

local function get_table_descriptor(client, repo_id, ref, logical_path)
  local code, content = client.get_object(repo_id, ref, logical_path)
  if code ~= 200 then
    error("could not fetch data file: HTTP " .. tostring(code) .. " path: " .. logical_path)
  end
  local d = yaml.unmarshal(content)
  d.partition_columns = d.partition_columns or {}
  return d
end

return {
  list_table_descriptor_entries = list_table_descriptor_entries,
  get_table_descriptor = get_table_descriptor,
}
"""

_CATALOGEXPORT_HIVE = r"""
-- lakefs/catalogexport/hive: partition-grouped object iterator
-- (surface of pkg/actions/lua/lakefs/catalogexport/hive.lua)
local pathlib = require("path")
local strings = require("strings")
local utils = require("lakefs/catalogexport/internal")

-- longest prefix of `path` that covers every partition column in order:
-- .../col1=v1/col2=v2/   (returns nil when a column is missing)
local function extract_partitions_path(partitions, path)
  if partitions == nil or #partitions == 0 then
    return ""
  end
  local idx = 1
  for pi, part in ipairs(partitions) do
    local token = "/" .. part .. "="
    if pi == 1 and strings.has_prefix(path, part .. "=") then
      token = part .. "="
    end
    local i, j = string.find(path, token, idx, true)
    if i == nil then return nil end
    local sep = string.find(path, "/", j + 1, true)
    if sep == nil or sep <= j + 1 then return nil end
    idx = sep
  end
  return string.sub(path, 1, idx)
end

local function extract_partition_pager(client, repo_id, commit_id, base_path, partition_cols, page_size)
  local pager = utils.lakefs_object_pager(client, repo_id, commit_id, "", base_path, "", page_size or 30)
  local page = pager()
  local target = ""
  return function()
    if page == nil then return nil end
    local group = {}
    while true do
      if #page == 0 then
        page = pager()
        if page == nil then
          return target, group
        end
      end
      local entry = page[1]
      local pkey = extract_partitions_path(partition_cols, entry.path)
      if not pathlib.is_hidden(entry.path) and pkey ~= nil then
        if target == "" then target = pkey end
        if pkey ~= target then
          local done = target
          target = pkey
          return done, group
        end
        if not (entry.path == pkey and entry.size_bytes == 0) then
          table.insert(group, {
            physical_address = entry.physical_address,
            path = entry.path,
            size = entry.size_bytes,
            checksum = entry.checksum,
          })
        end
      end
      table.remove(page, 1)
    end
  end
end

return { extract_partition_pager = extract_partition_pager,
         extract_partitions_path = extract_partitions_path }
"""

_CATALOGEXPORT_SYMLINK = r"""
-- lakefs/catalogexport/symlink_exporter: Hive symlink.txt files per
-- partition (surface of pkg/actions/lua/lakefs/catalogexport/
-- symlink_exporter.lua: export_s3(s3_client, table_src_path,
-- action_info, options))
local extractor = require("lakefs/catalogexport/table_extractor")
local hive = require("lakefs/catalogexport/hive")
local utils = require("lakefs/catalogexport/internal")
local pathlib = require("path")
local strings = require("strings")
local lakefs = require("lakefs")

local function symlink_iterator(repo_id, commit_id, table_src_path, opts)
  opts = opts or {}
  local d = extractor.get_table_descriptor(lakefs, repo_id, commit_id, table_src_path)
  if d.type ~= "hive" then
    error("table " .. tostring(d.type) .. " in path " .. table_src_path .. " not supported")
  end
  local pager = hive.extract_partition_pager(lakefs, repo_id, commit_id, d.path, d.partition_columns)
  return function()
    local pkey, entries = pager()
    if pkey == nil then return nil end
    local data = ""
    for _, e in ipairs(entries) do
      data = data .. e.physical_address .. "\n"
    end
    local suffix
    if #d.partition_columns == 0 then
      suffix = d.name .. "/symlink.txt"
    else
      suffix = pkey
      if not opts.skip_trim_obj_base_path then
        suffix = strings.replace(suffix, d.path .. "/", "", 1)
      end
      suffix = pathlib.join("/", d.name, suffix, "symlink.txt")
    end
    return { key_suffix = suffix, data = data }
  end
end

local function export_s3(s3_client, table_src_path, action_info, options)
  local opts = options or {}
  local base = opts.export_base_uri or action_info.storage_namespace
  local uri = utils.get_storage_uri_prefix(base, action_info.commit_id, action_info)
  local loc = utils.parse_storage_uri(uri)
  local put = opts.writer or s3_client.put_object
  local it = symlink_iterator(action_info.repository_id, action_info.commit_id, table_src_path, opts)
  for link in it do
    put(loc.bucket, pathlib.join("/", loc.key, link.key_suffix), link.data)
  end
  return { location = loc }
end

return { export_s3 = export_s3 }
"""

_CATALOGEXPORT_DELTA = r"""
-- lakefs/catalogexport/delta_exporter: materialize a repo-committed
-- Delta Lake _delta_log with physical addresses for external readers
-- (surface and control flow of pkg/actions/lua/lakefs/catalogexport/
-- delta_exporter.lua: export_delta_log, changed_table_defs; Apache-2.0)
local lakefs = require("lakefs")
local pathlib = require("path")
local json = require("encoding/json")
local utils = require("lakefs/catalogexport/internal")
local extractor = require("lakefs/catalogexport/table_extractor")
local strings = require("strings")
local url = require("net/url")
local z85 = require("encoding/z85enc")

local function table_not_empty(t)
  return next(t) ~= nil
end

-- zero-padded 20-digit version keys per the Delta protocol
local function delta_log_entry_key_generator()
  local current = 0
  return function()
    local key = tostring(current)
    local padded = ""
    for _ = 1, 20 - key:len() do padded = padded .. "0" end
    current = current + 1
    return padded .. key .. ".json"
  end
end

local function get_table_descriptor(repo, ref, table_name_yaml, table_descriptors_path)
  local tny = table_name_yaml
  if not strings.has_suffix(tny, ".yaml") then tny = tny .. ".yaml" end
  local table_src_path = pathlib.join("/", table_descriptors_path, tny)
  return extractor.get_table_descriptor(lakefs, repo, ref, table_src_path)
end

-- resolve a deletion vector's .bin file to its physical address
local function resolve_dv(repo, commit_id, table_path, path_transformer, dv, file_path)
  if dv.storageType == "i" then return end
  local dv_full_path
  if dv.storageType == "p" then
    dv_full_path = pathlib.join("/", table_path, dv.pathOrInlineDv)
  elseif dv.storageType == "u" then
    local uuid, prefix = z85.decode_uuid(dv.pathOrInlineDv)
    local dv_filename = "deletion_vector_" .. uuid .. ".bin"
    if prefix ~= "" then dv_filename = prefix .. "/" .. dv_filename end
    dv_full_path = pathlib.join("/", table_path, dv_filename)
  else
    error(string.format("unknown deletion vector storageType=%s on file %s",
      tostring(dv.storageType), tostring(file_path)))
  end
  local dv_code, dv_obj = lakefs.stat_object(repo, commit_id, dv_full_path)
  if dv_code == 200 then
    local dv_stat = json.unmarshal(dv_obj)
    local dv_u = url.parse(dv_stat["physical_address"])
    local dv_physical = url.build_url(dv_u["scheme"], dv_u["host"], dv_u["path"])
    if path_transformer ~= nil then dv_physical = path_transformer(dv_physical) end
    dv.storageType = "p"
    dv.pathOrInlineDv = dv_physical
  end
end

local function export_delta_log(action, table_def_names, write_object, delta_client,
                                table_descriptors_path, path_transformer)
  local repo = action.repository_id
  local commit_id = action.commit_id
  if not commit_id then error("missing commit id") end
  local ns = action.storage_namespace
  if ns == nil then error("failed getting storage namespace for repo " .. repo) end
  local response = {}
  for _, table_name_yaml in ipairs(table_def_names) do
    local descriptor = get_table_descriptor(repo, commit_id, table_name_yaml, table_descriptors_path)
    local table_path = descriptor.path
    if not table_path then error("table path is required to proceed with Delta catalog export") end
    local table_name = descriptor.name
    if not table_name then error("table name is required to proceed with Delta catalog export") end

    local t, metadata = delta_client.get_table(repo, commit_id, table_path)
    local sorted_versions = utils.sortedKeys(t)
    local table_log = {}
    local key_gen = delta_log_entry_key_generator()
    local unfound_paths = {}
    for _, version in ipairs(sorted_versions) do
      local entry_log = {}
      for _, e in ipairs(t[version]) do
        local entry = json.unmarshal(e)
        local p = ""
        if entry.add ~= nil then p = entry.add.path
        elseif entry.remove ~= nil then p = entry.remove.path
        elseif entry.cdc ~= nil then p = entry.cdc.path end
        if p ~= "" then
          local unescaped_path = url.query_unescape(p)
          if not unescaped_path then error("failed unescaping path: " .. p) end
          unescaped_path = pathlib.join("/", table_path, unescaped_path)
          local code, obj = lakefs.stat_object(repo, commit_id, unescaped_path)
          if code == 200 then
            local obj_stat = json.unmarshal(obj)
            -- rebuild the physical url so each part is escaped correctly
            local u = url.parse(obj_stat["physical_address"])
            local physical_path = url.build_url(u["scheme"], u["host"], u["path"])
            if path_transformer ~= nil then physical_path = path_transformer(physical_path) end
            if entry.add ~= nil then
              entry.add.path = physical_path
              if entry.add.deletionVector then
                resolve_dv(repo, commit_id, table_path, path_transformer,
                  entry.add.deletionVector, entry.add.path)
              end
            elseif entry.remove ~= nil then
              entry.remove.path = physical_path
              if entry.remove.deletionVector then
                resolve_dv(repo, commit_id, table_path, path_transformer,
                  entry.remove.deletionVector, entry.remove.path)
              end
            elseif entry.cdc ~= nil then
              entry.cdc.path = physical_path
            end
          elseif code == 404 then
            if entry.remove ~= nil or entry.cdc ~= nil then
              -- vacuumed remove/cdc target: skip silently
              unfound_paths[unescaped_path] = nil
            else
              unfound_paths[unescaped_path] = true
            end
          else
            error("failed stat_object with code: " .. tostring(code) ..
                  ", and path: " .. unescaped_path)
          end
        end
        table.insert(entry_log, json.marshal(entry))
      end
      table_log[key_gen()] = entry_log
    end

    if table_not_empty(unfound_paths) then
      local unfound = ""
      for p, v in pairs(unfound_paths) do
        if v ~= nil then unfound = pathlib.join(" ", unfound, p) end
      end
      error("The following objects were not found: " .. unfound)
    end

    local table_export_prefix = utils.get_storage_uri_prefix(ns, commit_id, action)
    local table_physical_path = pathlib.join("/", table_export_prefix, table_name)
    local table_log_physical_path = pathlib.join("/", table_physical_path, "_delta_log")
    local storage_props = utils.parse_storage_uri(table_log_physical_path)
    for entry_version, table_entry in pairs(table_log) do
      local content = ""
      -- one action per line: the Delta protocol's commit files are
      -- newline-delimited JSON (the reference concatenates marshaled
      -- actions with no separator, which line-based Delta readers
      -- cannot split — deliberate deviation, disclosed)
      for _, line in ipairs(table_entry) do content = content .. line .. "\n" end
      write_object(storage_props.bucket, storage_props.key .. "/" .. entry_version, content)
    end
    if path_transformer ~= nil then
      table_physical_path = path_transformer(table_physical_path)
    end
    response[table_name_yaml] = { path = table_physical_path, metadata = metadata }
  end
  return response
end

-- filter table defs to those whose data changed between two refs
local function changed_table_defs(table_def_names, table_descriptors_path, repository_id, ref, compare_ref)
  local after = ""
  local table_descriptors_paths = {}
  for _, table_name_yaml in ipairs(table_def_names) do
    if not table_descriptors_paths[table_name_yaml] then
      local descriptor = get_table_descriptor(repository_id, compare_ref, table_name_yaml, table_descriptors_path)
      if descriptor.path ~= nil then
        table_descriptors_paths[table_name_yaml] = descriptor.path
      else
        table_descriptors_paths[table_name_yaml] = ""
      end
    end
  end
  local changed = {}
  local already = {}  -- the reference re-inserts a table once PER diff
  -- page that touches it, double-exporting heavily-changed tables;
  -- dedupe across pages (deliberate fix, disclosed)
  while true do
    local status, diff_resp = lakefs.diff_refs(repository_id, ref, compare_ref, after)
    if status ~= 200 then
      error("Failed to perform diff_refs with status: " .. tostring(status) ..
            " ref: " .. ref .. " compare_ref: " .. compare_ref .. " after: " .. after)
    end
    local changed_path_set = {}
    for _, diff_item in ipairs(diff_resp.results) do
      local dir = pathlib.extract_dir_name(diff_item.path)
      if dir then changed_path_set[dir] = true end
    end
    for table_name_yaml, path in pairs(table_descriptors_paths) do
      if path ~= "" and not already[table_name_yaml] then
        for changed_path, value in pairs(changed_path_set) do
          if value and strings.has_prefix(changed_path, path) then
            table.insert(changed, table_name_yaml)
            already[table_name_yaml] = true
            break
          end
        end
      end
    end
    if not diff_resp.pagination or not diff_resp.pagination.has_more then break end
    after = diff_resp.pagination.next_offset
  end
  return changed
end

return {
  export_delta_log = export_delta_log,
  changed_table_defs = changed_table_defs,
}
"""

_CATALOGEXPORT_GLUE = r"""
-- lakefs/catalogexport/glue_exporter: register a Hive-descriptor table
-- in AWS Glue over its exported symlink location (surface and control
-- flow of pkg/actions/lua/lakefs/catalogexport/glue_exporter.lua;
-- Apache-2.0)
local pathlib = require("path")
local json = require("encoding/json")
local lakefs = require("lakefs")
local extractor = require("lakefs/catalogexport/table_extractor")
local utils = require("lakefs/catalogexport/internal")

local function get_full_table_name(descriptor, action_info)
  local branch_or_tag = utils.ref_from_branch_or_tag(action_info)
  local sha = utils.short_digest(action_info.commit_id)
  return string.format("%s_%s_%s_%s", descriptor.name, action_info.repository_id,
    branch_or_tag, sha)
end

local types_mapping = { integer = "int" }

local function hive_col_to_glue(col)
  return {
    Name = col.name,
    Type = types_mapping[col.type] or col.type,
    Comment = col.comment,
    Parameters = col.parameters,
  }
end

local function hive_partitions_to_glue_input(descriptor)
  local partitions = {}
  local cols = descriptor.schema.fields or {}
  for _, c in ipairs(cols) do cols[c.name] = c end
  -- partition order determines the storage path layout
  for _, part_key in ipairs(descriptor.partition_columns) do
    local col = cols[part_key]
    if col == nil then
      error(string.format("partition name `%s` not found in table `%s`",
        part_key, descriptor.name))
    end
    table.insert(partitions, hive_col_to_glue(col))
  end
  return partitions
end

local function hive_columns_to_glue_input(descriptor)
  local partition_names = {}
  for _, p in ipairs(descriptor.partition_columns) do partition_names[p] = true end
  local columns = {}
  for _, col in ipairs(descriptor.schema.fields or {}) do
    if not partition_names[col.name] then
      table.insert(columns, hive_col_to_glue(col))
    end
  end
  return columns
end

local function get_table_location(storage_base_prefix, descriptor, action_info)
  local export_base_uri = utils.get_storage_uri_prefix(storage_base_prefix,
    action_info.commit_id, action_info)
  return pathlib.join("/", export_base_uri, descriptor.name)
end

local function build_glue_create_table_input(base_input, descriptor, symlink_location,
    columns, partitions, action_info, options)
  local input = utils.deepcopy(base_input)
  local opts = options or {}
  input.Name = opts.table_name or get_full_table_name(descriptor, action_info)
  input.PartitionKeys = array(partitions)
  input.TableType = "EXTERNAL_TABLE"
  input.StorageDescriptor.Columns = array(columns)
  input.StorageDescriptor.Location = symlink_location
  return input
end

local function export_glue(glue, db, table_src_path, create_table_input, action_info, options)
  local opts = options or {}
  local repo_id = action_info.repository_id
  local commit_id = action_info.commit_id
  local descriptor = extractor.get_table_descriptor(lakefs, repo_id, commit_id, table_src_path)
  local base_prefix = opts.export_base_uri or action_info.storage_namespace
  local symlink_location = get_table_location(base_prefix, descriptor, action_info)

  local columns = {}
  local partitions = {}
  if descriptor.type == "hive" then
    partitions = hive_partitions_to_glue_input(descriptor)
    columns = hive_columns_to_glue_input(descriptor)
  else
    error("table " .. descriptor.type .. " in path " .. table_src_path .. " not supported")
  end

  if opts.create_db_input ~= nil then
    glue.create_database(db, { error_on_already_exists = false,
                               create_db_input = opts.create_db_input })
    if opts.debug then print("success creating / verifying glue database") end
  end

  local table_input = build_glue_create_table_input(create_table_input, descriptor,
    symlink_location, columns, partitions, action_info, opts)
  local json_input = json.marshal(table_input)
  if opts.debug then print("Creating Glue Table - input:", json_input) end
  glue.create_table(db, json_input)
  return { table_input = table_input }
end

return {
  get_full_table_name = get_full_table_name,
  export_glue = export_glue,
}
"""

_CATALOGEXPORT_UNITY = r"""
-- lakefs/catalogexport/unity_exporter: register exported Delta tables
-- in Databricks Unity Catalog (surface and control flow of
-- pkg/actions/lua/lakefs/catalogexport/unity_exporter.lua; Apache-2.0)
local strings = require("strings")
local pathlib = require("path")
local lakefs = require("lakefs")
local extractor = require("lakefs/catalogexport/table_extractor")

-- delta_table_details: { <table name yaml>: {path=..., metadata=...} }
-- (the response shape of delta_exporter.export_delta_log)
local function register_tables(action, table_descriptors_path, delta_table_details,
                               databricks_client, warehouse_id)
  local repo = action.repository_id
  local commit_id = action.commit_id
  if not commit_id then error("missing commit id") end
  local branch_id = action.branch_id
  local response = {}
  for table_name_yaml, table_details in pairs(delta_table_details) do
    local tny = table_name_yaml
    if not strings.has_suffix(tny, ".yaml") then tny = tny .. ".yaml" end
    local table_src_path = pathlib.join("/", table_descriptors_path, tny)
    local descriptor = extractor.get_table_descriptor(lakefs, repo, commit_id, table_src_path)
    local table_name = descriptor.name
    if not table_name then
      error("table name is required to proceed with unity catalog export")
    end
    if descriptor.type ~= "delta" then
      error("unity exporter supports only table descriptors of type 'delta'. " ..
            "registration failed for table " .. table_name)
    end
    local catalog = descriptor.catalog
    if not catalog then
      error("catalog name is required to proceed with unity catalog export")
    end
    local schema_name = databricks_client.create_schema(branch_id, catalog, true)
    if not schema_name then
      error("failed creating/getting catalog's schema: " .. catalog .. "." .. branch_id)
    end
    local status = databricks_client.register_external_table(table_name,
      table_details.path, warehouse_id, catalog, schema_name, table_details.metadata)
    response[table_name_yaml] = status
  end
  return response
end

return {
  register_tables = register_tables,
}
"""

_LUA_MODULES = {
    "lakefs/catalogexport/internal": _CATALOGEXPORT_INTERNAL,
    "lakefs/catalogexport/table_extractor": _CATALOGEXPORT_TABLE_EXTRACTOR,
    "lakefs/catalogexport/hive": _CATALOGEXPORT_HIVE,
    "lakefs/catalogexport/symlink_exporter": _CATALOGEXPORT_SYMLINK,
    "lakefs/catalogexport/delta_exporter": _CATALOGEXPORT_DELTA,
    "lakefs/catalogexport/glue_exporter": _CATALOGEXPORT_GLUE,
    "lakefs/catalogexport/unity_exporter": _CATALOGEXPORT_UNITY,
}


# ---------------------------------------------------------------------------
# environment assembly
# ---------------------------------------------------------------------------


def make_hook_env(
    *,
    action: dict | None = None,
    args: dict | None = None,
    output_sink=None,
    repo=None,
    content_loader=None,
    export_root: str | None = None,
    export_recorder: list | None = None,
    extra_modules: dict | None = None,
    cleanups: list | None = None,
) -> LuaTable:
    """Globals for one hook run: base library + ``action``/``args`` +
    ``require`` over the registered modules (lua.go:38-171). Modules
    holding engine resources (the lakefs client's cached diff) append
    release callbacks to ``cleanups``; run_lua_hook fires them."""
    g = make_base_env(output_sink)
    g.set("action", py_to_lua(action or {}))
    g.set("args", py_to_lua(args or {}))

    from lakefs_spark.lua.hostmods import (
        PY_HOST_MODULES,
        make_databricks_module,
        make_formats_module,
    )

    py_modules = {
        "strings": _mod_strings,
        "path": _mod_path,
        "regexp": _mod_regexp,
        "encoding/json": _mod_json,
        "encoding/yaml": _mod_yaml,
        "net/url": _mod_url,
        "hook": _mod_hook,
        **PY_HOST_MODULES,
    }
    if repo is not None:
        py_modules["lakefs"] = lambda: make_lakefs_client(
            repo, content_loader, cleanups
        )
        py_modules["formats"] = lambda: make_formats_module(repo, content_loader)
    py_modules["aws"] = lambda: make_aws_module(export_root, export_recorder)
    py_modules["databricks"] = lambda: make_databricks_module(export_recorder)

    from lakefs_spark.lua.hostmods import make_azure_module, make_gcloud_module

    py_modules["azure"] = lambda: make_azure_module(export_root, export_recorder)
    py_modules["gcloud"] = lambda: make_gcloud_module(export_root, export_recorder)

    # the `array` global (pkg/actions/lua/util/deep_pull.go luaArray):
    # tags a table so marshaling renders it as a JSON array even when
    # empty — glue create-table inputs rely on [] vs {}
    def lua_array(t=None):
        if t is None:
            t = LuaTable()
        if not isinstance(t, LuaTable):
            raise LuaError("array: table expected")
        mt = t.metatable if isinstance(t.metatable, LuaTable) else LuaTable()
        mt.set("__lua_array", True)
        t.metatable = mt
        return t

    g.set("array", lua_array)

    loaded: dict[str, LuaTable] = {}

    def lua_require(name):
        name = lua_tostring(name).replace(".", "/")
        if name in loaded:
            return loaded[name]
        if extra_modules and name in extra_modules:
            val = extra_modules[name]
            mod = val() if callable(val) and not isinstance(val, LuaTable) else val
        elif name in py_modules:
            mod = py_modules[name]()
        elif name in _LUA_MODULES:
            out = run_lua(_LUA_MODULES[name], g, chunkname=name)
            mod = out[0] if out else LuaTable()
        else:
            raise LuaUnsupportedFeature(
                f"module '{name}' not found (available: "
                f"{', '.join(sorted([*py_modules, *_LUA_MODULES]))})"
            )
        loaded[name] = mod
        return mod

    g.set("require", lua_require)
    return g


def run_lua_hook(
    script: str,
    *,
    action: dict | None = None,
    args: dict | None = None,
    output_sink=None,
    repo=None,
    content_loader=None,
    export_root: str | None = None,
    export_recorder: list | None = None,
    chunkname: str = "hook",
) -> list:
    """Compile + run one hook script in a fresh environment; returns
    the chunk's return values. Raises LuaError on any Lua-side error
    (the caller maps it to hook abort / task-row status)."""
    cleanups: list = []
    env = make_hook_env(
        action=action,
        args=args,
        output_sink=output_sink,
        repo=repo,
        content_loader=content_loader,
        export_root=export_root,
        export_recorder=export_recorder,
        cleanups=cleanups,
    )
    try:
        return run_lua(script, env, chunkname=chunkname)
    finally:
        for release in cleanups:
            try:
                release()
            except Exception:  # noqa: BLE001 — cleanup must not mask
                pass
