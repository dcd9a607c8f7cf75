"""Embedded Lua: interpreter semantics + stock-hook scenarios.

The reference embeds a Lua 5.3 VM for ``type: lua`` hooks
(pkg/actions/lua.go:38-171) with a curated stdlib
(pkg/actions/lua/{strings,path,regexp,encoding,net,lakefs}). These
tests pin (a) the language semantics our interpreter implements, (b)
the host-module contracts against the Go modules' documented behavior,
and (c) three reference hook scenarios running as REAL ``type: lua``
scripts — including the catalogexport symlink-exporter chain
(pkg/actions/lua/lakefs/catalogexport/symlink_exporter.lua) against a
live Repository.
"""

from __future__ import annotations

import pytest

from lakefs_spark.lua import LuaError, LuaTable, run_lua
from lakefs_spark.lua.modules import lua_to_py, py_to_lua, run_lua_hook
from lakefs_spark.lua.stdlib import make_base_env


def run(src, **globals_):
    out = []
    from lakefs_spark.lua.modules import make_hook_env

    g = make_hook_env(output_sink=out.append)
    for k, v in globals_.items():
        g.set(k, py_to_lua(v))
    ret = run_lua(src, g)
    return ret, out


# -- language semantics ------------------------------------------------------


def test_closures_upvalues_multiple_returns():
    ret, _ = run(
        """
        local function mk()
          local n = 0
          return function() n = n + 1 return n, n * n end
        end
        local c = mk()
        c()
        local a, b = c()
        return a, b
        """
    )
    assert ret == [2, 4]


def test_varargs_and_select():
    ret, _ = run(
        """
        local function f(...)
          local n = select('#', ...)
          local first = select(1, ...)
          return n, first
        end
        return f('x', 'y', 'z')
        """
    )
    assert ret == [3, "x"]


def test_generic_for_over_pairs_and_ipairs():
    ret, _ = run(
        """
        local sum, cat = 0, ""
        for _, v in pairs({a = 1, b = 2}) do sum = sum + v end
        for i, v in ipairs({'p', 'q'}) do cat = cat .. i .. v end
        return sum, cat
        """
    )
    assert ret == [3, "1p2q"]


def test_string_methods_and_length():
    ret, _ = run(
        """
        local s = "hello/world"
        return s:sub(1, 5), s:upper(), #s, ("%d-%s"):format(7, "x")
        """
    )
    assert ret == ["hello", "HELLO/WORLD", 11, "7-x"]


def test_lua_patterns_find_match_gsub_gmatch():
    ret, _ = run(
        """
        local i, j, cap = string.find("part=33/z", "part=(%d+)")
        local m = string.match("a-b-c", "([^-]+)-")
        local g, n = string.gsub("x.y.z", "%.", "/")
        local words = {}
        for w in string.gmatch("to be or not", "%a+") do table.insert(words, w) end
        return i, j, cap, m, g, n, table.concat(words, "|")
        """
    )
    assert ret == [1, 7, "33", "a", "x/y/z", 2, "to|be|or|not"]


def test_find_plain_flag_and_init():
    ret, _ = run(
        """
        local i, j = string.find("a(b)c", "(b)", 1, true)
        local k = string.find("aaa", "a", 3)
        return i, j, k
        """
    )
    assert ret == [2, 4, 3]


def test_metatable_index_newindex_call_tostring():
    ret, out = run(
        """
        local log = {}
        local t = setmetatable({}, {
          __index = function(_, k) return "d:" .. k end,
          __newindex = function(tbl, k, v) rawset(tbl, k, v .. "!") end,
          __tostring = function() return "custom" end,
        })
        t.x = "v"
        print(tostring(t))
        return t.x, t.missing
        """
    )
    assert ret == ["v!", "d:missing"]
    assert out == ["custom"]


def test_error_and_pcall_semantics():
    ret, _ = run(
        """
        local ok, err = pcall(function() error("kaboom") end)
        local ok2, v = pcall(function() return 42 end)
        return ok, err, ok2, v
        """
    )
    assert ret == [False, "kaboom", True, 42]


def test_numeric_for_with_step_and_break():
    ret, _ = run(
        """
        local acc = 0
        for i = 1, 100 do
          if i > 5 then break end
          acc = acc + i
        end
        for i = 10, 6, -2 do acc = acc + i end
        return acc
        """
    )
    assert ret == [15 + 10 + 8 + 6]


def test_table_insert_remove_sort_concat():
    ret, _ = run(
        """
        local t = {"b", "c"}
        table.insert(t, "d")
        table.insert(t, 1, "a")
        table.remove(t, 2)
        table.sort(t, function(x, y) return x > y end)
        return table.concat(t, ",")
        """
    )
    assert ret == ["d,c,a"]


def test_integer_float_formatting_matches_lua():
    ret, _ = run("return tostring(3), tostring(3.0), 1 .. '', 2/4")
    assert ret == ["3", "3.0", "1", 0.5]


def test_goto_rejected_and_unfinished_string():
    with pytest.raises(LuaError, match="goto"):
        run("goto done\n::done::")
    with pytest.raises(LuaError, match="unfinished"):
        run('local s = "abc')


def test_instruction_budget_stops_infinite_loop(monkeypatch):
    import lakefs_spark.lua.interp as I

    monkeypatch.setattr(I.Interp, "MAX_STEPS", 10_000)
    with pytest.raises(LuaError, match="instruction budget"):
        run("while true do end")


def test_nil_index_error_message_names_variable():
    with pytest.raises(LuaError, match="nil"):
        run("local x = nil\nreturn x.field")


# -- host modules ------------------------------------------------------------


def test_strings_module_matches_go_contract():
    ret, _ = run(
        """
        local s = require("strings")
        return s.has_prefix("tables/a", "tables/"), s.has_suffix("f.yaml", ".yaml"),
               s.replace("a/b/a", "a", "X", 1), s.contains("abc", "b"),
               s.trim("  x "), table.concat(s.split("a,b,c", ","), "|")
        """
    )
    assert ret == [True, True, "X/b/a", True, "x", "a|b|c"]


def test_path_module_matches_go_contract():
    # pkg/actions/lua/path/path.go Parse/Join/IsHidden
    ret, _ = run(
        """
        local p = require("path")
        local parsed = p.parse("a/b/c.txt")
        return p.join("/", "s3://b/pre", "x/", "/y", "z.txt"),
               parsed.parent, parsed.base_name,
               p.is_hidden("a/_hidden/c"), p.is_hidden("a/b/c"),
               p.default_separator()
        """
    )
    assert ret == ["s3://b/pre/x/y/z.txt", "a/b/", "c.txt", True, False, "/"]


def test_regexp_and_json_and_yaml_and_url():
    ret, _ = run(
        """
        local regexp = require("regexp")
        local json = require("encoding/json")
        local yaml = require("encoding/yaml")
        local url = require("net/url")
        local obj = json.unmarshal('{"a": [1, 2], "b": "x"}')
        local y = yaml.unmarshal("name: t1\\ntype: hive\\npartition_columns:\\n  - c1\\n")
        local u = url.parse("s3://bucket-9/some/key.txt")
        return regexp.match("^v%d+", "v42-rc"), obj.a[2], obj.b,
               y.name, y.type, y.partition_columns[1],
               u.scheme, u.host, u.path, json.marshal({z = 1})
        """
    )
    assert ret == [False, 2, "x", "t1", "hive", "c1", "s3", "bucket-9", "/some/key.txt", '{"z": 1}']
    ret2, _ = run('local r = require("regexp")\nreturn r.match("v\\\\d+", "v42")')
    assert ret2 == [True]


def test_py_lua_value_roundtrip():
    v = {"a": [1, 2, {"b": "x"}], "c": True, "d": None}
    t = py_to_lua(v)
    assert isinstance(t, LuaTable)
    back = lua_to_py(t)
    assert back == {"a": [1, 2, {"b": "x"}], "c": True}  # nil keys vanish (Lua)


# -- reference hook scenarios as real Lua ------------------------------------


def test_metadata_validator_scenario_lua():
    """pre-merge metadata validation — the
    examples/hooks/commit_metadata_validator.lua shape: iterate args,
    regexp-check commit metadata, error() to abort."""
    script = """
    regexp = require("regexp")
    for k, props in pairs(args) do
        local current_value = action.commit.metadata[k]
        if current_value == nil then
            error("missing mandatory metadata field: " .. k)
        end
        if props.pattern and not regexp.match(props.pattern, current_value) then
            error("current value for commit metadata field " .. k ..
                  " does not match pattern: " .. props.pattern ..
                  " - got: " .. current_value)
        end
    end
    """
    good = {"commit": {"metadata": {"notebook_url": "nb.example.com/7", "spark_version": "3.5"}}}
    run_lua_hook(
        script,
        action=good,
        args={"notebook_url": {"pattern": "nb.example.com/.*"}, "spark_version": {}},
    )
    with pytest.raises(LuaError, match="missing mandatory metadata field"):
        run_lua_hook(
            script,
            action={"commit": {"metadata": {}}},
            args={"notebook_url": {"pattern": "x"}},
        )
    with pytest.raises(LuaError, match="does not match pattern"):
        run_lua_hook(
            script,
            action={"commit": {"metadata": {"notebook_url": "evil.com/7"}}},
            args={"notebook_url": {"pattern": "^nb.example.com/.*"}},
        )


def test_action_logger_scenario_lua():
    """examples/hooks/action_logger.lua shape: one-liner JSON dump of
    the action context to the hook output."""
    out = []
    run_lua_hook(
        'json = require("encoding/json")\nprint(json.marshal(action))',
        action={"event_type": "post-commit", "branch_id": "main", "commit_id": "c1"},
        output_sink=out.append,
    )
    import json

    assert json.loads(out[0]) == {
        "event_type": "post-commit",
        "branch_id": "main",
        "commit_id": "c1",
    }


def test_symlink_exporter_scenario_lua(spark, tmp_path):
    """The catalogexport symlink-exporter chain as REAL Lua against a
    live Repository: a hive table spec under _lakefs_tables/, hive-
    partitioned objects, require('lakefs/catalogexport/symlink_exporter')
    .export_s3 — one symlink.txt per partition with the physical
    addresses, keyed under _lakefs/exported/<ref>/<short-sha>/<table>/
    (pkg/actions/lua/lakefs/catalogexport/symlink_exporter.lua,
    hive.lua, table_extractor.lua, internal.lua)."""
    import os as _os

    from lakefs_spark.schema import ENTRY_SCHEMA
    from lakefs_spark.storage.repo import Repository

    root = str(tmp_path / "repo")
    repo = Repository.create(spark, root)

    spec = (
        "name: animals\n"
        "type: hive\n"
        "path: tables/animals\n"
        "partition_columns:\n  - type\n  - weight\n"
    )
    spec_rel = "user/specs/animals.yaml"
    _os.makedirs(_os.path.join(repo.store.data_root, "user/specs"), exist_ok=True)
    with open(_os.path.join(repo.store.data_root, spec_rel), "w") as f:
        f.write(spec)

    def ent(key, address, size=3):
        return (key, f"id-{key}", address, "RELATIVE", size, f"e-{key}", None, None, "text/plain")

    rows = [
        ent("_lakefs_tables/animals.yaml", spec_rel, len(spec)),
        ent("tables/animals/type=axolotl/weight=12/a.csv", "data/pa/a.csv"),
        ent("tables/animals/type=axolotl/weight=12/b.csv", "data/pa/b.csv"),
        ent("tables/animals/type=axolotl/weight=22/c.csv", "data/pb/c.csv"),
        ent("tables/animals/type=cat/weight=4/d.csv", "data/pc/d.csv"),
        # hadoop dir marker: size 0, path == partition prefix -> skipped
        ent("tables/animals/type=cat/weight=4/", "data/pc/marker", 0),
        # hidden file -> skipped
        ent("tables/animals/type=cat/weight=4/_SUCCESS", "data/pc/success"),
    ]
    repo.stage_entries("main", spark.createDataFrame(rows, ENTRY_SCHEMA))
    commit = repo.commit("main", "animals table")

    recorder = []
    script = """
    local exporter = require("lakefs/catalogexport/symlink_exporter")
    local aws = require("aws")
    local s3 = aws.s3_client(args.aws.access_key_id, args.aws.secret_access_key, args.aws.region)
    exporter.export_s3(s3, args.table_source, action, {debug = true})
    """
    run_lua_hook(
        script,
        action={
            "repository_id": "repo1",
            "commit_id": commit.commit_id,
            "branch_id": "main",
            "event_type": "post-commit",
            "storage_namespace": "s3://export-bucket/lakefs-ns",
        },
        args={
            "table_source": "_lakefs_tables/animals.yaml",
            "aws": {"access_key_id": "k", "secret_access_key": "s", "region": "r"},
        },
        repo=repo,
        export_recorder=recorder,
    )

    short = commit.commit_id[:6]
    by_key = {r["key"]: r["data"] for r in recorder}
    base = f"lakefs-ns/_lakefs/exported/main/{short}/animals"
    assert set(by_key) == {
        f"{base}/type=axolotl/weight=12/symlink.txt",
        f"{base}/type=axolotl/weight=22/symlink.txt",
        f"{base}/type=cat/weight=4/symlink.txt",
    }, sorted(by_key)
    assert all(r["bucket"] == "export-bucket" for r in recorder)
    assert sorted(by_key[f"{base}/type=axolotl/weight=12/symlink.txt"].splitlines()) == [
        "data/pa/a.csv",
        "data/pa/b.csv",
    ]
    # marker + hidden file excluded
    assert by_key[f"{base}/type=cat/weight=4/symlink.txt"].splitlines() == ["data/pc/d.csv"]


def test_io_os_coroutine_globals_classify_unsupported():
    """io.write / os.time / coroutine.create must raise
    LuaUnsupportedFeature (-> explicit 'unsupported' task rows), not a
    generic attempt-to-index-nil failure (review finding r7)."""
    from lakefs_spark.lua.interp import LuaUnsupportedFeature

    for src in ('io.write("x")', "local t = os.time()", "coroutine.create(print)"):
        with pytest.raises(LuaUnsupportedFeature):
            run_lua_hook(src)


def test_tostring_metamethod_called_exactly_once():
    out = []
    run_lua_hook(
        """
        local n = 0
        local t = setmetatable({}, {__tostring = function() n = n + 1 return "v" end})
        local s = tostring(t)
        print(s, n)
        """,
        output_sink=out.append,
    )
    assert out == ["v\t1"]


def test_pairs_is_linear_and_delete_during_traversal_legal():
    out = []
    run_lua_hook(
        """
        local t = {}
        for i = 1, 20000 do t["k" .. i] = i end
        local s = 0
        for k, v in pairs(t) do s = s + v end
        print(s)
        local d = {a=1, b=2, c=3}
        for k, v in pairs(d) do if k == "b" then d[k] = nil end end
        local n = 0
        for k, v in pairs(d) do n = n + 1 end
        print(n)
        """,
        output_sink=out.append,
    )
    assert out == ["200010000", "2"]


def test_s3_standin_rejects_path_escape(tmp_path):
    """Keys must never escape the export root (the sandbox contract:
    Lua has no filesystem surface): ../ walks are rejected, absolute
    keys are confined INSIDE the root (S3 keys have no absolute
    meaning), and nothing lands outside."""
    import os as _os

    with pytest.raises(LuaError, match="escapes the export root"):
        run_lua_hook(
            """
            local aws = require("aws")
            local s3 = aws.s3_client("k", "s", "r")
            s3.put_object("bucket", "../../escape.txt", "x")
            """,
            export_root=str(tmp_path),
        )
    run_lua_hook(
        """
        local aws = require("aws")
        local s3 = aws.s3_client("k", "s", "r")
        s3.put_object("bucket", "/abs/looking/key", "x")
        """,
        export_root=str(tmp_path),
    )
    assert _os.path.exists(str(tmp_path / "bucket" / "abs" / "looking" / "key"))
    assert not _os.path.exists("/abs/looking/key")


def test_lakefs_diff_refs_paginates(spark, tmp_path):
    """diff_refs pagination: the next_offset cursor must come from the
    raw diff row's 'key' (review finding r7 — 'path' raised KeyError on
    any page-2 fetch)."""
    from lakefs_spark.schema import ENTRY_SCHEMA
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "r"))
    rows = [
        (f"d/{i:03d}", f"id{i}", f"a/{i}", "RELATIVE", 1, "e", None, None, "t")
        for i in range(7)
    ]
    repo.stage_entries("main", spark.createDataFrame(rows[:1], ENTRY_SCHEMA))
    repo.commit("main", "one")
    repo.create_branch("dev", "main")
    repo.stage_entries("dev", spark.createDataFrame(rows[1:], ENTRY_SCHEMA))
    repo.commit("dev", "more")

    out = []
    run_lua_hook(
        """
        local lakefs = require("lakefs")
        local utils = require("lakefs/catalogexport/internal")
        local pager = utils.lakefs_paginiated_api(function(cursor)
          return lakefs.diff_refs("r", "main", "dev", cursor, "", "", 2)
        end)
        local n = 0
        for page in pager do
          for _, d in ipairs(page) do n = n + 1 end
        end
        print("diffs=" .. n)
        """,
        repo=repo,
        output_sink=out.append,
    )
    assert out == ["diffs=6"]


def test_lakefs_diff_refs_delimiter_groups(spark, tmp_path):
    """diff_refs with a non-empty delimiter returns GROUPED rows like
    the reference (pkg/catalog/catalog.go listDiffHelper:2014-2035 via
    pkg/api/controller.go DiffRefs): one common_prefix row per group,
    always typed prefix_changed; leaf keys pass through as objects; the
    cursor seek skips the whole group the previous page ended on
    (GetStartPos → UpperBoundForPrefix)."""
    from lakefs_spark.schema import ENTRY_SCHEMA
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "r"))
    rows = [
        (k, f"id-{k}", f"a/{k}", "RELATIVE", 1, "e", None, None, "t")
        for k in ["a/1", "a/2", "b/1", "c"]
    ]
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("seed", "id0", "a/seed", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("main", "seed")
    repo.create_branch("dev", "main")
    repo.stage_entries("dev", spark.createDataFrame(rows, ENTRY_SCHEMA))
    repo.commit("dev", "adds")

    out = []
    run_lua_hook(
        """
        local lakefs = require("lakefs")
        local code, body = lakefs.diff_refs("r", "main", "dev", "", "", "/", 10)
        for _, d in ipairs(body.results) do
          print(code .. "|" .. d.path .. "|" .. d.path_type .. "|" .. d.type)
        end
        -- paging: one row per page; the cursor after group "a/" must
        -- skip a/2 and land on group "b/"
        local c2, b2 = lakefs.diff_refs("r", "main", "dev", "", "", "/", 1)
        local cursor = b2.pagination.next_offset
        local c3, b3 = lakefs.diff_refs("r", "main", "dev", cursor, "", "/", 1)
        print("page2=" .. b3.results[1].path .. "|" .. tostring(b3.pagination.has_more))
        """,
        repo=repo,
        output_sink=out.append,
    )
    assert out == [
        "200|a/|common_prefix|prefix_changed",
        "200|b/|common_prefix|prefix_changed",
        "200|c|object|added",
        "page2=b/|true",
    ]


def test_empty_inline_script_falls_back_to_script_path(spark, tmp_path):
    """properties {script: '', script_path: ...} must load and run the
    real script — an empty inline chunk silently 'completing' would be
    a policy-gate bypass (review finding r7)."""
    import os as _os

    from lakefs_spark.schema import ENTRY_SCHEMA
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import HookAbortError, Repository

    repo = Repository.create(spark, str(tmp_path / "r"))
    lua_src = 'error("gate always vetoes")'
    rel = "data/s/veto.lua"
    p = _os.path.join(repo.store.data_root, rel)
    _os.makedirs(_os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(lua_src)
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("scripts/veto.lua", "v1", rel, "RELATIVE", len(lua_src), "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("main", "land script")
    svc = ActionsService(repo)
    svc.add_action(
        {
            "name": "gate",
            "on": {"pre-commit": None},
            "hooks": [
                {"id": "veto", "type": "lua",
                 "properties": {"script": "", "script_path": "scripts/veto.lua"}}
            ],
        }
    )
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("a/1", "i1", "x", "RELATIVE", 1, "e", None, None, "t")], ENTRY_SCHEMA
        ),
    )
    with pytest.raises(HookAbortError, match="gate always vetoes"):
        repo.commit("main", "must be vetoed")


def test_branch_head_exporter_scenario_lua(spark, tmp_path):
    """The examples/hooks/s3_branch_head_exporter.lua shape as a real
    dispatched post-commit hook: the commit id is written to
    <export_path>/repositories/<repo>/heads/<branch> through the aws
    s3 stand-in — proving the post-commit action record carries the
    LANDED commit id and args flow through DescendArgs untouched."""
    import os as _os

    from lakefs_spark.schema import ENTRY_SCHEMA
    from lakefs_spark.storage.repo import Repository

    export_root = str(tmp_path / "exports")
    repo = Repository.create(spark, str(tmp_path / "repo"))
    script = """
    aws = require("aws")
    strings = require("strings")
    s3 = aws.s3_client(args.aws_access_key_id, args.aws_secret_access_key, args.aws_region)
    export_path = args.export_path
    if not strings.has_suffix(export_path, "/") then export_path = export_path .. "/" end
    s3.put_object(args.export_bucket,
      export_path .. "repositories/" .. action.repository_id .. "/heads/" .. action.branch_id,
      action.commit_id)
    """
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("a/1", "i1", "x", "RELATIVE", 1, "e", None, None, "t")], ENTRY_SCHEMA
        ),
    )
    c = repo.commit("main", "landed")
    from lakefs_spark.storage.actions import lua_event_record

    record = lua_event_record(
        repo, "post-commit", {"branch": "main", "commit": c, "run_id": "r1"},
        "export heads", "export_branch_head",
    )
    run_lua_hook(
        script,
        action=record,
        args={
            "aws_access_key_id": "k", "aws_secret_access_key": "s",
            "aws_region": "r", "export_bucket": "ext-bucket",
            "export_path": "lakefs-exported-heads",
        },
        export_root=export_root,
    )
    # repository_id is the repo NAME (graveler's repositoryID), never a
    # host filesystem path — exported keys must not embed local paths
    assert repo.name == "repo"
    p = _os.path.join(
        export_root, "ext-bucket", "lakefs-exported-heads", "repositories",
        "repo", "heads", "main",
    )
    assert _os.path.exists(p), p
    with open(p) as f:
        assert f.read() == c.commit_id
