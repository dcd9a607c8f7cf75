"""Reference Lua hook scenarios ported to the ``type: script`` runner.

The reference ships an embedded Lua VM plus a hook stdlib
(pkg/actions/lua.go, pkg/actions/lua/lakefs/catalogexport/*.lua,
examples/hooks/*.lua). This engine's sandboxed mini-script runner
carries the same injected surface (``action``, ``args``, ``output``,
``fail``), so real reference hook scenarios port line-for-line in
shape. Three are fixed here as executable fixtures:

1. ``commit_metadata_validator.lua`` — pre-commit gate requiring
   metadata fields, with a containment pattern per field (the Lua
   original uses ``regexp.match``; the sandbox has no regex module,
   so the port's ``contains`` check is the disclosed narrowing).
2. ``action_logger.lua`` — dumps the event record to hook output.
3. ``gcsfuse_symlink_exporter.lua`` — a post-commit hook triggering
   the symlink catalog export (lua/lakefs/catalogexport/
   symlink_exporter.lua); the port calls the engine's exporter
   registry via the injected ``export(name, ...)`` global.

A spec that stays ``type: lua`` is NOT silently rerouted: dispatch
records an ``unsupported: lua`` task result (tested in
tests/test_actions.py).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from lakefs_spark.storage import actions as A
from lakefs_spark.storage.repo import HookAbortError, Repository


def _repo(spark):
    return Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_luaport_"))


def _entry(key, ident="i1"):
    return {"key": key, "identity": ident, "size": 1, "etag": ident}


# -- 1. commit metadata validator (examples/hooks/commit_metadata_validator.lua)

METADATA_VALIDATOR_YAML = """
name: pre commit metadata field check
on:
  pre-commit:
    branches: ["main"]
hooks:
  - id: check_commit_metadata
    type: script
    properties:
      args:
        notebook_url: {contains: "my-jupyter.example.com/"}
        spark_version: {}
      script: |
        md = action['commit_metadata']
        for k in sorted(args):
            props = args[k]
            cur = md.get(k)
            if cur is None:
                fail('missing mandatory metadata field: ' + k)
            pat = props.get('contains')
            if pat is not None and pat not in cur:
                fail('commit metadata field ' + k + ' does not match: '
                     + pat + ' - got: ' + cur)
"""


def test_commit_metadata_validator_port(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(METADATA_VALIDATOR_YAML)
    repo.set_entry("main", _entry("a/1"))
    with pytest.raises(HookAbortError, match="missing mandatory metadata field"):
        repo.commit("main", "no metadata")
    with pytest.raises(HookAbortError, match="does not match"):
        repo.commit("main", "bad url", metadata={
            "notebook_url": "http://elsewhere.example.com/nb/1",
            "spark_version": "4.1.2",
        })
    c = repo.commit("main", "ok", metadata={
        "notebook_url": "https://my-jupyter.example.com/user/nb/1",
        "spark_version": "4.1.2",
    })
    assert repo._read_branch("main")["head"] == c.commit_id
    statuses = [t["status"] for t in svc.task_results()]
    assert statuses == ["completed", "failed", "failed"]  # newest first


def test_metadata_validator_applies_to_merges(spark):
    """The Lua original's example declaration is a pre-MERGE gate: the
    pending merge's metadata must reach the hook ctx just like
    pre-commit's does."""
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(METADATA_VALIDATOR_YAML.replace("pre-commit", "pre-merge"))
    repo.set_entry("main", _entry("a/1"))
    repo.commit("main", "base")
    repo.create_branch("dev", "main")
    repo.set_entry("dev", _entry("a/2", "i2"))
    repo.commit("dev", "work")
    with pytest.raises(HookAbortError, match="missing mandatory metadata field"):
        repo.merge("dev", "main")
    mc = repo.merge("dev", "main", metadata={
        "notebook_url": "https://my-jupyter.example.com/user/nb/1",
        "spark_version": "4.1.2",
    })
    assert repo._read_branch("main")["head"] == mc.commit_id


# -- 2. action logger (examples/hooks/action_logger.lua) ----------------------

ACTION_LOGGER_YAML = """
name: action logger
on:
  post-commit: null
hooks:
  - id: log_event
    type: script
    properties:
      script: |
        for k in sorted(action):
            if k not in ('event_time', 'run_id', 'pre'):
                output(k + '=' + str(action[k]))
"""


def test_action_logger_port(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(ACTION_LOGGER_YAML)
    repo.set_entry("main", _entry("a/1"))
    c = repo.commit("main", "logged commit", metadata={"team": "data"})
    run_id = svc.task_results()[0]["run_id"]
    lines = svc.hook_output(run_id)
    got = dict(ln.split("=", 1) for ln in lines)
    assert got["event_type"] == "post-commit"
    assert got["commit_id"] == c.commit_id
    assert got["commit_message"] == "logged commit"
    assert got["commit_metadata"] == str({"team": "data"})
    assert got["branch_id"] == "main"


# -- 3. symlink exporter trigger (examples/hooks/gcsfuse_symlink_exporter.lua,
#       pkg/actions/lua/lakefs/catalogexport/symlink_exporter.lua) ------------

SYMLINK_TRIGGER_YAML = """
name: symlink exports
on:
  post-commit:
    branches: ["main"]
hooks:
  - id: symlink_exporter
    type: script
    properties:
      script: |
        n = export('symlinks', action['branch_id'])
        output('exported_dirs=' + str(n))
"""


def test_symlink_exporter_trigger_port(spark, tmp_path):
    from lakefs_spark.operators.export import write_symlinks

    out_dir = str(tmp_path / "symlinks")

    def symlink_exporter(repo, ref):
        return write_symlinks(repo.snapshot(ref).select("key", "address"), out_dir)

    repo = _repo(spark)
    svc = A.ActionsService(repo, exporters={"symlinks": symlink_exporter})
    svc.add_action(SYMLINK_TRIGGER_YAML)
    for i in range(3):
        repo.set_entry("main", {
            "key": f"tables/t1/part-{i}", "identity": f"i{i}", "size": 1,
            "etag": f"e{i}", "address": f"data/a{i}", "address_type": "RELATIVE",
        })
    repo.commit("main", "export me")
    run_id = svc.task_results()[0]["run_id"]
    assert svc.hook_output(run_id) == ["exported_dirs=1"]
    manifest = os.path.join(out_dir, "tables/t1/symlink.txt")
    with open(manifest) as f:
        assert f.read().splitlines() == ["data/a0", "data/a1", "data/a2"]


def test_unknown_exporter_aborts_with_clear_error(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo, exporters={"symlinks": lambda r, ref: 0})
    svc.add_action("""
name: bad exporter
on:
  pre-commit: null
hooks:
  - id: export_check
    type: script
    properties:
      script: "export('glue', action['branch_id'])"
""")
    repo.set_entry("main", _entry("a/1"))
    with pytest.raises(HookAbortError, match="unknown exporter"):
        repo.commit("main", "nope")
