"""Declarative actions: spec validation (pkg/actions/action.go
Validate + TestAction_Validate scenarios), branch-glob matching,
{{ ENV.* }} arg expansion (lua.go DescendArgs), the sandboxed script
runner (lua.go analog), the airflow DAG-run POST (airflow.go), the
if-expression gating (service.go runHookIfEval), and end-to-end
pre/post event semantics over a Repository."""

from __future__ import annotations

import base64
import json
import tempfile

import pytest

from lakefs_spark.storage import actions as A
from lakefs_spark.storage.repo import HookAbortError, Repository


def _repo(spark):
    return Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_act_"))


def _entry(key, ident="i1"):
    return {"key": key, "identity": ident, "size": 1, "etag": ident}


# -- validation (action.go:71-106) -------------------------------------------


def _spec(**over):
    base = {
        "name": "quality gate",
        "on": {"pre-commit": {"branches": ["main"]}},
        "hooks": [
            {"id": "check", "type": "script", "properties": {"script": "x = 1"}},
        ],
    }
    base.update(over)
    return base


def test_validate_ok():
    A.validate_action(_spec())


@pytest.mark.parametrize(
    "mutate",
    [
        {"name": ""},
        {"name": "*bad*name"},
        {"on": {}},
        {"on": {"not-an-event": None}},
        {"on": {"pre-create-tag": {"branches": ["main"]}}},  # branches on tag event
        {"hooks": [{"id": "", "type": "script", "properties": {"script": "x=1"}}]},
        {"hooks": [{"id": "x", "type": "script", "properties": {"script": "x=1"}}]},  # id too short
        {"hooks": [{"id": "h1", "type": "nope", "properties": {}}]},
        {"hooks": [{"id": "h1", "type": "webhook", "properties": {}}]},  # missing url
        {"hooks": [
            {"id": "h1", "type": "script", "properties": {"script": "x=1"}},
            {"id": "h1", "type": "script", "properties": {"script": "x=1"}},
        ]},  # duplicate id
        {"hooks": [{"id": "h1", "type": "airflow",
                    "properties": {"url": "http://a", "dag_id": "d"}}]},  # missing auth
    ],
)
def test_validate_rejects(mutate):
    with pytest.raises(A.InvalidActionError):
        A.validate_action(_spec(**mutate))


def test_parse_yaml_text():
    spec = A.parse_action(
        """
name: pre commit gate
on:
  pre-commit:
    branches: ["main", "feature-*"]
hooks:
  - id: my_hook
    type: script
    properties:
      script: "output('hi')"
"""
    )
    assert spec["name"] == "pre commit gate"
    assert A.action_matches(spec, "pre-commit", "feature-x")
    assert not A.action_matches(spec, "pre-commit", "dev")
    assert not A.action_matches(spec, "post-commit", "main")


def test_match_no_branch_filter_matches_all():
    spec = A.parse_action(_spec(on={"post-merge": None}))
    assert A.action_matches(spec, "post-merge", "anything")


# -- DescendArgs (lua.go:187-227) --------------------------------------------


def test_expand_args_env():
    env = {"TOKEN": "s3cr3t", "HOST": "db1"}
    got = A.expand_args(
        {"cfg": {"token": "{{ ENV.TOKEN }}", "url": "https://{{ENV.HOST}}/x"},
         "plain": ["a", 7, "{{ ENV.TOKEN }}"]},
        env.get,
    )
    assert got == {"cfg": {"token": "s3cr3t", "url": "https://db1/x"},
                   "plain": ["a", 7, "s3cr3t"]}


def test_expand_args_missing_env_errors():
    with pytest.raises(A.MissingEnvVarError):
        A.expand_args("{{ ENV.NOPE }}", {}.get)


# -- sandbox ------------------------------------------------------------------


@pytest.mark.parametrize(
    "code",
    [
        "import os",
        "from os import path",
        "x = ().__class__",
        "x = __import__('os')",
        "global x",
        # str.format field syntax traverses attributes at runtime —
        # '{0.__class__.__mro__}'.format(x) — so the sinks are denied
        "x = '{0.n}'.format(action)",
        "x = str.format('{0}', 1)",
        "x = {}.format_map({})",
        "x = vars()",
        "x = getattr(action, 'keys')",
        "open('/etc/passwd')",  # allowed to parse? open not in builtins -> NameError at run
    ],
)
def test_sandbox_blocks(code):
    if code.startswith("open("):
        compiled = A.compile_script(code)
        with pytest.raises(NameError):
            A.run_script(compiled, {})
    else:
        with pytest.raises(A.InvalidActionError):
            A.compile_script(code)


def test_script_runs_with_whitelisted_builtins():
    out = []
    code = A.compile_script("output(sum([1, 2, 3]) + len('ab'))")
    A.run_script(code, {"output": lambda v: out.append(v)})
    assert out == [8]


# -- if-expression gating (service.go:403-419) --------------------------------


def test_if_eval_defaults_and_overrides():
    err = RuntimeError("boom")
    assert A.run_hook_if_eval("", None) is True
    assert A.run_hook_if_eval("", err) is False
    assert A.run_hook_if_eval("failure()", err) is True
    assert A.run_hook_if_eval("failure()", None) is False
    assert A.run_hook_if_eval("success() or failure()", err) is True
    with pytest.raises(A.InvalidActionError):
        A.run_hook_if_eval("1 + 1", None)  # non-bool result


# -- airflow runner (airflow.go) ----------------------------------------------


def test_airflow_payload_shape(spark):
    repo = _repo(spark)
    seen = {}

    def transport(url, data, headers, timeout):
        seen["url"], seen["body"], seen["headers"] = url, json.loads(data), headers
        return 200

    hook = A.airflow_hook(
        "http://airflow:8080/", "my dag", "admin", "pw",
        dag_conf={"team": "data"}, hook_id="notify", transport=transport,
    )
    hook(repo, "post-commit", {"branch": "main", "run_id": "r123"})
    assert seen["url"] == "http://airflow:8080/api/v1/dags/my%20dag/dagRuns"
    assert seen["body"]["dag_run_id"] == "lakeFS_hook_notify_r123"
    assert seen["body"]["conf"]["team"] == "data"
    assert seen["body"]["conf"]["lakeFS_event"]["event_type"] == "post-commit"
    assert seen["body"]["conf"]["lakeFS_event"]["branch_id"] == "main"
    expected = base64.b64encode(b"admin:pw").decode()
    assert seen["headers"]["Authorization"] == f"Basic {expected}"


def test_airflow_non_2xx_aborts(spark):
    repo = _repo(spark)
    hook = A.airflow_hook(
        "http://airflow", "d", "u", "p", transport=lambda *a: 503
    )
    with pytest.raises(HookAbortError):
        hook(repo, "pre-commit", {"branch": "main"})


# -- end-to-end over a Repository ---------------------------------------------


def test_pre_commit_script_veto_and_task_log(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo, env_getter={"LIMIT": "10"}.get)
    svc.add_action(
        {
            "name": "gate",
            "on": {"pre-commit": {"branches": ["main"]}},
            "hooks": [
                {"id": "log_ok", "type": "script",
                 "properties": {"script": "output('msg=' + action['commit_message'])"}},
                {"id": "deny", "type": "script",
                 "properties": {"script": "fail('nope ' + args['limit'])",
                                "args": {"limit": "{{ ENV.LIMIT }}"}}},
                {"id": "after_deny", "type": "script",
                 "properties": {"script": "x = 1"}},  # default if: skipped after failure
                {"id": "cleanup", "type": "script", "if": "failure()",
                 "properties": {"script": "output('cleanup ran')"}},
            ],
        }
    )
    repo.set_entry("main", _entry("a/1"))
    with pytest.raises(HookAbortError, match="nope 10"):
        repo.commit("main", "blocked commit")
    assert repo._read_branch("main")["head"] is None  # veto held

    tasks = svc.task_results()  # newest first
    assert [(t["hook_id"], t["status"]) for t in tasks] == [
        ("cleanup", "completed"),
        ("after_deny", "skipped"),
        ("deny", "failed"),
        ("log_ok", "completed"),
    ]
    run_id = tasks[0]["run_id"]
    assert svc.hook_output(run_id) == ["msg=blocked commit", "cleanup ran"]


def test_post_commit_failure_does_not_abort(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(
        {
            "name": "audit",
            "on": {"post-commit": None},
            "hooks": [{"id": "boom", "type": "script",
                       "properties": {"script": "fail('late')"}}],
        }
    )
    repo.set_entry("main", _entry("a/1"))
    commit = repo.commit("main", "ok")
    assert repo._read_branch("main")["head"] == commit.commit_id  # post-* failure recorded only
    assert svc.task_results()[0]["status"] == "failed"


def test_branch_glob_scopes_action(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(
        {
            "name": "feature guard",
            "on": {"pre-commit": {"branches": ["feature-*"]}},
            "hooks": [{"id": "deny", "type": "script",
                       "properties": {"script": "fail('no direct commits')"}}],
        }
    )
    repo.set_entry("main", _entry("a/1"))
    repo.commit("main", "main unaffected")  # guard scoped away from main
    repo.create_branch("feature-x", "main")
    repo.set_entry("feature-x", _entry("a/2", "i2"))
    with pytest.raises(HookAbortError):
        repo.commit("feature-x", "blocked")


def test_lua_type_executes_in_embedded_interpreter(spark):
    """A dispatched ``type: lua`` hook RUNS in the embedded
    interpreter (lakefs_spark/lua — the pkg/actions/lua.go analog):
    the action record is injected with the reference's field set,
    print() lands in the hook output log, and error() aborts pre-*
    events."""
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(
        {
            "name": "lua gate",
            "on": {"pre-commit": None},
            "hooks": [
                {
                    "id": "lua1",
                    "type": "lua",
                    "properties": {
                        "script": (
                            'print("branch=" .. action.branch_id)\n'
                            'if action.commit.metadata["ok"] ~= "yes" then\n'
                            '  error("metadata gate: ok must be yes")\n'
                            "end\n"
                        )
                    },
                }
            ],
        }
    )
    repo.set_entry("main", _entry("a/1"))
    with pytest.raises(HookAbortError, match="metadata gate: ok must be yes"):
        repo.commit("main", "blocked by lua")
    task = svc.task_results()[0]
    assert task["status"] == "failed"
    assert "metadata gate" in task["error"]
    # passing metadata -> commit lands, output captured
    repo.commit("main", "allowed", metadata={"ok": "yes"})
    task = svc.task_results()[0]
    assert task["status"] == "completed"
    out = A.read_hook_output(repo, task["run_id"], task["hook_run_id"])
    assert out == ["branch=main"]


def test_lua_unsupported_stdlib_records_explicit_unsupported_result(spark):
    """A lua script touching stdlib the interpreter deliberately lacks
    (io, goto, unknown modules) records an 'unsupported' task row with
    the greppable 'unsupported: lua' prefix — never a silent pass —
    and still aborts pre-* events; post-* events record only."""
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(
        {
            "name": "legacy lua",
            "on": {"pre-commit": None},
            "hooks": [{"id": "lua1", "type": "lua",
                       "properties": {"script": 'local io = require("io")\nio.write("x")'}}],
        }
    )
    repo.set_entry("main", _entry("a/1"))
    with pytest.raises(HookAbortError, match="unsupported: lua"):
        repo.commit("main", "blocked: io not available")
    task = svc.task_results()[0]
    assert task["status"] == "unsupported"
    assert task["error"].startswith("unsupported: lua")
    # post-* events record the same result but never abort
    svc.delete_action("legacy lua")
    svc.add_action(
        {
            "name": "legacy lua post",
            "on": {"post-commit": None},
            "hooks": [{"id": "lua1", "type": "lua",
                       "properties": {"script": 'require("coroutine")'}}],
        }
    )
    repo.commit("main", "lands despite the unsupported post hook")
    assert svc.task_results()[0]["status"] == "unsupported"


def test_actions_persist_across_service_instances(spark):
    repo = _repo(spark)
    A.ActionsService(repo).add_action(_spec())
    svc2 = A.ActionsService(Repository.open(spark, repo.root))
    assert [a["name"] for a in svc2.actions()] == ["quality gate"]


def test_second_service_on_same_repo_does_not_double_fire(spark):
    """Dispatcher registration is idempotent per repo: constructing a
    reader service next to the writer must not duplicate hook
    executions (duplicate webhook deliveries / task rows)."""
    repo = _repo(spark)
    svc = A.ActionsService(repo)
    svc.add_action(
        {
            "name": "counter",
            "on": {"post-commit": {"branches": ["main"]}},
            "hooks": [
                {"id": "note", "type": "script",
                 "properties": {"script": "output('ran')"}},
            ],
        }
    )
    svc2 = A.ActionsService(repo)  # same Repository instance, re-routes dispatch
    repo.set_entry("main", _entry("a/1"))
    repo.commit("main", "c1")
    tasks = [t for t in svc2.task_results() if t["hook_id"] == "note"]
    assert len(tasks) == 1  # exactly one execution, not one per service


# -- in-repo _lakefs_actions/ source (catalog/actions_source.go) -------------


def _put_spec(repo, branch, name, yaml_text):
    import os

    rel = f"data/ac/{name}"
    path = os.path.join(repo.store.data_root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(yaml_text)
    repo.set_entry(
        branch,
        {"key": f"_lakefs_actions/{name}", "identity": name, "size": len(yaml_text),
         "etag": name, "address": rel, "address_type": "RELATIVE"},
    )


def test_in_repo_actions_branch_scoped_and_staged(spark):
    repo = _repo(spark)
    svc = A.ActionsService(repo, source=A.RepoActionSource(repo))
    # staged spec governs the very commit that introduces it
    _put_spec(
        repo, "main", "deny.yaml",
        "name: deny all\n"
        "on:\n  pre-commit: null\n"
        "hooks:\n  - id: deny\n    type: script\n"
        "    properties: {script: \"fail('in-repo veto')\"}\n",
    )
    with pytest.raises(HookAbortError, match="in-repo veto"):
        repo.commit("main", "spec commits itself")
    assert repo._read_branch("main")["head"] is None
    assert svc.task_results()[0]["action"] == "deny all"

    # a branch without the spec file is not governed by it
    repo2 = _repo(spark)
    svc2 = A.ActionsService(repo2, source=A.RepoActionSource(repo2))
    repo2.set_entry("main", _entry("a/1"))
    repo2.commit("main", "ungoverned")  # no spec anywhere -> no veto
    repo2.create_branch("gov", "main")
    _put_spec(
        repo2, "gov", "deny.yaml",
        "name: deny all\non:\n  pre-commit: null\n"
        "hooks:\n  - id: deny\n    type: script\n"
        "    properties: {script: \"fail('gov only')\"}\n",
    )
    with pytest.raises(HookAbortError):
        repo2.commit("gov", "blocked on gov")
    repo2.set_entry("main", _entry("a/2", "i2"))
    repo2.commit("main", "main still ungoverned")
    assert svc2.task_results()[0]["event"] == "pre-commit"


def test_in_repo_duplicate_action_names_rejected(spark):
    repo = _repo(spark)
    A.ActionsService(repo, source=A.RepoActionSource(repo))
    spec = ("name: same name\non:\n  pre-commit: null\n"
            "hooks:\n  - id: h1\n    type: script\n"
            "    properties: {script: \"x = 1\"}\n")
    _put_spec(repo, "main", "a.yaml", spec)
    _put_spec(repo, "main", "b.yaml", spec)
    with pytest.raises(A.InvalidActionError, match="duplicate action name"):
        repo.commit("main", "two files, one name")


def test_stock_lua_spec_with_script_path_runs_unmodified(spark):
    """The reference deployment shape end-to-end: an UNMODIFIED
    ``_lakefs_actions/`` YAML spec declaring ``type: lua`` with a
    ``script_path`` pointing at a Lua script object in the repository
    (lua.go:121-146 loads the script through the API at the event's
    ref). The script runs in the embedded interpreter and gates the
    commit on commit metadata."""
    import os

    repo = _repo(spark)
    A.ActionsService(repo, source=A.RepoActionSource(repo))

    lua_src = (
        'regexp = require("regexp")\n'
        "for k, props in pairs(args) do\n"
        "  local v = action.commit.metadata[k]\n"
        '  if v == nil then error("missing mandatory metadata field: " .. k) end\n'
        "  if props.pattern and not regexp.match(props.pattern, v) then\n"
        '    error("field " .. k .. " does not match " .. props.pattern)\n'
        "  end\n"
        "end\n"
    )
    rel = "data/scripts/metadata_validator.lua"
    p = os.path.join(repo.store.data_root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(lua_src)
    repo.set_entry(
        "main",
        {"key": "scripts/metadata_validator.lua", "identity": "mv1",
         "size": len(lua_src), "etag": "mv1", "address": rel,
         "address_type": "RELATIVE"},
    )
    _put_spec(
        repo, "main", "pre-commit-metadata.yaml",
        "name: pre commit metadata field check\n"
        "on:\n  pre-commit:\n    branches:\n      - main\n"
        "hooks:\n"
        "  - id: check_commit_metadata\n"
        "    type: lua\n"
        "    properties:\n"
        "      script_path: scripts/metadata_validator.lua\n"
        "      args:\n"
        "        notebook_url: {\"pattern\": \"my-jupyter.example.com/.*\"}\n"
        "        spark_version: {}\n",
    )
    repo.commit("main", "land the script + spec", metadata={
        "notebook_url": "my-jupyter.example.com/nb", "spark_version": "3.5"})

    repo.set_entry("main", _entry("a/1"))
    with pytest.raises(HookAbortError, match="missing mandatory metadata field"):
        repo.commit("main", "no metadata")
    repo.commit("main", "with metadata", metadata={
        "notebook_url": "my-jupyter.example.com/nb2", "spark_version": "4.0"})
