"""Declarative actions: validated action specs (YAML/JSON) with
webhook / airflow / script runners, matched per event + branch glob,
``if``-expression gating, and per-hook task results.

Re-expresses the reference's actions service:

- ``pkg/actions/action.go:16-106`` — Action/ActionHook spec shape and
  ``Validate`` (name regex, hook-id regex, duplicate ids, event
  validation, ``branches`` rejected on tag events, per-type property
  validators).
- ``pkg/actions/action.go`` Match — event-type + branch ``path.Match``
  globs.
- ``pkg/actions/service.go:300-430`` — the run loop: hooks of one
  action run sequentially; a failed hook marks the action failed but
  later hooks still get their ``if`` expression evaluated (default
  run-condition is "no error so far"; env exposes ``success()`` /
  ``failure()``; non-bool result is an error); pre-* failures abort
  the surrounding operation, post-* failures are recorded only.
- ``pkg/actions/airflow.go`` — the Airflow runner is a specialized
  webhook: POST ``{dag_run_id, conf}`` to
  ``<url>/api/v1/dags/<dag_id>/dagRuns`` with basic auth, where
  ``dag_run_id = "lakeFS_hook_<hook_id>_<run_id>"`` and ``conf`` merges
  ``dag_conf`` under the event payload as ``lakeFS_event``.
- ``pkg/actions/lua.go:38-75,105-171`` — the script runner injects the
  event record as global ``action``, the expanded properties ``args``,
  and an output writer; ``pkg/actions/lua.go:187-227`` DescendArgs —
  ``{{ ENV.NAME }}`` placeholders in string properties resolve through
  an environment getter, missing vars are errors.
- ``pkg/actions/hook_output_writer.go`` — per-hook output captured
  under the run id.

``type: lua`` hooks EXECUTE here, in the embedded pure-Python Lua
interpreter (lakefs_spark/lua/ — the analog of the reference's
embedded VM, lua.go:105-171): the event record is injected as global
``action`` with the reference's exact field set (lua.go:38-68), the
expanded properties as ``args``, ``print`` is captured to the hook
output log, and ``require`` resolves the curated module set (strings,
path, regexp, encoding/json, encoding/yaml, net/url, lakefs,
aws, lakefs/catalogexport/*). Scripts come inline (``script``) or
from the repository at the event's ref (``script_path``,
lua.go:121-146). A script touching stdlib surface the interpreter
deliberately lacks (io/os, coroutines, goto, unknown modules) records
an explicit ``unsupported`` task row — never a silent pass — and
pre-* events abort, so a policy gate cannot be bypassed by language
unavailability. ``type: script`` remains as this engine's native
Python mini-script runner with the same injected surface.
tests/test_lua.py pins interpreter semantics + three reference hook
scenarios (commit-metadata validator, action logger, catalogexport
symlink exporter) running as real Lua; tests/test_lua_ports.py keeps
the earlier ``type: script`` ports.

Sandbox threat model: the vet is an AST allowlist (no imports, no
underscore-prefixed names/attributes/keywords, fixed builtins) plus a
deny on the ``str.format``/``format_map``/``vars`` reflection sinks,
whose field syntax can traverse into dunder attributes at runtime
(``"{0.__class__}".format(x)``). This blocks the known
attribute-traversal routes for *info disclosure*; it is a
belt-and-braces hook sandbox for trusted-author specs, not a security
boundary against adversarial code — same stance as the reference's
embedded Lua stdlib subset (pkg/actions/lua.go:38-171).
"""

from __future__ import annotations

import ast
import base64
import fnmatch
import json
import os
import re
import time
import urllib.parse

from lakefs_spark.lua.interp import LuaError, LuaUnsupportedFeature
from lakefs_spark.storage.repo import HookAbortError
from lakefs_spark.storage.webhook import (
    DEFAULT_TIMEOUT_SECONDS,
    _urllib_transport,
    event_payload,
    webhook_hook,
)

# action.go:67-68
ACTION_NAME_RE = re.compile(r"^\w[\w\-. ]+$")
HOOK_ID_RE = re.compile(r"^[_a-zA-Z][\-_a-zA-Z0-9]{1,255}$")

# graveler.go EventType* constants (the hook events Repository._fire emits)
EVENT_TYPES = frozenset(
    {
        "prepare-commit",
        "pre-commit",
        "post-commit",
        "pre-merge",
        "post-merge",
        "pre-create-branch",
        "post-create-branch",
        "pre-delete-branch",
        "post-delete-branch",
        "pre-create-tag",
        "post-create-tag",
        "pre-delete-tag",
        "post-delete-tag",
        "pre-revert",
        "post-revert",
        "pre-cherry-pick",
        "post-cherry-pick",
    }
)

HOOK_TYPES = frozenset({"webhook", "airflow", "script", "lua"})

# {{ ENV.NAME }} placeholder (DescendArgs, lua.go:187-227)
_ENV_RE = re.compile(r"\{\{\s*ENV\.([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


class InvalidActionError(ValueError):
    """Spec fails action.go Validate rules."""


class MissingEnvVarError(KeyError):
    """{{ ENV.X }} placeholder with no such variable (errMissingEnvVar)."""


# -- spec parsing + validation ----------------------------------------------


def parse_action(spec) -> dict:
    """Parse + validate an action spec.

    Accepts a dict, a JSON string, or a YAML string (YAML via an
    import-guarded pyyaml — JSON is a YAML subset, so JSON always
    works even without the lib).
    """
    if isinstance(spec, (str, bytes)):
        text = spec.decode() if isinstance(spec, bytes) else spec
        try:
            import yaml  # type: ignore

            spec = yaml.safe_load(text)
        except ImportError:  # pragma: no cover - yaml present in CI image
            spec = json.loads(text)
    if not isinstance(spec, dict):
        raise InvalidActionError("action spec must be a mapping")
    # pyyaml is YAML 1.1: a bare `on:` key loads as boolean True; the
    # reference's yaml.v3 is YAML 1.2 where it stays the string "on".
    if True in spec and "on" not in spec:
        spec = dict(spec)
        spec["on"] = spec.pop(True)
    validate_action(spec)
    return spec


def validate_action(spec: dict) -> None:
    """action.go:71-106 Validate."""
    name = spec.get("name") or ""
    if not name:
        raise InvalidActionError("'name' is required")
    if not ACTION_NAME_RE.match(name):
        raise InvalidActionError(f"'name' is invalid: {name!r}")
    on = spec.get("on") or {}
    if not on:
        raise InvalidActionError("'on' is required")
    for event, params in on.items():
        if event not in EVENT_TYPES:
            raise InvalidActionError(f"event '{event}' is not supported")
        if params and params.get("branches") and event.endswith("-tag"):
            raise InvalidActionError(
                "'branches' is not supported in tag event types"
            )
    ids: set[str] = set()
    for i, hook in enumerate(spec.get("hooks") or []):
        hid = hook.get("id") or ""
        if not HOOK_ID_RE.match(hid):
            raise InvalidActionError(f"hook[{i}] missing or invalid ID")
        if hid in ids:
            raise InvalidActionError(f"hook[{i}] duplicate ID '{hid}'")
        ids.add(hid)
        htype = hook.get("type")
        if htype not in HOOK_TYPES:
            raise InvalidActionError(f"hook[{i}] type '{htype}' unknown")
        props = hook.get("properties") or {}
        required = {
            "webhook": ("url",),
            "airflow": ("url", "dag_id", "username", "password"),
            "script": ("script",),
            # reference hook.go:68 requireProperties: ONE OF script /
            # script_path (the in-repo script location)
            "lua": (("script", "script_path"),),
        }[htype]
        for key in required:
            alts = key if isinstance(key, tuple) else (key,)
            vals = [props.get(k) for k in alts]
            if not any(isinstance(v, str) and v != "" for v in vals):
                raise InvalidActionError(
                    f"hook[{i}] type '{htype}': key {' or '.join(alts)}: "
                    "missing or not a string"
                )


def action_matches(spec: dict, event: str, branch: str) -> bool:
    """MatchSpec (action.go Match): event key present; if the event
    declares branch globs, the branch must match one (path.Match ->
    fnmatch here; both are glob-with-[]-classes, no **)."""
    params = (spec.get("on") or {}).get(event)
    if params is None and event not in (spec.get("on") or {}):
        return False
    globs = (params or {}).get("branches") or []
    if not globs:
        return True
    return any(fnmatch.fnmatchcase(branch, g) for g in globs)


def expand_args(value, env_getter):
    """DescendArgs (lua.go:187-227): resolve ``{{ ENV.NAME }}``
    placeholders in every string, recursively through maps/lists.
    A missing variable is an error, not an empty string."""
    if isinstance(value, str):

        def _sub(m: re.Match) -> str:
            got = env_getter(m.group(1))
            if got is None:
                raise MissingEnvVarError(f"missing env var {m.group(1)}")
            return got

        return _ENV_RE.sub(_sub, value)
    if isinstance(value, dict):
        return {k: expand_args(v, env_getter) for k, v in value.items()}
    if isinstance(value, list):
        return [expand_args(v, env_getter) for v in value]
    return value


# -- sandboxed script runner (the Lua-VM analog) -----------------------------

_SAFE_BUILTINS = {
    f.__name__: f
    for f in (
        abs, all, any, bool, dict, enumerate, filter, float, int, len,
        list, map, max, min, range, reversed, round, set, sorted, str,
        sum, tuple, zip,
    )
}
_FORBIDDEN_NODES = (ast.Import, ast.ImportFrom, ast.Global, ast.Nonlocal)


# Reflection sinks that reach dunder attributes at runtime even though
# the AST shows no underscore: str.format's field syntax traverses
# attributes ('{0.__class__.__mro__}'.format(x)). Denied by name.
_FORBIDDEN_ATTRS = frozenset({"format", "format_map"})
_FORBIDDEN_NAMES = frozenset({"format", "format_map", "vars", "getattr"})


def _vet(tree: ast.AST) -> None:
    for node in ast.walk(tree):
        if isinstance(node, _FORBIDDEN_NODES):
            raise InvalidActionError(
                f"script: {type(node).__name__} is not allowed"
            )
        bad = None
        if isinstance(node, ast.Name) and (
            node.id.startswith("_") or node.id in _FORBIDDEN_NAMES
        ):
            bad = node.id
        elif isinstance(node, ast.Attribute) and (
            node.attr.startswith("_") or node.attr in _FORBIDDEN_ATTRS
        ):
            bad = node.attr
        elif isinstance(node, ast.keyword) and (node.arg or "").startswith("_"):
            bad = node.arg
        if bad is not None:
            raise InvalidActionError(
                f"script: name {bad!r} is not allowed"
            )


def compile_script(code: str, name: str = "<hook-script>"):
    """Parse + vet a hook script: no imports, no identifier or
    attribute starting with an underscore (cuts off dunder escape
    routes), builtins limited to the arithmetic/collection whitelist.
    Returns a code object for :func:`run_script`."""
    tree = ast.parse(code, filename=name, mode="exec")
    _vet(tree)
    return compile(tree, name, "exec")


def run_script(code, globals_: dict) -> None:
    glb = {"__builtins__": dict(_SAFE_BUILTINS)}
    glb.update(globals_)
    exec(code, glb)  # noqa: S102 - sandboxed: vetted AST + fixed builtins


def script_hook(
    script: str,
    *,
    action_name: str = "script",
    hook_id: str = "script",
    args: dict | None = None,
    output_sink=None,
    extra_globals: dict | None = None,
):
    """Hook callable running a sandboxed mini-script with the
    lua.go:38-75 injected surface: global ``action`` (the event
    record), ``args`` (expanded properties), ``output(line)`` and
    ``fail(msg)``. Raising — or calling ``fail`` — aborts pre-events."""
    code = compile_script(script, name=f"{action_name}/{hook_id}")

    def _fail(msg: str = "hook failed"):
        raise HookAbortError(f"script {hook_id}: {msg}")

    def _hook(repo, event: str, ctx: dict) -> None:
        record = event_payload(repo, event, ctx, action_name, hook_id)
        record["pre"] = event.startswith("pre") or event == "prepare-commit"
        record["run_id"] = ctx.get("run_id", "")
        sink = output_sink or (lambda line: None)
        run_script(
            code,
            {
                "action": record,
                "args": dict(args or {}),
                "output": lambda line: sink(str(line)),
                "fail": _fail,
                **(extra_globals or {}),
            },
        )

    return _hook


def lua_event_record(repo, event: str, ctx: dict, action_name: str, hook_id: str) -> dict:
    """The ``action`` global, field-for-field the reference's record
    (pkg/actions/lua.go:38-68 applyRecord)."""
    base = event_payload(repo, event, ctx, action_name, hook_id)
    commit = ctx.get("commit")
    creation = getattr(commit, "date", None)
    if creation is not None:
        creation = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(float(creation)))
    return {
        "action_name": action_name,
        "hook_id": hook_id,
        "run_id": ctx.get("run_id", ""),
        "pre_run_id": ctx.get("pre_run_id", ""),
        "event_type": event,
        "commit_id": base["commit_id"],
        "branch_id": base["branch_id"],
        "source_ref": base["source_ref"],
        "tag_id": ctx.get("tag") or "",
        "merge_source": base["merge_source"],
        "repository_id": repo.name,
        "storage_namespace": repo.storage_namespace,
        "commit": {
            "message": base["commit_message"],
            "meta_range_id": getattr(commit, "metarange_id", "") or "",
            "creation_date": creation or base["event_time"],
            "version": 1,
            "metadata": base["commit_metadata"],
            "parents": list(getattr(commit, "parents", None) or []),
        },
    }


def lua_hook(
    script: str | None = None,
    *,
    script_path: str | None = None,
    action_name: str = "lua",
    hook_id: str = "lua",
    args: dict | None = None,
    output_sink=None,
    export_root: str | None = None,
    export_recorder: list | None = None,
):
    """Hook callable executing an embedded-Lua script (lua.go:105-171).

    ``script`` is inline source; ``script_path`` loads the script from
    the repository at the event's ref at dispatch time
    (lua.go:121-146). Lua ``error()`` aborts pre-* events; touching
    unsupported stdlib surfaces :class:`LuaUnsupportedFeature`, which
    the dispatcher records as an ``unsupported`` task row.
    """
    from lakefs_spark.lua.modules import run_lua_hook

    def _load_script(repo, ref: str) -> str:
        if not script_path:
            raise HookAbortError(f"lua {hook_id}: no script or script_path")
        row = repo.get(ref, script_path)
        if row is None:
            raise HookAbortError(
                f"lua {hook_id}: could not load script_path {script_path!r} "
                f"at {ref!r} (not found)"
            )
        from lakefs_spark.lua.modules import load_entry_content

        return load_entry_content(repo, row)

    def _hook(repo, event: str, ctx: dict) -> None:
        src = script
        # `not src` (not `is None`): an empty inline script with a
        # script_path present must load the real script, never run an
        # empty chunk and record a bogus 'completed' for a policy gate
        if not src:
            ref = ctx.get("branch") or ctx.get("dest") or ctx.get("ref") or ""
            src = _load_script(repo, ref)
        record = lua_event_record(repo, event, ctx, action_name, hook_id)
        sink = output_sink or (lambda line: None)
        try:
            run_lua_hook(
                src,
                action=record,
                args=dict(args or {}),
                output_sink=lambda line: sink(str(line)),
                repo=repo,
                export_root=export_root,
                export_recorder=export_recorder,
                chunkname=f"{action_name}/{hook_id}",
            )
        except LuaUnsupportedFeature:
            raise  # dispatcher records the explicit 'unsupported' row
        except LuaError as e:
            raise HookAbortError(f"lua {hook_id}: {e.value}") from e

    return _hook


# -- airflow runner (a specialized webhook) ----------------------------------


def airflow_hook(
    url: str,
    dag_id: str,
    username: str,
    password: str,
    *,
    dag_conf: dict | None = None,
    action_name: str = "airflow",
    hook_id: str = "airflow",
    timeout: float = DEFAULT_TIMEOUT_SECONDS,
    transport=None,
):
    """POST a DAG run (airflow.go:131-185): body
    ``{dag_run_id: "lakeFS_hook_<id>_<run_id>", conf: {lakeFS_event:
    <event payload>, **dag_conf}}`` to
    ``<url>/api/v1/dags/<dag_id>/dagRuns`` with basic auth; non-2xx
    aborts like any webhook. ``wait_for_dag`` polling is not modeled —
    delivery is the contract here, DAG completion belongs to Airflow."""
    send = transport or _urllib_transport
    dag_run_url = url.rstrip("/") + "/api/v1/dags/%s/dagRuns" % urllib.parse.quote(
        dag_id, safe=""
    )
    token = base64.b64encode(f"{username}:{password}".encode()).decode()
    headers = {
        "Content-Type": "application/json",
        "Authorization": f"Basic {token}",
    }

    def _hook(repo, event: str, ctx: dict) -> None:
        run_id = ctx.get("run_id", "")
        body = {
            "dag_run_id": f"lakeFS_hook_{hook_id}_{run_id}",
            "conf": {
                "lakeFS_event": event_payload(repo, event, ctx, action_name, hook_id),
                **(dag_conf or {}),
            },
        }
        try:
            status = send(dag_run_url, json.dumps(body).encode(), headers, timeout)
        except Exception as e:
            raise HookAbortError(f"airflow {hook_id} request failed: {e}") from e
        if not (200 <= status < 300):
            raise HookAbortError(
                f"airflow {hook_id} request failed (status code: {status})"
            )

    return _hook


# -- if-expression gating (service.go:403-419) -------------------------------


def run_hook_if_eval(if_expr: str, action_err) -> bool:
    """Default run-condition: no error so far. A non-empty ``if``
    expression overrides it; env exposes success()/failure(); a
    non-bool result is an error."""
    if not if_expr:
        return action_err is None
    tree = ast.parse(if_expr, mode="eval")
    _vet(tree)
    glb = {
        "__builtins__": dict(_SAFE_BUILTINS),
        "success": lambda: action_err is None,
        "failure": lambda: action_err is not None,
    }
    out = eval(compile(tree, "<if>", "eval"), glb)  # noqa: S307 - sandboxed
    if not isinstance(out, bool):
        raise InvalidActionError("'if' expression must evaluate to a boolean")
    return out


# -- in-repo action source (catalog/actions_source.go) ------------------------

ACTIONS_PREFIX = "_lakefs_actions/"


class RepoActionSource:
    """Action specs stored as objects of the repository itself under
    ``_lakefs_actions/`` (``pkg/catalog/actions_source.go:14`` +
    ``pkg/actions/action.go:164-196`` LoadActions): the spec set is
    VERSIONED and BRANCH-SCOPED — listing happens at the event's ref,
    and for pre-* events that is the in-flight (staged) view, so a
    commit that adds or edits a spec is already governed by it, exactly
    like the reference.

    The engine stores entry metadata; payload bytes live at the
    entry's ``address`` in the object store. ``content_loader(entry)
    -> bytes`` makes that pluggable; the default reads
    ``<data_root>/<address>`` for RELATIVE addresses (the layout the
    catalog's physical-address flow mints).
    """

    def __init__(self, repo, content_loader=None):
        self.repo = repo
        self._load = content_loader or self._default_loader

    @staticmethod
    def _field(entry, name, default=None):
        # listing rows arrive as pyspark Rows (no .get); dicts in tests
        try:
            v = entry[name]
        except (KeyError, ValueError, IndexError):
            return default
        return v

    def _default_loader(self, entry) -> bytes:
        # one copy of the relative-address rule: lua/modules.py
        # load_entry_content (shared with script_path hooks and the Lua
        # get_object shim); only the error TYPE is translated here
        from lakefs_spark.lua.modules import load_entry_content

        row = {
            "address": self._field(entry, "address"),
            "address_type": self._field(entry, "address_type"),
        }
        try:
            return load_entry_content(self.repo, row).encode()
        except ValueError as e:
            raise InvalidActionError(str(e)) from None

    def load_specs(self, ref: str) -> list[dict]:
        """Parse + validate every spec at ``ref``; duplicate action
        names across files are an error (action.go validateActions)."""
        entries, after = [], ""
        while True:
            page, more = self.repo.list_page(
                ref, prefix=ACTIONS_PREFIX, after=after, amount=1000
            )
            entries.extend(page)
            if not more:
                break
            after = page[-1]["key"]
        specs, names = [], set()
        for e in entries:
            spec = parse_action(self._load(e))
            if spec["name"] in names:
                raise InvalidActionError(
                    f"duplicate action name {spec['name']!r} in {ACTIONS_PREFIX}"
                )
            names.add(spec["name"])
            specs.append(spec)
        return specs


# -- task-result / output readers (no dispatcher side effects) ----------------


def read_task_results(repo, run_id: str | None = None) -> list[dict]:
    """Per-hook task rows, newest first (ListRunTaskResults shape).
    Read-only: safe for API surfaces — constructing an ActionsService
    just to read would bind a second dispatcher onto the repo."""
    rows = [json.loads(s) for s in repo.store.read_lines("tasks")]
    rows.reverse()
    if run_id is not None:
        base = run_id.split("-")[0]
        rows = [r for r in rows if r["run_id"] == base]
    return rows


def read_hook_output(repo, run_id: str, hook_run_id: str | None = None) -> list[str]:
    base = run_id.split("-")[0]
    rows = [json.loads(s) for s in repo.store.read_lines("hook_outputs")]
    return [
        r["line"]
        for r in rows
        if r["run_id"] == base
        and (hook_run_id is None or r["hook_run_id"] == hook_run_id)
    ]


# -- the service --------------------------------------------------------------


def _service_dispatch(repo, event: str, ctx: dict) -> None:
    """Per-repo dispatch trampoline: Repository.on registers this one
    module-level callable (deduped via the repo's bound-events set) and
    it delegates to whichever ActionsService currently owns the repo —
    so N service instances never multiply hook executions."""
    svc = getattr(repo, "_actions_service", None)
    if svc is not None:
        svc._dispatch(repo, event, ctx)


class ActionsService:
    """Store-backed action registry + event dispatcher.

    ``add_action`` validates, persists the spec (one store doc per
    action name, so a re-add replaces), and binds a dispatcher on each
    referenced event via ``Repository.on``. On dispatch, matching
    actions run in name order; each hook appends one task-result row
    (service.go buildRunManifestFromTasks shape) and its output lines;
    a pre-* event with any failed action aborts the operation."""

    def __init__(self, repo, *, env_getter=None, transport=None, source=None,
                 exporters: dict | None = None, export_root: str | None = None,
                 export_recorder: list | None = None):
        import os

        self.repo = repo
        self.env_getter = env_getter or os.environ.get
        self.transport = transport
        self.source = source
        #: sandbox sink for the Lua aws/databricks stand-ins: dispatched
        #: ``type: lua`` hooks write exports under export_root/<bucket>/
        #: <key> and record calls into export_recorder (tests assert on
        #: both; a networked deployment would swap real clients in here)
        self.export_root = export_root
        self.export_recorder = export_recorder
        # named exporter registry, surfaced to script hooks as the
        # ``export(name, ...)`` global — the script-runner analog of the
        # reference's lua/lakefs/catalogexport stdlib (symlink_exporter
        # .lua etc.), where a post-commit hook triggers a catalog export
        self.exporters = dict(exporters or {})
        # Registration is idempotent per repo: the repo carries one
        # bound-events set and one trampoline target, so constructing a
        # second service on the same Repository (one for writing, one
        # for reading) re-routes dispatch instead of double-firing every
        # matching action (duplicate webhook deliveries / task rows).
        # Latest service wins — it sees the same store-backed registry.
        repo._actions_service = self
        self._bound_events = repo.__dict__.setdefault(
            "_actions_bound_events", set()
        )
        self._rebind()
        if source is not None:
            # in-repo specs can appear on any branch at any time, so the
            # dispatcher watches every event (cheap no-op when nothing
            # matches)
            for event in EVENT_TYPES:
                if event not in self._bound_events:
                    self._bound_events.add(event)
                    self.repo.on(event, _service_dispatch)

    # -- registry ------------------------------------------------------------

    def add_action(self, spec) -> dict:
        self.repo._check_writable("actions.add_action")
        spec = parse_action(spec)
        self.repo.store.put_doc(f"actions/{spec['name']}", spec)
        self._bind_events(spec)
        return spec

    def delete_action(self, name: str) -> None:
        self.repo._check_writable("actions.delete_action")
        self.repo.store.delete_doc(f"actions/{name}")

    def actions(self) -> list[dict]:
        out = []
        for key in sorted(self.repo.store.list_docs("actions/")):
            got = self.repo.store.get_doc(key)
            if got:
                out.append(got[0])
        return out

    def _rebind(self) -> None:
        for spec in self.actions():
            self._bind_events(spec)

    def _bind_events(self, spec: dict) -> None:
        for event in spec.get("on") or {}:
            if event not in self._bound_events:
                self._bound_events.add(event)
                self.repo.on(event, _service_dispatch)

    # -- dispatch --------------------------------------------------------------

    def _dispatch(self, repo, event: str, ctx: dict) -> None:
        branch = ctx.get("branch") or ctx.get("dest") or ctx.get("tag") or ""
        specs = self.actions()
        source_ref = ctx.get("branch") or ctx.get("dest")
        if self.source is not None and source_ref:
            # the event's ref: the branch overlay (staged view) — a spec
            # uploaded in the in-flight commit already governs it
            from lakefs_spark.storage.refs import RefError

            try:
                repo_specs = self.source.load_specs(source_ref)
            except (FileNotFoundError, RefError):
                # e.g. pre-create-branch fires before the ref exists
                repo_specs = []
            seen = {a["name"] for a in specs}
            specs = specs + [a for a in repo_specs if a["name"] not in seen]
        matched = sorted(
            (a for a in specs if action_matches(a, event, branch)),
            key=lambda a: a["name"],
        )
        if not matched:
            return
        # one id per event, shared with Repository._log_run's run rows
        # (theirs add a "-<hook_idx>" suffix) so the swagger drill-down
        # listRepositoryRuns -> listRunHooks chains on the same id
        run_id = (ctx.get("run_id") or f"{int(time.time() * 1e6):016x}").split("-")[0]
        ctx = dict(ctx, run_id=run_id)
        first_err: Exception | None = None
        for a_idx, spec in enumerate(matched):
            action_err: Exception | None = None
            for h_idx, hook in enumerate(spec.get("hooks") or []):
                hook_run_id = f"{run_id}_{a_idx:04d}_{h_idx:04d}"
                try:
                    should_run = run_hook_if_eval(hook.get("if") or "", action_err)
                except Exception as e:
                    action_err = action_err or e
                    self._log_task(
                        run_id, hook_run_id, spec, hook, event, "failed",
                        f"{type(e).__name__}: {e}",
                    )
                    continue
                if not should_run:
                    self._log_task(run_id, hook_run_id, spec, hook, event, "skipped", None)
                    continue
                started = time.time()
                try:
                    fn = self._build_hook(spec, hook, run_id, hook_run_id)
                    fn(repo, event, ctx)
                    status, err = "completed", None
                except LuaUnsupportedFeature as e:
                    # Explicit, greppable record — never a silent
                    # pass: the script touched stdlib surface the
                    # embedded interpreter deliberately lacks. Pre-*
                    # events still abort below (a policy gate must not
                    # be bypassed by language unavailability).
                    e2 = HookAbortError(f"unsupported: lua — {e.value}")
                    status, err = "unsupported", e2
                    if action_err is None:
                        action_err = e2
                except Exception as e:
                    status, err = "failed", e
                    if action_err is None:
                        action_err = e
                self._log_task(
                    run_id, hook_run_id, spec, hook, event, status,
                    None
                    if err is None
                    # keep the greppable "unsupported: lua — ..." prefix
                    else (str(err) if status == "unsupported"
                          else f"{type(err).__name__}: {err}"),
                    started=started,
                )
            if action_err is not None and first_err is None:
                first_err = action_err
        if first_err is not None and (
            event.startswith("pre") or event == "prepare-commit"
        ):
            raise first_err

    def _build_hook(self, spec: dict, hook: dict, run_id: str, hook_run_id: str):
        props = expand_args(hook.get("properties") or {}, self.env_getter)
        htype, hid, name = hook["type"], hook["id"], spec["name"]
        if htype == "webhook":
            return webhook_hook(
                props["url"],
                action_name=name,
                hook_id=hid,
                timeout=float(props.get("timeout", DEFAULT_TIMEOUT_SECONDS)),
                headers=props.get("headers"),
                query_params=props.get("query_params"),
                transport=self.transport,
            )
        if htype == "airflow":
            return airflow_hook(
                props["url"],
                props["dag_id"],
                props["username"],
                props["password"],
                dag_conf=props.get("dag_conf"),
                action_name=name,
                hook_id=hid,
                timeout=float(props.get("timeout", DEFAULT_TIMEOUT_SECONDS)),
                transport=self.transport,
            )
        if htype == "script":
            extra = {}
            if self.exporters:
                def _export(kind, *a, **kw):
                    fn = self.exporters.get(kind)
                    if fn is None:
                        raise HookAbortError(f"unknown exporter {kind!r}")
                    return fn(self.repo, *a, **kw)

                extra["export"] = _export
            return script_hook(
                props["script"],
                action_name=name,
                hook_id=hid,
                args=props.get("args"),
                output_sink=lambda line: self._log_output(run_id, hook_run_id, line),
                extra_globals=extra or None,
            )
        if htype == "lua":
            return lua_hook(
                props.get("script"),
                script_path=props.get("script_path"),
                action_name=name,
                hook_id=hid,
                args=props.get("args"),
                output_sink=lambda line: self._log_output(run_id, hook_run_id, line),
                export_root=self.export_root,
                export_recorder=self.export_recorder,
            )
        raise InvalidActionError(f"unknown hook type {htype!r}")  # pragma: no cover

    # -- task results + output (kv_task_results_iterator / output writer) -----

    def _log_task(
        self, run_id, hook_run_id, spec, hook, event, status, err, started=None
    ) -> None:
        rec = {
            "run_id": run_id,
            "hook_run_id": hook_run_id,
            "action": spec["name"],
            "hook_id": hook["id"],
            "hook_type": hook["type"],
            "event": event,
            "status": status,
            "error": err,
            "start_time": started if started is not None else time.time(),
        }
        self.repo.store.append_line("tasks", json.dumps(rec))

    def _log_output(self, run_id: str, hook_run_id: str, line: str) -> None:
        self.repo.store.append_line(
            "hook_outputs",
            json.dumps({"run_id": run_id, "hook_run_id": hook_run_id, "line": line}),
        )

    def task_results(self, run_id: str | None = None) -> list[dict]:
        """Per-hook task rows, newest first (ListRunTaskResults shape)."""
        return read_task_results(self.repo, run_id)

    def hook_output(self, run_id: str, hook_run_id: str | None = None) -> list[str]:
        return read_hook_output(self.repo, run_id, hook_run_id)
