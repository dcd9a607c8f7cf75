"""Webhook hook runner: POST event JSON, abort on non-2xx.

Re-expresses the reference's webhook action runner
(pkg/actions/webhook.go:85-133 Run, pkg/actions/event.go:26-45
marshalEventInformation): the hook serializes an EventInfo payload,
POSTs it to the configured URL with a timeout, and any transport error
or non-2xx status aborts the surrounding operation (a pre-commit /
pre-merge webhook is a veto gate).

The HTTP transport is injectable so hook behavior is testable without
a network; the default uses stdlib ``urllib`` (no extra deps).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request

from lakefs_spark.storage.repo import HookAbortError

DEFAULT_TIMEOUT_SECONDS = 60.0  # webhookClientDefaultTimeout (webhook.go:29)


def _urllib_transport(url: str, data: bytes, headers: dict[str, str], timeout: float) -> int:
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return int(resp.status)
    except urllib.error.HTTPError as e:
        return int(e.code)  # non-2xx: surface the status, not an exception


def event_payload(repo, event: str, ctx: dict, action_name: str, hook_id: str) -> dict:
    """EventInfo-shaped payload (pkg/actions/event.go:26-45)."""
    commit = ctx.get("commit")
    return {
        "event_type": event,
        "event_time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "action_name": action_name,
        "hook_id": hook_id,
        "repository_id": repo.root,
        "branch_id": ctx.get("branch") or ctx.get("dest") or "",
        "source_ref": ctx.get("source") or ctx.get("ref") or "",
        "commit_id": getattr(commit, "commit_id", "") or "",
        "commit_message": getattr(commit, "message", "") or ctx.get("message", "") or "",
        "committer": getattr(commit, "committer", "") or "",
        # pre-commit carries the PENDING commit's metadata via ctx (the
        # reference's pre-commit EventInfo does the same), post-commit
        # reads it off the landed commit record
        "commit_metadata": getattr(commit, "metadata", None) or ctx.get("metadata") or {},
        "merge_source": ctx.get("source") or "",
    }


def webhook_hook(
    url: str,
    *,
    action_name: str = "webhook",
    hook_id: str = "webhook",
    timeout: float = DEFAULT_TIMEOUT_SECONDS,
    headers: dict[str, str] | None = None,
    query_params: dict[str, str] | None = None,
    transport=None,
):
    """Build a hook callable for :meth:`Repository.on`.

    ``repo.on("pre-commit", webhook_hook("https://ci/gate"))`` gives the
    reference's abort-on-non-2xx semantics (webhook.go:127-131): the
    POST must return 2xx within ``timeout`` or the operation aborts
    with :class:`HookAbortError`.
    """
    send = transport or _urllib_transport
    full_url = url
    if query_params:
        sep = "&" if urllib.parse.urlparse(url).query else "?"
        full_url = url + sep + urllib.parse.urlencode(query_params)
    hdrs = {"Content-Type": "application/json", **(headers or {})}

    def _hook(repo, event: str, ctx: dict) -> None:
        data = json.dumps(
            event_payload(repo, event, ctx, action_name, hook_id)
        ).encode()
        try:
            status = send(full_url, data, hdrs, timeout)
        except Exception as e:
            raise HookAbortError(f"webhook {hook_id} request failed: {e}") from e
        if not (200 <= status < 300):
            raise HookAbortError(
                f"webhook {hook_id} request failed (status code: {status})"
            )

    return _hook
