"""Mostly-correct distributed ownership over the conditional-PUT store.

Re-expresses pkg/distributed/mc_owner.go: a leased advisory owner per
key, built entirely on the Store's ``put_doc_if`` (SetIf), that lets
roughly ONE worker across all processes sharing the store run a hot
critical section at a time. "Mostly" is load-bearing — ownership is a
PERFORMANCE device, never a correctness device (mc_owner.go:19-40):

- correctness still comes from the branch-pointer CAS; a second owner
  admitted by clock skew or a slow refresher just loses the CAS race
  like any other contender;
- the owner refreshes its lease at ``refresh_interval / 2``
  (mc_owner.go:104) and NEVER cancels the protected action when the
  lease is stolen — cancelling invites livelock (mc_owner.go:118-126);
- waiters poll at a jittered ``acquire_interval`` (mc_owner.go:91-100
  getJitter) and may grab an expired lease via put-if-version-match.

Why it exists: N concurrent committers to one branch all pay the full
copy-on-write apply and then N-1 of them lose the pointer CAS and
recompute (graveler retryBranchUpdate). With an owner, contenders
queue BEFORE doing the expensive work, so the cluster does ~1 apply
per round instead of N. The doc rides the same Store as everything
else (``mc-ownership/<key>``), so it works over LocalStore, MemStore
and S3ConditionalStore unchanged.
"""

from __future__ import annotations

import random
import threading
import time
import uuid
from contextlib import contextmanager

from lakefs_spark.storage.store import CASConflictError, Store


class OwnershipTimeoutError(Exception):
    """Could not acquire ownership within the caller's budget."""


class MostlyCorrectOwner:
    def __init__(
        self,
        store: Store,
        prefix: str = "mc-ownership",
        acquire_interval: float = 0.1,
        refresh_interval: float = 0.5,
    ):
        self.store = store
        self.prefix = prefix
        self.acquire_interval = acquire_interval
        self.refresh_interval = refresh_interval
        # one in-process poller per key (in_process_keyed_lock.go role):
        # local contenders queue on a mutex instead of all hammering
        # the backing store
        self._local_mu = threading.Lock()
        self._local: dict[str, threading.Lock] = {}

    def _doc_key(self, key: str) -> str:
        return f"{self.prefix}/{key}"

    def _local_lock(self, key: str) -> threading.Lock:
        with self._local_mu:
            return self._local.setdefault(key, threading.Lock())

    def _try_take(self, key: str, owner: str) -> str | None:
        """One acquisition attempt; returns the doc version when won."""
        now = time.time()
        doc = {"owner": owner, "expires": now + self.refresh_interval}
        got = self.store.get_doc(self._doc_key(key))
        try:
            if got is None:
                return self.store.put_doc_if(self._doc_key(key), doc, None)
            cur, ver = got
            if cur["expires"] <= now:  # expired lease: steal via CAS
                return self.store.put_doc_if(self._doc_key(key), doc, ver)
        except CASConflictError:
            return None
        return None

    @contextmanager
    def own(self, key: str, timeout: float = 30.0):
        """Acquire (blocking up to ``timeout``), yield, release.

        The critical section keeps running even if the lease is stolen
        mid-flight — the caller's own CAS must stay the arbiter."""
        owner = uuid.uuid4().hex
        deadline = time.time() + timeout
        local = self._local_lock(key)
        if not local.acquire(timeout=timeout):
            raise OwnershipTimeoutError(f"local queue for {key!r} stayed busy")
        try:
            ver = self._try_take(key, owner)
            while ver is None:
                if time.time() >= deadline:
                    raise OwnershipTimeoutError(f"ownership of {key!r} stayed held")
                # jittered poll (getJitter): full interval minus up to a
                # third, so waiters don't re-read in lockstep
                iv = self.acquire_interval
                time.sleep(iv - random.uniform(0, iv / 3))
                ver = self._try_take(key, owner)

            stop = threading.Event()

            def _refresh() -> None:
                # refresh at half the lease so it never lapses while
                # the owner is healthy; on ANY surprise (stolen lease,
                # store error) just stop — never cancel the action
                while not stop.wait(self.refresh_interval / 2):
                    try:
                        got = self.store.get_doc(self._doc_key(key))
                        if got is None or got[0].get("owner") != owner:
                            return  # stolen: the new owner wins by default
                        if stop.is_set():
                            # own() may have given up joining us while
                            # the get above was hung; don't re-extend a
                            # lease the owner already walked away from.
                            # (check-then-put still races, but shrinks
                            # the window to the put call itself.)
                            return
                        self.store.put_doc_if(
                            self._doc_key(key),
                            {"owner": owner, "expires": time.time() + self.refresh_interval},
                            got[1],
                        )
                    except Exception:  # noqa: BLE001 — advisory only
                        return

            t = threading.Thread(target=_refresh, daemon=True)
            t.start()
            try:
                yield owner
            finally:
                stop.set()
                # Join with a GENEROUS bound: the refresher exits within
                # refresh_interval/2 of stop.set() unless a store call
                # (S3 get/put) is itself hung — and release must not
                # block the whole branch update indefinitely on that.
                # The no-resurrection guarantee is kept conditionally:
                # the sentinel CAS below runs ONLY when the join
                # actually completed (no refresh can land after it);
                # if the join timed out, we skip the sentinel and let
                # the lease lapse on its own — within refresh_interval
                # of the hung store call RETURNING (a refresher blocked
                # in get/put can still land one in-flight write after
                # this point; the stop.is_set() re-check above shrinks
                # but cannot close that window). Advisory-lock
                # semantics: correctness stays with the branch-pointer
                # CAS either way.
                t.join(self.refresh_interval / 2 + 10.0)
                if not t.is_alive():
                    try:
                        # release by CAS-writing an EXPIRED sentinel,
                        # never by delete: a get-then-delete could
                        # destroy a thief's fresh lease written between
                        # the two calls (the Store has no conditional
                        # delete). Losing the CAS means someone else
                        # owns it now — leave it.
                        got = self.store.get_doc(self._doc_key(key))
                        if got is not None and got[0].get("owner") == owner:
                            self.store.put_doc_if(
                                self._doc_key(key),
                                {"owner": owner, "expires": 0.0},
                                got[1],
                            )
                    except Exception:  # noqa: BLE001 — lease expires anyway
                        pass
        finally:
            local.release()
