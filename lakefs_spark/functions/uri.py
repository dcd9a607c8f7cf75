"""lakefs:// URI parsing + validation.

Re-expresses ``pkg/uri/parser.go`` (Parse/ParseWithBaseURI/Equals/
String) and the id regexes of ``pkg/validator/validate.go:10-12``: a
URI is ``lakefs://<repository>[/<ref>[/<path>]]``; the path part is
the only one allowed to be empty, and "empty path" is distinct from
"no path" (``lakefs://r/b/`` vs ``lakefs://r/b``) — kept here as
``path=None`` vs ``path=""`` exactly like the reference's pointer.

Scale note: parsing also exists as a vectorized column form
(``parse_uri_col``) so a manifest of lakefs URIs (e.g. an exported
symlink table or an ingest worklist) can be split JVM-side with
``regexp_extract`` — no Python in the row path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import urlsplit

SCHEME = "lakefs"

RE_REPOSITORY_ID = re.compile(r"^[a-z0-9][a-z0-9-]{2,62}$")
RE_BRANCH_ID = re.compile(r"^\w[-\w]*$")
RE_REF = re.compile(r"^[^\s]+$")


class MalformedURIError(ValueError):
    pass


@dataclass(frozen=True)
class URI:
    repository: str
    ref: str = ""
    path: str | None = None

    def __str__(self) -> str:
        out = f"{SCHEME}://{self.repository}"
        if self.ref:
            out += f"/{self.ref}"
            if self.path is not None:
                out += f"/{self.path}"
        return out

    # validators (parser.go:38-158): each URI "kind" is a shape check
    def validate_repository(self) -> None:
        self._check_repo()
        if self.ref or self.path is not None:
            raise MalformedURIError(f"not a valid repo URI: {self}")

    def validate_ref(self) -> None:
        self._check_repo()
        if not self.ref or not RE_REF.match(self.ref) or self.path is not None:
            raise MalformedURIError(f"not a valid ref URI: {self}")

    def validate_branch(self) -> None:
        self._check_repo()
        if not self.ref or not RE_BRANCH_ID.match(self.ref) or self.path is not None:
            raise MalformedURIError(f"not a valid branch URI: {self}")

    def validate_path(self) -> None:
        self._check_repo()
        if not self.ref or not RE_REF.match(self.ref) or self.path is None:
            raise MalformedURIError(f"not a valid path URI: {self}")

    def _check_repo(self) -> None:
        if not RE_REPOSITORY_ID.match(self.repository):
            raise MalformedURIError(f"invalid repository name: {self.repository!r}")


def parse(s: str) -> URI:
    """parser.go:167-196 Parse: scheme must be lakefs, no userinfo,
    host = repository, first path level = ref, rest = path."""
    u = urlsplit(s)
    if u.scheme != SCHEME or u.username is not None or not u.netloc:
        raise MalformedURIError(f"malformed lakefs URI: {s!r}")
    # urlsplit().hostname LOWERCASES — use the raw netloc so invalid
    # uppercase repository names are preserved for the validators to
    # reject (Go's url.Hostname() keeps case); the port part is
    # stripped like the reference's Hostname()
    repository = u.netloc
    if ":" in repository:
        repository, _, port = repository.rpartition(":")
        # only a well-formed numeric port may be stripped (Go's
        # url.Parse rejects other colon placements as bad hosts)
        if ":" in repository or not port.isdigit():
            raise MalformedURIError(f"malformed lakefs URI: {s!r}")
    if not repository:
        raise MalformedURIError(f"malformed lakefs URI: {s!r}")
    ref, path = "", None
    if u.path:
        if not u.path.startswith("/"):  # pragma: no cover - urlsplit invariant
            raise MalformedURIError(f"malformed lakefs URI: {s!r}")
        levels = u.path[1:].split("/", 1)
        ref = levels[0]
        if len(levels) == 2:
            path = levels[1]
    return URI(repository=repository, ref=ref, path=path)


def parse_with_base_uri(s: str, base_uri: str = "") -> URI:
    """parser.go:160-165: a relative spec gets the base prepended."""
    if base_uri and not s.startswith(f"{SCHEME}://"):
        s = base_uri + s
    return parse(s)


def is_valid(s: str) -> bool:
    try:
        parse(s)
        return True
    except MalformedURIError:
        return False


def parse_uri_col(col):
    """Vectorized column form: split a lakefs:// URI column into a
    struct (repository, ref, path) with JVM regexp_extract — for
    URI-keyed manifests at scale. Non-matching rows yield empty
    strings (filter with ``is_valid``-shaped predicates upstream)."""
    from pyspark.sql import functions as F

    pat = r"^lakefs://([^/\s]+)(?:/([^/\s]+))?(?:/(\S*))?$"
    return F.struct(
        F.regexp_extract(col, pat, 1).alias("repository"),
        F.regexp_extract(col, pat, 2).alias("ref"),
        F.regexp_extract(col, pat, 3).alias("path"),
    )
