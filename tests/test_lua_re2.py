"""lua/re2.py — the linear-time (Pike VM) regex engine behind the Lua
``regexp`` module.

The reference binds Go's regexp (RE2 — linear-time by construction,
pkg/actions/lua/regexp/regexp.go); Python's `re` backtracks, so the
engine exists to keep hook-visible matching O(pattern × subject) no
matter what pattern a hook author writes. Three test groups:

1. semantics vs Python `re` on the shared subset (hypothesis-driven
   plus a fixed table) — for supported patterns the two engines must
   agree on match/spans/captures, since Go's leftmost-first priority
   semantics coincide with Perl's here;
2. the adversarial cases that MOTIVATE the engine: classic
   catastrophic-backtracking patterns completing in bounded time;
3. the loud-failure contract: unsupported constructs raise
   UnsupportedRegex at compile, never mis-match at runtime.
"""

from __future__ import annotations

import re as pyre
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakefs_spark.lua import re2

# ---------------------------------------------------------------------------
# 1. agreement with Python re on the shared subset
# ---------------------------------------------------------------------------

AGREE_PATTERNS = [
    r"abc", r"^abc$", r"a+b", r"(a|b)+c", r"\d{3}-\d{4}", r"[A-Za-z_]\w*",
    r"colou?r", r"a.c", r"\bword\b", r"[^abc]+", r"x{2,3}", r"(\d+)-(\d+)",
    r"<.*?>", r"<.*>", r"a*", r"(a)(b)?", r"^$", r"[]x]", r"[\d-]+",
    r"(?:ab)+", r"(?i)HeLLo", r"(?s)a.c", r"(?m)^b$", r"\s+\S+",
    r"v\d+", r"^v\d+", r"(x+)(y*)z?", r"a{2}", r"a{2,}", r"a\.b",
]
SUBJECTS = [
    "", "abc", "xabcx", "aaab", "ababc", "call 555-1234 now", "9 foo_bar",
    "color", "colour", "a\nc", "a word here", "sword", "abcdef", "xxxx",
    "ab 12-34 56-78", "<a><b>", "bab", "ab a", "]", "1-2", "ababab",
    "hello", "HELLO", "a\nb\nc", "  two words ", "v42-rc", "v42",
    "xxyyz", "aa", "a.b", "axb",
]


def _go_suppress(py_matches):
    """Apply Go's FindAll empty-match rule to a Python finditer stream:
    drop an empty match whose start equals the previous match's end."""
    out, prev_end = [], -1
    for m in py_matches:
        s, e = m.span()
        if not (s == e and s == prev_end):
            out.append(m.group(0))
        prev_end = e
    return out


@pytest.mark.parametrize("pattern", AGREE_PATTERNS)
def test_agrees_with_python_re(pattern):
    rx = re2.Re2(pattern)
    prx = pyre.compile(pattern)
    for s in SUBJECTS:
        m, pm = rx.search(s), prx.search(s)
        assert (m is None) == (pm is None), (pattern, s)
        if m is not None:
            assert (m.start, m.end) == pm.span(), (pattern, s)
            assert m.groups() == [g for g in pm.groups()], (pattern, s)
        # full-scan parity: whole-match lists (Go FindAllString shape),
        # with Go's empty-match suppression applied to Python's list —
        # Go rejects an empty match starting exactly at the previous
        # match's end (allMatches in regexp.go), Python yields it.
        # NOTE this comparison only holds for patterns that can't match
        # empty at a position where a non-empty match also starts —
        # there Go (us) advances one char while Python retries; see
        # test_empty_match_iteration_follows_go_not_python. The table
        # above deliberately avoids such patterns (greedy-only stars).
        assert rx.find_all(s, -1) == _go_suppress(prx.finditer(s)), (
            pattern,
            s,
        )


# hypothesis: random subjects over a small alphabet against a fixed
# safe-pattern pool — engines must agree everywhere
@settings(max_examples=200, deadline=None)
@given(
    pattern=st.sampled_from(AGREE_PATTERNS),
    s=st.text(alphabet="abxy<>0189-. \n", max_size=40),
)
def test_agrees_with_python_re_fuzz(pattern, s):
    from hypothesis import assume

    # known deliberate divergence: python's bare $ also matches BEFORE
    # a final newline; Go's (and ours) is end-of-text only — see
    # test_dollar_is_end_of_text_like_go
    assume(not ("$" in pattern and "(?m)" not in pattern and s.endswith("\n")))
    m = re2.Re2(pattern).search(s)
    pm = pyre.compile(pattern).search(s)
    assert (m is None) == (pm is None)
    if m is not None:
        assert (m.start, m.end) == pm.span()
        assert m.groups() == list(pm.groups())


# hypothesis: generated PATTERNS from a grammar of supported constructs,
# compiled by both engines; wherever Python re also accepts the pattern,
# search results must agree. This is the fuzz pass for the hand-built
# parser/compiler itself.
_atom = st.sampled_from(
    ["a", "b", "x", "0", r"\d", r"\w", r"\s", ".", "[ab]", "[^ab]", "[a-x]"]
)
_piece = st.builds(
    lambda a, q: a + q, _atom, st.sampled_from(["", "*", "+", "?", "{1,2}", "*?"])
)
_concat = st.lists(_piece, min_size=1, max_size=4).map("".join)
_pattern = st.builds(
    lambda l, r, alt: f"({l})|{r}" if alt else l + r, _concat, _concat, st.booleans()
)


@settings(max_examples=300, deadline=None)
@given(pattern=_pattern, s=st.text(alphabet="ab x01", max_size=24))
def test_generated_patterns_agree(pattern, s):
    rx = re2.Re2(pattern)  # must never crash on grammar output
    try:
        prx = pyre.compile(pattern)
    except pyre.error:
        return
    m, pm = rx.search(s), prx.search(s)
    assert (m is None) == (pm is None), pattern
    if m is not None:
        assert (m.start, m.end) == pm.span(), pattern


# ---------------------------------------------------------------------------
# 2. the adversarial cases: linear time where backtracking explodes
# ---------------------------------------------------------------------------

EVIL = [
    (r"(a+)+$", "a" * 3000 + "b"),
    (r"(a|aa)+$", "a" * 1500 + "b"),
    (r"(a*)*c", "a" * 3000 + "b"),
    (r"(.*)*x", "y" * 1000),
    (r"(a|a?)+b$", "a" * 1000 + "!"),
]


@pytest.mark.parametrize("pattern,subject", EVIL)
def test_catastrophic_patterns_bounded(pattern, subject):
    t0 = time.monotonic()
    assert re2.Re2(pattern).search(subject) is None
    # generous wall bound — the point is "milliseconds, not centuries"
    assert time.monotonic() - t0 < 10.0


def test_long_subject_linear():
    # time 10x subject → must grow ~10x, not 100x (allow wide noise)
    rx = re2.Re2(r"(a+)+$")
    t0 = time.monotonic()
    rx.search("a" * 2000 + "b")
    t1 = time.monotonic() - t0
    t0 = time.monotonic()
    rx.search("a" * 20000 + "b")
    t2 = time.monotonic() - t0
    assert t2 < max(t1, 1e-3) * 400  # superlinear-but-poly ok; exp is not


# ---------------------------------------------------------------------------
# 3. loud failure on the unsupported remainder + Go API details
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "pattern",
    [r"(?=x)", r"(?!x)", r"(?<=x)", r"(?P<n>x)", r"\1", r"\p{L}", r"a{1,9999}"],
)
def test_unsupported_raises_at_compile(pattern):
    with pytest.raises(re2.UnsupportedRegex):
        re2.Re2(pattern)


@pytest.mark.parametrize("pattern", [r"(a", r"a)", r"[abc", r"a**", r"*a"])
def test_malformed_raises(pattern):
    with pytest.raises(ValueError):
        re2.Re2(pattern)


def test_go_api_shapes():
    # FindAllString returns WHOLE matches even when groups exist
    assert re2.Re2(r"(a)b").find_all("ab ab", -1) == ["ab", "ab"]
    # n >= 0 truncates
    assert re2.Re2(r"x").find_all("xxx", 2) == ["x", "x"]
    # FindString returns "" on no match; FindStringSubmatch returns nil
    assert re2.Re2(r"q").find("abc") == ""
    assert re2.Re2(r"(q)").find_submatch("abc") is None
    # unmatched optional group renders "" in submatch lists (DeepPush of
    # Go's empty string for non-participating groups)
    assert re2.Re2(r"(a)(b)?").find_all_submatch("ab a", -1) == [
        ["ab", "a", "b"],
        ["a", "a", ""],
    ]
    # QuoteMeta
    assert re2.quote_meta("a.b*c+") == r"a\.b\*c\+"
    assert re2.match(re2.quote_meta("1.2"), "1.2")
    assert not re2.match(re2.quote_meta("1.2"), "1x2")


def test_commit_metadata_validator_shape():
    """The exact surface examples/hooks/commit_metadata_validator.lua
    exercises: regexp.match(props.pattern, value) — with a hostile
    value against a sloppy pattern staying fast."""
    assert re2.match(r"^[A-Z]+-\d+$", "JIRA-123")
    assert not re2.match(r"^[A-Z]+-\d+$", "nope")
    t0 = time.monotonic()
    assert not re2.match(r"^([A-Z]+-?)+\d$", "A-" * 2000 + "!")
    assert time.monotonic() - t0 < 10.0


def test_dollar_is_end_of_text_like_go():
    """Go/RE2's bare $ anchors at end of TEXT; Python additionally
    matches just before a final newline. We follow Go — a hook's
    strict-suffix validation must not silently accept a value with a
    trailing newline smuggled in."""
    assert re2.match(r"^abc$", "abc")
    assert not re2.match(r"^abc$", "abc\n")  # python's re would match
    assert not re2.match(r"^$", "\n")
    assert re2.match(r"(?m)^abc$", "abc\nrest")  # multiline opts in


def test_empty_match_iteration_follows_go_not_python():
    """Go's FindAll rule: after an EMPTY match the next search starts
    one character over — a non-empty match is never retried at the
    same position. Python's finditer (3.7+) DOES retry non-empty
    there, so for lazy patterns the two diverge; this engine follows
    Go (the Lua regexp module binds Go's regexp). Pinned so nobody
    'fixes' it into Python semantics: go's \\w*? over '0ab' is four
    empty matches, python's is ['', '0', '', 'a', '', 'b', '']."""
    assert re2.Re2(r"\w*?").find_all("0ab", -1) == ["", "", "", ""]
    assert re2.Re2(r"a??").find_all("ba", -1) == ["", "", ""]


def test_empty_match_after_nonempty_is_suppressed_like_go():
    """Go's allMatches rejects an empty match that starts exactly where
    the previous match ended: FindAllString("a*", "aa") == ["aa"], not
    ["aa", ""]. Python's finditer yields the trailing empty match; the
    Lua regexp module binds Go, so we follow Go."""
    assert re2.Re2(r"a*").find_all("aa", -1) == ["aa"]
    # ...but an empty match NOT at the previous end is kept: after
    # "aaa" (prev end 3) the empty at 3 is dropped, the empty at 4 is
    # a fresh position and delivered. Go: ["aaa", ""].
    assert re2.Re2(r"a*").find_all("aaab", -1) == ["aaa", ""]
    # all-empty runs are unaffected (each starts one past prev end)
    assert re2.Re2(r"x*").find_all("ab", -1) == ["", "", ""]
    # limit counts DELIVERED matches, not scanned ones: the empty at 2
    # is suppressed and does NOT consume a slot, so the second "aa" at
    # 3 still makes the n=2 cut.
    assert re2.Re2(r"a*").find_all("aabaa", 2) == ["aa", "aa"]


def test_octal_escapes_parse_like_go():
    r"""Go RE2: \0 begins an up-to-3-digit octal escape — \012 is '\n',
    never NUL followed by literal "12" (that silent divergence was the
    r8 advisory)."""
    assert re2.Re2(r"a\012b").match("a\nb")
    assert not re2.Re2(r"a\012b").match("a\x0012b")
    assert re2.Re2(r"\0").match("\x00")
    assert re2.Re2(r"\07").match("\a")
    assert re2.Re2(r"\0101").match("\x081")  # 3 digits max (\010), then literal 1
    assert re2.Re2(r"[\012]").match("\n")  # octal inside a class too
