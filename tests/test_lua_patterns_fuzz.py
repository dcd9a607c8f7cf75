"""Property tests for the hand-built Lua-pattern translator
(lua/stdlib.py lua_pattern_to_re + the string.* surfaces).

Round-7 verdict ask #6: the translator is original code standing in for
lstrlib.c — fuzz it. Three property groups:

1. TOTALITY: for ARBITRARY (pattern, subject) pairs, every string.*
   surface either returns a value or raises a LuaError /
   LuaUnsupportedFeature — never an un-translated Python exception
   (re.error, IndexError, RecursionError) and never a hang.
2. INTERNAL CONSISTENCY on valid patterns: find/match/gmatch/gsub must
   agree with each other (find's span contains match's capture; gsub's
   reported count equals gmatch's match count; gsub with identity
   replacement is the identity).
3. ORACLE SEMANTICS on a curated grammar: generated patterns from the
   documented-supported subset against generated subjects, checked
   against hand-derivable invariants (anchors anchor, classes match
   only their class, captures slice the subject).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakefs_spark.lua.interp import LuaError, LuaUnsupportedFeature
from lakefs_spark.lua.stdlib import (
    lua_pattern_to_re,
    s_find,
    s_gmatch,
    s_gsub,
    s_match,
)

ACCEPTABLE = (LuaError, LuaUnsupportedFeature)


# -- 1. totality over arbitrary inputs ----------------------------------------

_any_pattern = st.text(
    alphabet="abxy01%().[]^$*+-?{}\\<>=/ %adswup", max_size=24
)
_any_subject = st.text(alphabet="abxy01 .%()-", max_size=32)


@settings(max_examples=400, deadline=None)
@given(pat=_any_pattern, s=_any_subject)
def test_total_over_arbitrary_inputs(pat, s):
    for fn in (s_find, s_match):
        try:
            fn(s, pat)
        except ACCEPTABLE:
            pass
    try:
        step = s_gmatch(s, pat)
        for _ in range(80):  # bounded drain of the Lua-style iterator
            if step() is None:
                break
    except ACCEPTABLE:
        pass
    try:
        s_gsub(s, pat, "x")
    except ACCEPTABLE:
        pass


@settings(max_examples=200, deadline=None)
@given(pat=_any_pattern)
def test_translator_total(pat):
    try:
        rx = lua_pattern_to_re(pat)
    except ACCEPTABLE:
        return
    # whatever it translated must be a COMPILABLE python pattern —
    # a translator bug that emits garbage re would explode at use time
    import re

    re.compile(rx)


# -- 2. cross-surface consistency on valid patterns ---------------------------

_valid_atom = st.sampled_from(
    ["a", "b", "0", "%a", "%d", "%s", "%w", "%l", "%u", ".", "[ab]",
     "[^ab]", "[a-y]", "%%"]
)
_valid_piece = st.builds(
    lambda a, q: a + q, _valid_atom, st.sampled_from(["", "*", "+", "-", "?"])
)
_valid_pattern = st.builds(
    lambda anchor, parts, cap: (
        ("^" if anchor else "")
        + (("(" + "".join(parts) + ")") if cap else "".join(parts))
    ),
    st.booleans(),
    st.lists(_valid_piece, min_size=1, max_size=4),
    st.booleans(),
)
_subject = st.text(alphabet="ab01 xyAB.", max_size=24)


@settings(max_examples=400, deadline=None)
@given(pat=_valid_pattern, s=_subject)
def test_surfaces_agree(pat, s):
    found = s_find(s, pat)
    matched = s_match(s, pat)
    step = s_gmatch(s, pat)
    gmatches = []
    while True:
        got = step()
        if got is None:
            break
        gmatches.append(got)
        if len(gmatches) > len(s) + 2:  # safety: no infinite empty-match loop
            raise AssertionError("gmatch failed to advance")
    _res, n_subs = s_gsub(s, pat, "")

    if found is None:
        assert matched is None
        # unanchored patterns: no find ⇒ no gmatch matches either
        if not pat.startswith("^"):
            assert gmatches == [] and n_subs == 0
        return
    # find returns (i, j[, captures...]); 1-based inclusive span in s
    i, j = found[0], found[1]
    assert 1 <= i <= len(s) + 1 and j >= i - 1 and j <= len(s)
    whole = s[i - 1 : j]
    if pat.startswith("(") and pat.endswith(")"):
        # single whole-pattern capture: match == the find span's text
        # (s_match returns the interpreter's multi-value tuple)
        assert matched[0] == whole
    # identity gsub: replacing with the whole match changes nothing
    same, n2 = s_gsub(s, pat, "%0")
    assert same == s
    assert n2 == n_subs
    if not pat.startswith("^"):
        assert len(gmatches) == n_subs
    else:
        assert n_subs in (0, 1)


# -- 3. pinned semantics of the documented subset ------------------------------


@pytest.mark.parametrize(
    "s,pat,expect",
    [
        ("hello world", "%a+", "hello"),
        ("hello world", "%s", " "),
        ("a1b22c", "%d+", "1"),
        ("key=value", "(%w+)=(%w+)", ("key", "value")),
        ("2024-03-05", "(%d+)-(%d+)-(%d+)", ("2024", "03", "05")),
        ("abc", "^abc$", "abc"),
        ("xabc", "^abc", None),
        ("a.b", "a%.b", "a.b"),
        ("axb", "a%.b", None),
        ("[tag]", "%[(%a+)%]", "tag"),
        ("aaa", "a-", ""),  # lazy matches empty at pos 1
        ("", "a*", ""),
    ],
)
def test_pinned_subset_semantics(s, pat, expect):
    got = s_match(s, pat)
    # s_match returns the interpreter's multi-value tuple; Lua callers
    # see value 1 when the pattern has no captures
    if got is not None and not isinstance(expect, tuple):
        got = got[0]
    if isinstance(expect, tuple):
        assert tuple(got) == expect
    else:
        assert got == expect


def test_unbalanced_captures_raise():
    with pytest.raises(ACCEPTABLE):
        s_match("x", "(a")
    with pytest.raises(ACCEPTABLE):
        s_match("x", "a)")  # lstrlib: invalid pattern capture
    with pytest.raises(ACCEPTABLE):
        s_match("x", "%")  # ends with %


def test_backref_validity_matches_lstrlib():
    # %1 valid only once capture 1 is CLOSED
    assert s_match("abab", "(ab)%1") == ("ab",)
    with pytest.raises(ACCEPTABLE):
        s_match("abab", "((a)%1)")  # %1 refers to a still-open capture
