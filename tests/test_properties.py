"""Property-based tests (hypothesis) for the pure-python engine core:
chunk-boundary determinism, prefix upper-bound correctness, typed-hash
framing injectivity, ref-expression parsing. No SparkSession needed —
these run in milliseconds and pin the invariants the distributed paths
rely on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lakefs_spark.functions.ident import _frame, fnv64a, typed_hash_hex
from lakefs_spark.functions.prefix import upper_bound_for_prefix
from lakefs_spark.plans.chunker import chunk_of_key
from lakefs_spark.storage.refs import parse_mods

keys = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), min_size=0, max_size=60
)


@given(st.floats(min_value=0, max_value=60_000_000_000, allow_nan=False),
       st.floats(min_value=0, max_value=60_000_000_000, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_path_time_roundtrip_and_reverse_ordering(t1, t2):
    """Time-partitioned addresses: resolve(mint(ts)) == rotation hour,
    and a strictly newer rotation hour sorts strictly FIRST (the
    pkg/upload/path_provider.go reverse-time property that lets
    newest-first listings and range predicates prune by age)."""
    from lakefs_spark.functions.pathtime import (
        PART_SECONDS,
        new_physical_path,
        resolve_path_time,
    )

    a1 = new_physical_path("tok", t1)
    a2 = new_physical_path("tok", t2)
    assert resolve_path_time(a1) == float(int(t1) // PART_SECONDS * PART_SECONDS)
    r1, r2 = int(t1) // PART_SECONDS, int(t2) // PART_SECONDS
    if r1 > r2:  # t1 in a strictly newer rotation hour
        assert a1 < a2
    elif r1 < r2:
        assert a1 > a2
    else:
        assert a1 == a2
    assert resolve_path_time("data/ab/legacy") is None
    assert resolve_path_time("other/x") is None


_seg = st.text(alphabet="abc", min_size=1, max_size=3)
_doc_key = st.builds("/".join, st.lists(_seg, min_size=1, max_size=4))


@given(st.lists(_doc_key, min_size=0, max_size=12, unique=True), _doc_key, st.integers(0, 6))
@settings(max_examples=150, deadline=None)
def test_local_store_listing_matches_mem_store_contract(doc_keys, probe, cut):
    """LocalStore.list_docs (recursive walk + subtree pruning) must
    equal MemStore's plain string-prefix match for ANY key set and ANY
    prefix — including prefixes that end mid-component, cross '/'
    boundaries, or name nothing."""
    import shutil
    import tempfile

    from lakefs_spark.storage.store import LocalStore, MemStore

    local = LocalStore(tempfile.mkdtemp(prefix="lakefs_proplist_"))
    try:
        mem = MemStore(local.data_root + "-mem")
        for k in doc_keys:
            local.put_doc(k, {"k": k})
            mem.put_doc(k, {"k": k})
        prefix = probe[:cut]  # arbitrary cut: partial components included
        assert local.list_docs(prefix) == mem.list_docs(prefix)
        if doc_keys:  # a real key's prefixes must find it in both stores
            whole = doc_keys[0]
            for n in (1, len(whole) // 2, len(whole)):
                assert local.list_docs(whole[:n]) == mem.list_docs(whole[:n])
    finally:  # one dir per hypothesis example — don't litter /tmp
        shutil.rmtree(local.data_root, ignore_errors=True)


@given(st.lists(keys, min_size=1, max_size=40), keys)
@settings(max_examples=200, deadline=None)
def test_chunk_of_key_monotone_and_stable(boundaries, k):
    bs = sorted(set(boundaries))
    c = chunk_of_key(k, bs)
    assert 0 <= c <= len(bs)
    # chunk i covers (b[i-1], b[i]]: the assignment is the unique sorted
    # position, so it is monotone in the key
    if c > 0:
        assert k > bs[c - 1]
    if c < len(bs):
        assert k <= bs[c]


@given(st.lists(keys, min_size=1, max_size=30), st.lists(keys, min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_chunk_assignment_partition_invariant(part_a, part_b):
    """The same key gets the same chunk regardless of which 'partition'
    presents it — the invariant that makes distributed re-chunking
    deterministic (range IDs stable across commits)."""
    bs = sorted(set(part_a + part_b))
    for k in part_a + part_b:
        assert chunk_of_key(k, bs) == chunk_of_key(k, sorted(set(bs)))


all_text = st.text(min_size=0, max_size=60)  # full unicode, incl. astral


@given(all_text.filter(lambda s: s != ""))
@settings(max_examples=300, deadline=None)
def test_upper_bound_bounds_every_extension(p):
    ub = upper_bound_for_prefix(p)
    if ub is None:
        return
    assert p < ub
    for suffix in ("\x00", "a", "￿", p, "\U0010ffff"):
        # codepoint order (here) and UTF-8 byte order (Spark) agree for
        # valid unicode, so one assertion covers both comparators
        assert (p + suffix) < ub
    assert ub.encode("utf-8")  # bound is always valid unicode


@given(all_text.filter(lambda s: s != ""), all_text)
@settings(max_examples=300, deadline=None)
def test_upper_bound_excludes_non_prefixed(p, other):
    """Keys >= upper bound never carry the prefix."""
    ub = upper_bound_for_prefix(p)
    if ub is not None and other >= ub:
        assert not other.startswith(p)


@given(st.lists(st.text(max_size=20), min_size=1, max_size=6),
       st.lists(st.text(max_size=20), min_size=1, max_size=6))
@settings(max_examples=300, deadline=None)
def test_typed_hash_framing_injective(a, b):
    """len-tagged framing: different part lists never collide at the
    framing layer (('ab','c') vs ('a','bc'))."""
    if a != b:
        assert _frame(a) != _frame(b) or typed_hash_hex(a) != typed_hash_hex(b)
        # framing itself must differ for distinct lists
        assert _frame(a) != _frame(b)
    else:
        assert typed_hash_hex(a) == typed_hash_hex(b)


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_fnv64a_matches_reference_vectors(data):
    h = fnv64a(data)
    assert 0 <= h < (1 << 64)


def test_fnv64a_known_vectors():
    # published FNV-1a 64 test vectors
    assert fnv64a(b"") == 0xCBF29CE484222325
    assert fnv64a(b"a") == 0xAF63DC4C8601EC8C
    assert fnv64a(b"foobar") == 0x85944171F73967E8


@given(st.lists(st.one_of(st.binary(max_size=80), st.text(max_size=40)), max_size=60))
@settings(max_examples=100, deadline=None)
def test_fnv64a_np_matches_scalar(items):
    """The numpy column-fold (export boundary rule) is bit-identical to
    the scalar fold on arbitrary bytes and UTF-8 text (incl. empties)."""
    import numpy as np

    from lakefs_spark.functions.ident import fnv64a_np

    got = fnv64a_np(items)
    exp = np.array(
        [fnv64a(x.encode("utf-8") if isinstance(x, str) else x) for x in items],
        dtype=np.uint64,
    )
    assert got.dtype == np.uint64 and (got == exp).all()


@given(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9))
@settings(max_examples=50, deadline=None)
def test_parse_mods_roundtrip(n1, n2):
    mods = f"~{n1}^{n2}"
    assert parse_mods(mods) == [("~", n1), ("^", n2)]


def test_parse_mods_defaults():
    assert parse_mods("~") == [("~", 1)]
    assert parse_mods("^2~") == [("^", 2), ("~", 1)]


# -- multipart etag (functions/checksum.py) --------------------------------

hex_md5 = st.text(alphabet="0123456789abcdef", min_size=32, max_size=32)


@given(st.lists(hex_md5, min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_multipart_etag_matches_independent_recompute(parts):
    import hashlib

    from lakefs_spark.functions.checksum import multipart_etag

    got = multipart_etag(parts)
    digest, n = got.rsplit("-", 1)
    assert int(n) == len(parts)
    assert digest == hashlib.md5(
        b"".join(bytes.fromhex(p) for p in parts)
    ).hexdigest()


@given(st.lists(hex_md5, min_size=2, max_size=8))
@settings(max_examples=50, deadline=None)
def test_multipart_etag_order_sensitive(parts):
    from lakefs_spark.functions.checksum import multipart_etag

    if parts != list(reversed(parts)):  # palindromes reverse to themselves
        assert multipart_etag(parts) != multipart_etag(list(reversed(parts)))


# -- sync plan (operators/sync.py) -----------------------------------------


def _sync_plan_reference(lc: dict, rc: dict) -> dict:
    """Pure-python restatement of sync_plan's CASE ladder."""
    out = {}
    for p in set(lc) | set(rc):
        l, r = lc.get(p), rc.get(p)
        if l == "removed" and r == "removed":
            continue
        if l is not None and r is not None:
            out[p] = "conflict"
        elif l == "removed":
            out[p] = "delete_remote"
        elif l is not None:
            out[p] = "upload"
        elif r == "removed":
            out[p] = "delete_local"
        else:
            out[p] = "download"
    return out


change = st.sampled_from(["added", "changed", "removed"])
paths = st.text(alphabet="abcdef/", min_size=1, max_size=8)


@given(
    st.dictionaries(paths, change, max_size=12),
    st.dictionaries(paths, change, max_size=12),
)
@settings(max_examples=20, deadline=None)
def test_sync_plan_matches_reference_model(spark, lc, rc):
    from lakefs_spark.operators.sync import sync_plan

    schema = "path string, change string"
    ldf = spark.createDataFrame(list(lc.items()) or [], schema)
    rdf = spark.createDataFrame(list(rc.items()) or [], schema)
    got = {r["path"]: r["op"] for r in sync_plan(ldf, rdf).collect()}
    assert got == _sync_plan_reference(lc, rc)


def test_global_row_number_matches_window(spark):
    """Distributed global row number == unpartitioned-window row number,
    including across range-partition boundaries and with skewed counts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lakefs_spark.functions.rownum import with_global_row_number

    df = spark.range(0, 10007).select(
        F.concat(F.lit("k"), F.lpad((F.col("id") * 7919 % 10007).cast("string"), 6, "0")).alias("k"),
        F.col("id").alias("v"),
    )
    got = {r["k"]: r["rn"] for r in with_global_row_number(df, ["k"], num_partitions=13).collect()}
    want = {
        r["k"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(Window.orderBy("k"))).collect()
    }
    assert got == want
    # empty input
    assert with_global_row_number(df.limit(0), ["k"]).count() == 0


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF probe of 3/25 inverted lists keeps usable recall vs exact
    top-k, and never returns self-matches or >k rows per query."""
    from pyspark.sql import functions as F

    from lakefs_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8)
    ivf = {(r["qa"], r["qb"]) for r in ivf_topk(q, emb, n_centroids=100, nprobe=3, k=5).collect()}
    exact = {
        (r["qa"], r["qb"]) for r in brute_force_topk(q, emb, k=5).collect()
    }
    per_q = {}
    for qa, qb in ivf:
        assert qa != qb
        per_q[qa] = per_q.get(qa, 0) + 1
    assert all(n <= 5 for n in per_q.values())
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.3, recall


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=25,
    ),
    st.randoms(),
)
@settings(max_examples=200, deadline=None)
def test_session_interval_fold_is_order_insensitive(events, rnd):
    """The streaming sessionizer's interval fold must yield the batch
    gaps-and-islands sessions for ANY arrival order — the operator's
    batch-invariance contract (streaming/sessions.merge_event)."""
    from lakefs_spark.streaming.sessions import merge_event

    gap = 5

    def fold(seq):
        ivals = []
        for t, v in seq:
            ivals = merge_event(ivals, t, float(v), gap)
        return sorted((iv[0], iv[1], iv[2], round(iv[3], 9)) for iv in ivals)

    # reference: sorted-order gaps-and-islands
    ref_sessions = []
    for t, v in sorted(events):
        if ref_sessions and t - ref_sessions[-1][1] < gap:
            ref_sessions[-1][1] = max(ref_sessions[-1][1], t)
            ref_sessions[-1][2] += 1
            ref_sessions[-1][3] += v
        else:
            ref_sessions.append([t, t, 1, float(v)])
    ref = sorted((a, b, n, round(s, 9)) for a, b, n, s in ref_sessions)

    shuffled = list(events)
    rnd.shuffle(shuffled)
    assert fold(shuffled) == ref
    assert fold(list(reversed(events))) == ref


@given(st.text(alphabet="abcdefghij-/.: _~^$@0123456789", max_size=40))
@settings(max_examples=300, deadline=None)
def test_uri_parse_round_trip(s):
    """Any string lakefs://<s> either fails to parse or round-trips
    byte-identically through str(parse(...)) (pkg/uri/parser.go
    Parse/String symmetry)."""
    from lakefs_spark.functions import uri as U

    full = "lakefs://" + s
    try:
        u = U.parse(full)
    except U.MalformedURIError:
        return
    # str(parse(x)) is a canonical form: parsing it again is identity,
    # and it equals the input byte-for-byte unless a port was stripped
    # (the reference's url.Hostname() drops ports the same way)
    again = U.parse(str(u))
    # the string form is a stable canonicalization; full structural
    # identity additionally holds whenever the ref is non-empty (a
    # degenerate empty-ref URI canonicalizes to the bare repo form,
    # collapsing path "" to no-path, like the reference's String)
    assert str(again) == str(u)
    if u.ref:
        assert again == u
    # byte identity additionally holds unless the input had a port
    # (stripped) or an empty ref segment (trailing-slash forms
    # canonicalize to the bare repo URI, like the reference's String)
    if ":" not in s.split("/", 1)[0] and (u.ref or "/" not in s):
        assert str(u) == full


# -- Lua pattern translator (lakefs_spark/lua/stdlib.py) ---------------------


@given(st.text(max_size=24))
@settings(max_examples=400, deadline=None)
def test_lua_pattern_translator_total(pat):
    """For ARBITRARY pattern strings the translator either yields a
    compilable Python regex or raises LuaError — a raw re.error or
    other Python exception escaping into a hook run would bypass the
    dispatcher's failed/unsupported classification."""
    import re

    from lakefs_spark.lua.interp import LuaError
    from lakefs_spark.lua.stdlib import lua_pattern_to_re

    try:
        rx = lua_pattern_to_re(pat)
    except LuaError:
        return
    try:
        re.compile(rx, re.DOTALL)
    except re.error as e:  # translator produced garbage — a real bug
        raise AssertionError(f"{pat!r} -> {rx!r}: {e}") from None


@given(
    st.text(alphabet="abc/=.-", max_size=30),
    st.text(alphabet="abc/=.-", min_size=1, max_size=5),
)
@settings(max_examples=300, deadline=None)
def test_lua_find_plain_matches_python_substring(s, needle):
    """string.find(s, needle, 1, true) is Python str.find, 1-based."""
    from lakefs_spark.lua.stdlib import s_find

    got = s_find(s, needle, 1, True)
    idx = s.find(needle)
    if idx < 0:
        assert got is None
    else:
        assert got == (idx + 1, idx + len(needle))


@given(
    st.text(alphabet="abcde", max_size=30),
    st.text(alphabet="abcde", min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_lua_literal_pattern_find_equals_plain(s, needle):
    """A pattern with no magic characters searches like a plain
    substring — the quantifier-vs-literal classification must never
    reinterpret ordinary text."""
    from lakefs_spark.lua.stdlib import s_find

    assert s_find(s, needle) == s_find(s, needle, 1, True)


@given(st.text(alphabet="ab ", max_size=40))
@settings(max_examples=300, deadline=None)
def test_lua_gsub_count_matches_python(s):
    """gsub('a'->'X') replaces exactly s.count('a') occurrences and
    round-trips the remaining text."""
    from lakefs_spark.lua.stdlib import s_gsub

    out, n = s_gsub(s, "a", "X")
    assert n == s.count("a")
    assert out == s.replace("a", "X")
