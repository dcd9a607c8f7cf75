"""lakefs:// URI parsing (pkg/uri/parser.go + parser_test.go shapes)."""

from __future__ import annotations

import pytest

from lakefs_spark.functions import uri as U


def test_parse_full():
    u = U.parse("lakefs://my-repo/main/path/to/obj.parquet")
    assert (u.repository, u.ref, u.path) == ("my-repo", "main", "path/to/obj.parquet")
    assert str(u) == "lakefs://my-repo/main/path/to/obj.parquet"


def test_empty_path_vs_no_path():
    with_slash = U.parse("lakefs://repo1/branch/")
    without = U.parse("lakefs://repo1/branch")
    assert with_slash.path == "" and without.path is None
    assert str(with_slash) == "lakefs://repo1/branch/"
    assert str(without) == "lakefs://repo1/branch"
    assert with_slash != without


def test_repo_only():
    u = U.parse("lakefs://repo1")
    assert (u.repository, u.ref, u.path) == ("repo1", "", None)
    u.validate_repository()
    with pytest.raises(U.MalformedURIError):
        U.parse("lakefs://repo1/main").validate_repository()


@pytest.mark.parametrize(
    "bad",
    ["s3://bucket/key", "lakefs://", "lakefs://user@repo/main", "http://repo/x",
     "repo/main/path"],
)
def test_malformed(bad):
    assert not U.is_valid(bad)


def test_base_uri_prepend():
    u = U.parse_with_base_uri("main/x.csv", "lakefs://my-repo/")
    assert (u.repository, u.ref, u.path) == ("my-repo", "main", "x.csv")
    # absolute spec ignores the base
    u2 = U.parse_with_base_uri("lakefs://other/dev", "lakefs://my-repo/")
    assert u2.repository == "other"


def test_kind_validators():
    U.parse("lakefs://repo1/main").validate_branch()
    U.parse("lakefs://repo1/main~2").validate_ref()
    with pytest.raises(U.MalformedURIError):
        U.parse("lakefs://repo1/main~2").validate_branch()  # ~ not in \w-
    U.parse("lakefs://repo1/main/a/b").validate_path()
    with pytest.raises(U.MalformedURIError):
        U.parse("lakefs://repo1/main").validate_path()
    with pytest.raises(U.MalformedURIError):
        U.parse("lakefs://UP/main").validate_branch()  # repo id is lowercase


def test_parse_uri_col_vectorized(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("lakefs://repo-a/main/data/x.parquet",),
         ("lakefs://repo-b/dev",)],
        "u string",
    )
    rows = {tuple(r["p"]) for r in df.select(U.parse_uri_col(F.col("u")).alias("p")).collect()}
    assert ("repo-a", "main", "data/x.parquet") in rows
    assert ("repo-b", "dev", "") in rows
