"""Cross-engine-reproducible integer hash family.

MinHash/SimHash need k independent hash functions per shingle/token.
The classic trick (Broder '97) is ONE base hash of the string plus a
2-universal affine family h_i(x) = (a_i*x + b_i) mod p — k multiply-
adds instead of k string hashes. We derive the base from md5 so the
whole family is expressible both as Spark JVM built-ins (md5/conv —
WholeStageCodegen, no Python UDF) and as portable ANSI-ish SQL for an
independent oracle (DuckDB parses '0x…' hex to bigint). xxhash64 would
be marginally faster but is Spark-only, making results unverifiable
across engines.

Bit-width discipline keeps every product inside int64 on BOTH engines
(no silent hugeint promotion on one side and wraparound on the other):
    base(s) = first 15 hex chars of md5(s) as int  (60 bits)
    x       = base mod 2^30                        (30 bits)
    h_i     = (a_i * x + b_i) mod P, P = 2^31-1    (a_i*x < 2^61)

Constants a_i (1..P-1) and b_i (0..P-1) are md5-derived — fixed across
runs, engines, and partitionings.
"""

from __future__ import annotations

import hashlib

MERSENNE31 = 2_147_483_647  # 2^31 - 1
X_MOD = 1 << 30


def _const(tag: str, i: int, mod: int) -> int:
    h = hashlib.md5(f"lakefs-spark|{tag}|{i}".encode()).hexdigest()
    return int(h[:15], 16) % mod


def affine_constants(k: int) -> list[tuple[int, int]]:
    """k (a_i, b_i) pairs: a_i in [1, P-1], b_i in [0, P-1]."""
    return [
        (_const("a", i, MERSENNE31 - 1) + 1, _const("b", i, MERSENNE31))
        for i in range(k)
    ]


def base_hash_py(s: str) -> int:
    """Driver-side mirror of the engines' base hash (tests)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def affine_hash_py(s: str, a: int, b: int) -> int:
    return (a * (base_hash_py(s) % X_MOD) + b) % MERSENNE31
