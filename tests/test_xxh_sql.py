"""Pins for the DuckDB-side XXH64 (functions/xxh_sql.py).

The three production-hash keys (dedup_fuzzy_minhash, dedup_simhash,
sim_topk_lsh) hold value-checked oracles ONLY because the generated
SQL reproduces Spark's ``xxhash64`` bit-for-bit.  These tests pin
that equivalence against the live JVM implementation — strings across
the algorithm's length regimes (empty, byte tail, 4-byte step, 8-byte
stripes, 32-byte block phase, multi-block), multi-byte UTF-8, and the
chained int-seed path Spark uses for ``xxhash64(col, lit(k))``.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ingest_sharepoint_file_to_fabric_lakehouse_spark.functions import xxh_sql as X


def _rand_strings() -> list[str]:
    rng = random.Random(20260815)
    out = [""]
    for length in list(range(1, 70)) + [95, 127, 128, 129, 200, 333]:
        out.append("".join(chr(rng.randint(32, 126)) for _ in range(length)))
        out.append(
            "".join(chr(rng.randint(0x80, 0x2FF)) for _ in range(max(1, length // 2)))
        )
    return out


def test_sql_xxh64_strings_match_spark(spark):
    strs = _rand_strings()
    want = {
        r["i"]: r["h"]
        for r in spark.createDataFrame(
            list(enumerate(strs)), "i int, s string"
        ).select("i", F.xxhash64("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(strs)))
        + ") v(i, s)",
        strs,
    )
    sql = (
        "WITH "
        + X.xxh_str_ctes("hx", "t", "i", "s", "h")
        + f"\nSELECT i, {X.to_signed('h')} AS h FROM hx_out"
    )
    got = dict(con.execute(sql).fetchall())
    assert got == want


def test_sql_xxh64_chained_int_seed_matches_spark(spark):
    """xxhash64(s, lit(k)) == hashInt(k, xxh64(s, 42)) — the MinHash
    seed-chaining identity the oracle's cost model relies on."""
    strs = _rand_strings()[:40]
    rows = [(i, s, k) for i, s in enumerate(strs) for k in (0, 1, 7, 31, -3)]
    want = {
        (r["i"], r["k"]): r["h"]
        for r in spark.createDataFrame(rows, "i int, s string, k int")
        .select("i", "k", F.xxhash64("s", F.col("k")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?, {k})" for i, _, k in rows)
        + ") v(i, s, k)",
        [s for _, s, _ in rows],
    )
    sql = (
        "WITH "
        + X.xxh_str_ctes("hs", "t", "i, k", "s", "hstr")
        + ",\n"
        + X.xxh_int_ctes("ik", "hs_out", "i, k", "k", "hstr", "h")
        + f"\nSELECT i, k, {X.to_signed('h')} AS h FROM ik_out"
    )
    got = {(i, k): h for i, k, h in con.execute(sql).fetchall()}
    assert got == want


def test_sql_xxh64_int_path_matches_spark(spark):
    """Spark's 4-byte hashInt path (the LSH plane-sign derivation),
    including negative ints' two's-complement low-32 masking."""
    vals = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31), 123456789, -987654321]
    want = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v int")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(v INT); INSERT INTO t VALUES "
        + ",".join(f"({v})" for v in vals)
    )
    sql = (
        "WITH "
        + X.xxh_int_ctes("ih", "t", "v", "v", X.seed_u(), "h")
        + f"\nSELECT v, {X.to_signed('h')} AS h FROM ih_out"
    )
    got = dict(con.execute(sql).fetchall())
    assert got == want


@pytest.mark.parametrize("r", [1, 7, 11, 12, 18, 23, 27, 31, 33])
def test_rotl_matches_python(r):
    con = duckdb.connect()
    for x in (0, 1, (1 << 64) - 1, 0x9E3779B185EBCA87, 1 << 63):
        got = con.execute(f"SELECT {X.rotl(str(x), r)}").fetchone()[0]
        want = ((x << r) | (x >> (64 - r))) & ((1 << 64) - 1)
        assert int(got) == want, (x, r)


def test_mulmod_matches_python():
    rng = random.Random(3)
    con = duckdb.connect()
    for _ in range(50):
        a, b = rng.getrandbits(64), rng.getrandbits(64)
        got = con.execute(f"SELECT {X.mulmod(str(a), str(b))}").fetchone()[0]
        assert int(got) == (a * b) % (1 << 64), (a, b)
