"""Spark-exact XXH64 as single-statement DuckDB SQL.

Spark's ``xxhash64`` is the engine's production hash (shingle MinHash
signatures, SimHash bit votes, LSH plane signs) — fast because it is
JVM-side and codegen'd, but historically UNCHECKABLE against DuckDB,
which ships no xxHash: the three keys built on it carried rows-only
(weak) verdicts with value-checked portable/witness twins beside them.

This module closes that gap: it GENERATES DuckDB SQL that reproduces
Spark's xxhash64 bit-for-bit, so the production-path keys get real
value-checked oracles.  Verified against ``F.xxhash64`` on random
strings (0..200 bytes, single- and multi-byte UTF-8) and ints —
see tests/test_xxh_sql.py.

Semantics being reproduced (validated empirically, 0 mismatches):

* ``xxhash64(str_col)``        = XXH64(utf8_bytes, seed=42) — the
  CANONICAL xxHash64 algorithm (Cyan4973 spec): 32-byte 4-lane block
  phase, 8-byte stripes, one 4-byte step, byte tail, avalanche.
* ``xxhash64(int_col)``        = Spark's 4-byte hashInt path.
* ``xxhash64(a, b)``           = chained: the first arg hashes with
  seed 42, the result seeds the second (``hashInt(b, hash(a, 42))``).

Why GENERATED single-statement SQL instead of CREATE MACRO: the
driver executes each oracle as one statement; macros would make the
oracle multi-statement and bet the verdict on the driver's executor
accepting that.  Instead every hash is expressed as a chain of CTEs
(each CTE = one let-binding of the algorithm, so no expression blows
up exponentially) plus ``list_reduce`` for the variable-length folds
(xxHash is a sequential, non-associative fold — list_reduce is the
only order-preserving reduce DuckDB 1.0 has).

All arithmetic is UBIGINT with the two overflow-prone ops routed
through HUGEINT: multiply-mod-2^64 via 32-bit limb decomposition
(a full 64x64 product would overflow signed 128), and rotate-left as
(x % 2^(64-r)) * 2^r + (x >> (64-r)) because DuckDB's ``<<`` raises
on overflow rather than wrapping.
"""

from __future__ import annotations

M64 = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def _hug(x: str) -> str:
    return f"CAST({x} AS HUGEINT)"


def _u(x: str) -> str:
    return f"CAST({x} AS UBIGINT)"


def mulmod(a: str, b: str) -> str:
    """(a * b) mod 2^64 via 32-bit limbs (full product overflows HUGEINT)."""
    ah, bh = _hug(a), _hug(b)
    return _u(
        f"((({ah}) % 4294967296) * ({bh})"
        f" + (((({ah}) // 4294967296) * (({bh}) % 4294967296)) % 4294967296)"
        f" * 4294967296) % {M64}"
    )


def addmod(a: str, b: str) -> str:
    return _u(f"({_hug(a)} + {_hug(b)}) % {M64}")


def rotl(x: str, r: int) -> str:
    """Left-rotate without ``<<`` (DuckDB raises on shift overflow)."""
    lo, hi = 1 << (64 - r), 1 << r
    return _u(f"({_hug(x)} % {lo}) * {hi} + ({_hug(x)} // {lo})")


def xxh_round(acc: str, lane: str) -> str:
    return mulmod(rotl(addmod(acc, mulmod(lane, str(P2))), 31), str(P1))


def _merge(h: str, v: str) -> str:
    return addmod(mulmod(f"xor({h}, {xxh_round('0', v)})", str(P1)), str(P4))


def _fmix_ctes(prefix: str, h_col: str, cols: str, out_col: str) -> str:
    """The 3-step avalanche as two intermediate CTEs + final column."""
    f1 = mulmod(f"xor({h_col}, {h_col} >> 33)", str(P2))
    f2 = f"xor({prefix}_f1v, {prefix}_f1v >> 29)"
    return (
        f"{prefix}_fa AS (SELECT {cols}, {f1} AS {prefix}_f1v FROM {prefix}_fin),\n"
        f"{prefix}_fb AS (SELECT {cols}, {mulmod(f2, str(P3))} AS {prefix}_f2v"
        f" FROM {prefix}_fa),\n"
        f"{prefix}_out AS (SELECT {cols},"
        f" xor({prefix}_f2v, {prefix}_f2v >> 32) AS {out_col} FROM {prefix}_fb)"
    )


def _lane8(bs: str, o: str) -> str:
    """Little-endian 8-byte lane starting at 0-based offset ``o`` of
    1-indexed byte list ``bs`` (sum of disjoint ranges — never overflows)."""
    return _u(
        " + ".join(f"{bs}[({o}) + {i + 1}] * {1 << (8 * i)}" for i in range(8))
    )


def _lane4(bs: str, o: str) -> str:
    return _u(
        " + ".join(f"{bs}[({o}) + {i + 1}] * {1 << (8 * i)}" for i in range(4))
    )


def xxh_str_ctes(prefix: str, src: str, cols: str, str_expr: str, out_col: str) -> str:
    """CTE chain hashing ``str_expr`` (a VARCHAR) with seed 42.

    Emits CTEs ``{prefix}_b0 .. {prefix}_out``; the final CTE carries
    ``cols`` plus ``out_col`` (UBIGINT — convert with
    :func:`to_signed` to compare against Spark's BIGINT).
    ``cols`` is the comma-joined key columns to carry through.
    """
    init_v1 = (SEED + P1 + P2) % M64
    init_v2 = (SEED + P2) % M64
    init_v3 = SEED % M64
    init_v4 = (SEED - P1) % M64
    h_small = (SEED + P5) % M64

    blocks = (
        "list_transform(range(0, CAST(nb AS INT)), j -> {"
        f"'v1': {_lane8('bs', '32*j')}, 'v2': {_lane8('bs', '32*j + 8')},"
        f" 'v3': {_lane8('bs', '32*j + 16')}, 'v4': {_lane8('bs', '32*j + 24')}"
        "})"
    )
    init = (
        "{"
        f"'v1': {_u(str(init_v1))}, 'v2': {_u(str(init_v2))},"
        f" 'v3': {_u(str(init_v3))}, 'v4': {_u(str(init_v4))}"
        "}"
    )
    block_fold = (
        f"list_reduce(list_prepend({init}, {blocks}), (acc, x) -> {{"
        f"'v1': {xxh_round('acc.v1', 'x.v1')}, 'v2': {xxh_round('acc.v2', 'x.v2')},"
        f" 'v3': {xxh_round('acc.v3', 'x.v3')}, 'v4': {xxh_round('acc.v4', 'x.v4')}"
        "})"
    )
    rot_sum = addmod(
        addmod(addmod(rotl("vacc.v1", 1), rotl("vacc.v2", 7)), rotl("vacc.v3", 12)),
        rotl("vacc.v4", 18),
    )

    eight_lanes = (
        f"list_transform(range(0, CAST(e8 AS INT)), j -> {_lane8('bs', 'i0 + 8*j')})"
    )
    eight_step = addmod(
        mulmod(rotl(f"xor(acc, {xxh_round('0', 'x')})", 27), str(P1)), str(P4)
    )
    four_step = addmod(
        mulmod(rotl(f"xor(h8, {mulmod(_lane4('bs', 'fi'), str(P1))})", 23), str(P2)),
        str(P3),
    )
    byte_step = mulmod(rotl(f"xor(acc, {mulmod('x', str(P5))})", 11), str(P1))

    return f"""{prefix}_b0 AS (SELECT {cols}, {str_expr} AS s_ FROM {src}),
{prefix}_b1 AS (SELECT {cols}, hex(encode(s_)) AS hx,
                       octet_length(encode(s_)) AS n FROM {prefix}_b0),
{prefix}_b2 AS (SELECT {cols}, n,
  list_transform(range(1, CAST(n AS INT) + 1),
                 i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS UBIGINT)) AS bs,
  CASE WHEN n >= 32 THEN n // 32 ELSE 0 END AS nb FROM {prefix}_b1),
{prefix}_b3 AS (SELECT {cols}, n, bs, nb, 32 * nb AS i0,
  CASE WHEN nb > 0 THEN {block_fold} ELSE NULL END AS vacc FROM {prefix}_b2),
{prefix}_b4 AS (SELECT {cols}, n, bs, nb, i0,
  CASE WHEN nb > 0
       THEN {_merge(_merge(_merge(_merge(rot_sum, 'vacc.v1'), 'vacc.v2'), 'vacc.v3'), 'vacc.v4')}
       ELSE {_u(str(h_small))} END AS hblk FROM {prefix}_b3),
{prefix}_b5 AS (SELECT {cols}, n, bs, i0, {addmod('hblk', 'n')} AS hlen,
  (n - i0) // 8 AS e8 FROM {prefix}_b4),
{prefix}_b6 AS (SELECT {cols}, n, bs, hlen, i0, e8, i0 + 8 * e8 AS fi,
  CASE WHEN e8 > 0
       THEN list_reduce(list_prepend(hlen, {eight_lanes}),
                        (acc, x) -> {eight_step})
       ELSE hlen END AS h8w FROM {prefix}_b5),
{prefix}_b7 AS (SELECT {cols}, n, bs, h8w AS h8,
  fi, CASE WHEN n - fi >= 4 THEN fi + 4 ELSE fi END AS bstart,
  n - fi >= 4 AS has4 FROM {prefix}_b6),
{prefix}_b8 AS (SELECT {cols}, n, bs, bstart,
  CASE WHEN has4 THEN {four_step} ELSE h8 END AS h4 FROM {prefix}_b7),
{prefix}_fin AS (SELECT {cols},
  CASE WHEN bstart < n
       THEN list_reduce(
              list_prepend(h4, list_transform(range(CAST(bstart AS INT),
                                                    CAST(n AS INT)),
                                              i -> bs[i + 1])),
              (acc, x) -> {byte_step})
       ELSE h4 END AS hpre FROM {prefix}_b8),
{_fmix_ctes(prefix, 'hpre', cols, out_col)}"""


def xxh_int_ctes(prefix: str, src: str, cols: str, i_expr: str, seed_expr: str, out_col: str) -> str:
    """CTE chain for Spark's 4-byte hashInt path:
    ``hash = fmix(rotl23(((seed + P5 + 4) ^ ((i & 0xFFFFFFFF) * P1))) * P2 + P3)``.

    ``i_expr`` is the INT value (its low 32 bits are hashed — Spark
    masks with 0xFFFFFFFF, i.e. negative ints hash their two's-
    complement bits); ``seed_expr`` is a UBIGINT column/expression.
    """
    i_u32 = _u(f"({_hug(i_expr)} % 4294967296 + 4294967296) % 4294967296")
    h0 = addmod(seed_expr, str((P5 + 4) % M64))
    h1 = addmod(
        mulmod(rotl(f"xor({prefix}_h0v, {mulmod(i_u32, str(P1))})", 23), str(P2)),
        str(P3),
    )
    return (
        f"{prefix}_i0 AS (SELECT {cols}, {h0} AS {prefix}_h0v FROM {src}),\n"
        f"{prefix}_fin AS (SELECT {cols}, {h1} AS hpre FROM {prefix}_i0),\n"
        f"{_fmix_ctes(prefix, 'hpre', cols, out_col)}"
    )


def to_signed(u: str) -> str:
    """UBIGINT hash -> the signed BIGINT Spark emits."""
    return (
        f"CAST(CASE WHEN {u} >= 9223372036854775808"
        f" THEN {_hug(u)} - {M64} ELSE {_hug(u)} END AS BIGINT)"
    )


def seed_u() -> str:
    """The fixed Spark seed (42) as a UBIGINT literal expression."""
    return _u(str(SEED))
