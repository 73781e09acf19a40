"""Spark-compatible XXH64 replayed in pure DuckDB SQL.

Spark's ``xxhash64`` is the engine's fast JVM-native hash — and the one
thing that kept the xxhash64 MinHash mode (q52) off the bit-exact gate:
DuckDB has no xxhash64. This module closes that gap by generating a SQL
program that evaluates XXH64 exactly, so the oracle can replay the
whole fast-mode MinHash chain bit-for-bit.

Verified semantics: Spark's ``XXH64.java`` (decompiled from
spark-catalyst 4.1.2 bytecode) is standard XXH64 — 32-byte stripe
accumulators, 8-byte word rounds, 4-byte chunk, single-byte tail,
avalanche — with multi-argument folding ``hash_k = H(arg_k,
seed=hash_{k-1})`` from seed 42, integers hashed via the
``hashInt``/``hashLong`` closed forms. The Python model below is pinned
bit-exact against ``F.xxhash64`` in tests.

SQL mapping: state lives in UBIGINT (xor / logical shift are native);
every multiply is by a literal prime, done mod 2^64 through a 32-bit
split in HUGEINT (DuckDB integer ops trap on overflow rather than
wrap). Variable-length byte loops become recursive CTEs over
(shingle, seed) rows: one for the 32-byte stripes, one for the 8-byte
words; the <= 7-byte tail and the avalanche unroll inline through
layered subqueries. Bytes come from ``hex(encode(s))`` so multi-byte
UTF-8 is handled exactly like the JVM's UTF8String bytes.
"""

from __future__ import annotations

M64 = (1 << 64) - 1
TWO64 = 1 << 64
TWO32 = 1 << 32
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


# ---------------------------------------------------------------------------
# Python reference model (bit-exact vs F.xxhash64 — pinned in tests)
# ---------------------------------------------------------------------------


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """XXH64 of one 32-bit int (Spark's IntegerType closed form)."""
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit long (Spark's LongType closed form)."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((value & M64) * P2 & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    """XXH64 of a byte string (Spark's StringType path over UTF-8)."""
    n, pos = len(b), 0
    if n >= 32:
        v = [
            (seed + P1 + P2) & M64,
            (seed + P2) & M64,
            seed & M64,
            (seed - P1) & M64,
        ]
        while pos <= n - 32:
            for k in range(4):
                lane = int.from_bytes(b[pos + 8 * k : pos + 8 * k + 8], "little")
                v[k] = (_rotl((v[k] + lane * P2) & M64, 31) * P1) & M64
            pos += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & M64
        for vk in v:
            h ^= (_rotl((vk * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while pos <= n - 8:
        k1 = int.from_bytes(b[pos : pos + 8], "little")
        h ^= (_rotl((k1 * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        pos += 8
    if pos + 4 <= n:
        u32 = int.from_bytes(b[pos : pos + 4], "little")
        h ^= (u32 * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        pos += 4
    while pos < n:
        h ^= (b[pos] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        pos += 1
    return _fmix(h)


def to_signed(u: int) -> int:
    return u - TWO64 if u >= (1 << 63) else u


def xxhash64_int_str(i: int, s: str, seed: int = 42) -> int:
    """= Spark ``F.xxhash64(F.lit(i), F.col(s))`` (signed int64)."""
    return to_signed(hash_bytes(s.encode("utf-8"), hash_int(i, seed)))


# ---------------------------------------------------------------------------
# SQL generation
# ---------------------------------------------------------------------------


def _mul(a: str, b: int) -> str:
    """(a * b) mod 2^64 for a UBIGINT expr and a literal, via 32-bit
    split in HUGEINT (no wrap-around integer ops in DuckDB)."""
    bh, bl = b >> 32, b & (TWO32 - 1)
    return (
        f"CAST((CAST(({a}) % {TWO32} AS HUGEINT) * {bl} + "
        f"((CAST(({a}) // {TWO32} AS HUGEINT) * {bl} + "
        f"CAST(({a}) % {TWO32} AS HUGEINT) * {bh}) % {TWO32}) * {TWO32}"
        f") % {TWO64} AS UBIGINT)"
    )


def _add(a: str, b: str) -> str:
    return f"CAST((CAST(({a}) AS HUGEINT) + ({b})) % {TWO64} AS UBIGINT)"


def _rotl_sql(x: str, r: int) -> str:
    return (
        f"CAST(((CAST(({x}) AS HUGEINT) * {1 << r}) % {TWO64}"
        f" + (({x}) >> {64 - r})) % {TWO64} AS UBIGINT)"
    )


def _xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _lane(pos_expr: str, k: int) -> str:
    """Little-endian u64 from bytes b[pos + 8k + 1 .. pos + 8k + 8]
    (``b`` is a 1-based UBIGINT list column)."""
    terms = " + ".join(
        f"CAST(b[{pos_expr} + {8 * k + t + 1}] AS HUGEINT) * {1 << (8 * t)}"
        for t in range(8)
    )
    return f"CAST(({terms}) AS UBIGINT)"


def _word_round(h: str, k1: str) -> str:
    """h = rotl(h ^ (rotl(k1*P2,31)*P1), 27) * P1 + P4"""
    mixed = _mul(_rotl_sql(_mul(k1, P2), 31), P1)
    return _add(_mul(_rotl_sql(_xor(h, mixed), 27), P1), str(P4))


def sql_xxhash64_str(
    source_cte: str,
    seeds: list[int],
    out_cte: str = "xxh",
    prefix: str = "xxh",
) -> str:
    """CTE block computing Spark-exact XXH64 over strings.

    ``source_cte`` must expose ``(s VARCHAR)`` distinct strings.
    ``seeds`` are the (u64) per-hash seeds — e.g. ``hash_int(i, 42)``
    for Spark's ``xxhash64(lit(i), s)`` fold. Emits ``out_cte`` with
    rows ``(s, hi, hv)``: hash index 0..len(seeds)-1 and the SIGNED
    int64 hash, exactly ``F.xxhash64(F.lit(i), F.col(s))``.

    Paste inside a ``WITH RECURSIVE`` list. To embed TWO independent
    blocks in one statement, give each a distinct ``prefix`` (internal
    CTE names are ``{prefix}_src`` etc. and would otherwise collide).
    """
    seed_rows = ", ".join(
        f"({i}, CAST({s & M64} AS UBIGINT))" for i, s in enumerate(seeds)
    )
    # stripe accumulator init values per seed (closed forms of the seed)
    merge0 = (
        _add(
            _add(_rotl_sql("v1", 1), _rotl_sql("v2", 7)),
            _add(_rotl_sql("v3", 12), _rotl_sql("v4", 18)),
        )
    )
    def merge_step(vk: str) -> str:
        mixed = _mul(_rotl_sql(_mul(vk, P2), 31), P1)
        return _add(_mul(_xor("mh", mixed), P1), str(P4))

    m1, m2, m3, m4 = (merge_step(f"v{k}") for k in (1, 2, 3, 4))

    stripe_rounds = ", ".join(
        f"{_mul(_rotl_sql(_add(f'v{k + 1}', _mul(f'l{k}', P2)), 31), P1)} AS v{k + 1}"
        for k in range(4)
    )
    lanes = ", ".join(f"{_lane('pos', k)} AS l{k}" for k in range(4))

    c4_u32 = (
        "CAST(CAST(b[pos + 1] AS HUGEINT) + CAST(b[pos + 2] AS HUGEINT) * 256"
        " + CAST(b[pos + 3] AS HUGEINT) * 65536"
        " + CAST(b[pos + 4] AS HUGEINT) * 16777216 AS UBIGINT)"
    )
    c4_h = _add(_mul(_rotl_sql(_xor("h", _mul(c4_u32, P1)), 23), P2), str(P3))
    byte_h = _mul(_rotl_sql(_xor("h", _mul("b[pos + 1]", P5)), 11), P1)

    fmix1 = _mul("h", P2)
    fmix2 = _mul("h", P3)

    block = f"""
xxh_src AS (
  SELECT s, octet_length(encode(s)) AS n,
         list_transform(generate_series(1, octet_length(encode(s))),
           j -> CAST(('0x' || substr(hex(encode(s)), 2*j - 1, 2)) AS UBIGINT)
         ) AS b
  FROM {source_cte}
),
xxh_seeds(hi, seed) AS (VALUES {seed_rows}),
xxh_base AS (SELECT s, n, b, hi, seed FROM xxh_src CROSS JOIN xxh_seeds),
xxh_stripes(s, hi, pos, v1, v2, v3, v4) AS (
  SELECT s, hi, 0,
         {_add(_add("seed", str(P1)), str(P2))},
         {_add("seed", str(P2))},
         seed,
         {_add("seed", str(TWO64 - P1))}
  FROM xxh_base WHERE n >= 32
  UNION ALL
  SELECT s, hi, pos + 32, {stripe_rounds}
  FROM (
    SELECT r.s, r.hi, r.pos, r.v1, r.v2, r.v3, r.v4, {lanes}
    FROM xxh_stripes r JOIN xxh_src USING (s)
    WHERE r.pos <= xxh_src.n - 32
  )
),
xxh_merged AS (
  -- terminal stripe states merged; short strings start at seed + P5
  SELECT s, hi, pos, {_add("mh", "CAST(n AS HUGEINT)")} AS h FROM (
    SELECT s, hi, pos, n, {m4} AS mh FROM (
      SELECT s, hi, pos, n, v4, {m3} AS mh FROM (
        SELECT s, hi, pos, n, v3, v4, {m2} AS mh FROM (
          SELECT s, hi, pos, n, v2, v3, v4, {m1} AS mh FROM (
            SELECT r.s, r.hi, r.pos, r.v1, r.v2, r.v3, r.v4, xxh_src.n,
                   {merge0} AS mh
            FROM xxh_stripes r JOIN xxh_src USING (s)
            WHERE r.pos > xxh_src.n - 32
          )
        )
      )
    )
  )
  UNION ALL
  SELECT s, hi, 0 AS pos,
         {_add(_add("seed", str(P5)), "CAST(n AS HUGEINT)")} AS h
  FROM xxh_base WHERE n < 32
),
xxh_words(s, hi, pos, h) AS (
  SELECT s, hi, pos, h FROM xxh_merged
  UNION ALL
  SELECT s, hi, pos + 8, {_word_round("h", _lane("pos", 0))}
  FROM (
    SELECT r.s, r.hi, r.pos, r.h, xxh_src.b, xxh_src.n
    FROM xxh_words r JOIN xxh_src USING (s)
    WHERE r.pos <= xxh_src.n - 8
  )
),
xxh_tail AS (
  -- terminal word states -> optional 4-byte chunk -> up to 3 bytes
  SELECT s, hi,
         CASE WHEN pos < n THEN {byte_h} ELSE h END AS h
  FROM (
    SELECT s, hi, b, n, CASE WHEN pos < n THEN pos + 1 ELSE pos END AS pos,
           CASE WHEN pos < n THEN {byte_h} ELSE h END AS h
    FROM (
      SELECT s, hi, b, n, CASE WHEN pos < n THEN pos + 1 ELSE pos END AS pos,
             CASE WHEN pos < n THEN {byte_h} ELSE h END AS h
      FROM (
        SELECT s, hi, b, n,
               CASE WHEN pos + 4 <= n THEN pos + 4 ELSE pos END AS pos,
               CASE WHEN pos + 4 <= n THEN {c4_h} ELSE h END AS h
        FROM (
          SELECT r.s, r.hi, r.pos, r.h, xxh_src.b, xxh_src.n
          FROM xxh_words r JOIN xxh_src USING (s)
          WHERE r.pos > xxh_src.n - 8
        )
      )
    )
  )
),
{out_cte} AS (
  SELECT s, hi,
         CAST(CAST(h AS HUGEINT)
              - CASE WHEN h >= {1 << 63} THEN CAST({TWO64} AS HUGEINT)
                     ELSE 0 END AS BIGINT) AS hv
  FROM (
    SELECT s, hi, {_xor("h", "h >> 32")} AS h FROM (
      SELECT s, hi, {fmix2} AS h FROM (
        SELECT s, hi, {_xor("h", "h >> 29")} AS h FROM (
          SELECT s, hi, {fmix1} AS h FROM (
            SELECT s, hi, {_xor("h", "h >> 33")} AS h FROM xxh_tail
          )
        )
      )
    )
  )
)"""
    if prefix != "xxh":
        block = block.replace("xxh_", f"{prefix}_")
    return block


def sql_xxhash64_long_cte(
    source_cte: str,
    out_cte: str = "xxhl",
    seed: int = 42,
) -> str:
    """CTE block computing Spark-exact ``xxhash64`` of ONE int64 column
    — the closed ``hashLong`` form, no byte loops, so plain layered
    selects suffice (no recursion). ``source_cte`` must expose
    ``(v BIGINT)``; emits ``out_cte`` with ``(v, hv)`` where ``hv`` is
    the SIGNED int64 hash, exactly ``F.xxhash64(col)`` for a LongType
    column. Used to replay hash-ordered truncations (heavy-user caps,
    deterministic samples) in oracles."""
    h0 = (seed + P5 + 8) & M64
    # k1 = rotl(v * P2, 31) * P1 ; h = rotl(h0 ^ k1, 27) * P1 + P4 ; fmix
    uv = f"CAST((CAST(v AS HUGEINT) + {TWO64}) % {TWO64} AS UBIGINT)"
    k1 = _mul(_rotl_sql(_mul(uv, P2), 31), P1)
    h1 = _add(_mul(_rotl_sql(_xor(f"CAST({h0} AS UBIGINT)", "k1"), 27), P1), str(P4))
    fmix_a = _mul("h", P2)
    fmix_b = _mul("h", P3)
    return f"""
{out_cte}_k AS (SELECT v, {k1} AS k1 FROM {source_cte}),
{out_cte}_h AS (SELECT v, {h1} AS h FROM {out_cte}_k),
{out_cte} AS (
  SELECT v,
         CAST(CAST(h AS HUGEINT)
              - CASE WHEN h >= {1 << 63} THEN CAST({TWO64} AS HUGEINT)
                     ELSE 0 END AS BIGINT) AS hv
  FROM (
    SELECT v, {_xor("h", "h >> 32")} AS h FROM (
      SELECT v, {fmix_b} AS h FROM (
        SELECT v, {_xor("h", "h >> 29")} AS h FROM (
          SELECT v, {fmix_a} AS h FROM (
            SELECT v, {_xor("h", "h >> 33")} AS h FROM {out_cte}_h
          )
        )
      )
    )
  )
)"""
