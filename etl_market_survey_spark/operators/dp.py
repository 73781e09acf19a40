"""Differentially-private aggregate release — noisy GROUP BY counts and
clipped sums under the Laplace mechanism, as a distributed operator.

The privacy family's release stage (k-anonymity / l-diversity in
``anonymity.py`` audit a dataset; this RELEASES statistics from one):
per-group COUNT and per-group SUM of values clipped to a public bound,
each perturbed with Laplace noise calibrated to its sensitivity —
count sensitivity 1, clipped-sum sensitivity ``max(|lo|, |hi|)`` — with
the epsilon budget split evenly across the released statistics
(sequential composition; groups are disjoint, so across groups the
release composes in parallel and needs no further split).

Key-domain hygiene: releasing only the group keys PRESENT in the data
leaks membership (a key appears iff someone contributed it). Pass
``key_domain`` — a public frame of group keys — and every domain key is
released, absent groups included (their row is pure noise around zero).
Without it the keys come from the data; callers own that caveat.

Determinism (the engineering trade, stated honestly): noise draws are a
pure function of ``(seed, statistic, group key)`` through the portable
md5 -> uniform -> inverse-CDF chain the sampling operators already use,
so a release is reproducible run-to-run, partition-layout-independent,
and exactly replayable in SQL (``sql_laplace``) — the property every
other operator here is held to. The DP guarantee then holds against
adversaries who don't know the seed: protecting the seed (and releasing
each statistic once) is the deployment's job, exactly as with any
seeded-PRNG DP implementation.

Scale shape: one hash-aggregate over the fact (map-side combine; exact
integer-scaled sums via ``functions.stats.dsum`` so no float-order
drift), optionally one broadcast join onto the tiny public key domain,
then per-row noise arithmetic. No window, no second shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import dsum, sql_dsum

_U_SCALE = float(16**13)  # 13 hex digits -> exact double in [0,1)


def _u01(key: Column, stat: str, seed: int) -> Column:
    """Deterministic uniform in (0,1) from (seed, stat, group key)."""
    h = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), F.lit(stat), key))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(_U_SCALE)


def laplace_noise(key: Column, stat: str, scale: float, seed: int) -> Column:
    """Laplace(0, scale) by inverse CDF on the deterministic uniform,
    rounded to 6 decimals so cross-engine libm ln() last-ulp differences
    cannot change a released value."""
    t = _u01(key, stat, seed) - F.lit(0.5)
    return F.round(
        -F.lit(float(scale)) * F.signum(t) * F.log(F.lit(1.0) - 2.0 * F.abs(t)),
        6,
    )


def sql_laplace(key_expr: str, stat: str, scale: float, seed: int) -> str:
    """DuckDB mirror of :func:`laplace_noise` — keep in lockstep.
    ``key_expr`` must be a VARCHAR expression matching the Spark-side
    group key (cast + concat_ws with chr(31))."""
    h = f"md5(concat_ws(chr(31), '{seed}', '{stat}', {key_expr}))"
    u = f"((CAST(concat('0x', substr({h}, 1, 13)) AS BIGINT) + 0.5) / {_U_SCALE!r})"
    t = f"({u} - 0.5)"
    return (
        f"ROUND(-({float(scale)!r}) * SIGN({t}) * LN(1.0 - 2.0 * ABS({t})), 6)"
    )


def _group_key(group_cols: Sequence[str]) -> Column:
    return F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in group_cols]
    )


def sql_group_key(group_exprs: Sequence[str]) -> str:
    parts = ", ".join(f"CAST({e} AS VARCHAR)" for e in group_exprs)
    return f"concat_ws(chr(31), {parts})"


def dp_release(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    epsilon: float,
    sums: dict[str, tuple[float, float]] | None = None,
    count: bool = True,
    key_domain: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """Release per-group noisy statistics under (epsilon)-DP.

    ``sums``: value column -> public clip bounds ``(lo, hi)``; each
    value is clamped before the exact-decimal sum, so one row moves a
    sum by at most ``max(|lo|, |hi|)`` (its Laplace scale). ``count``
    releases the group size (sensitivity 1). The budget splits evenly
    over the released statistics.

    Output: ``group_cols`` + ``noisy_count`` (if ``count``) +
    ``noisy_sum_<col>`` per entry in ``sums`` — doubles, 6 decimals.
    True counts/sums are NOT in the output.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    sums = sums or {}
    n_stats = int(bool(count)) + len(sums)
    if n_stats == 0:
        raise ValueError("nothing to release: count=False and no sums")
    eps_each = epsilon / n_stats
    gcols = list(group_cols)

    aggs = []
    if count:
        aggs.append(F.count(F.lit(1)).cast("double").alias("_n"))
    for c, (lo, hi) in sums.items():
        if not lo < hi:
            raise ValueError(f"clip bounds for {c} must satisfy lo < hi")
        clipped = F.least(
            F.greatest(F.col(c).cast("double"), F.lit(float(lo))),
            F.lit(float(hi)),
        )
        aggs.append(dsum(clipped).alias(f"_s_{c}"))
    agg = df.groupBy(*gcols).agg(*aggs)

    if key_domain is not None:
        if sorted(key_domain.columns) != sorted(gcols):
            raise ValueError(
                "key_domain must have exactly the group columns"
            )
        # public domain drives the released keys: absent groups join as
        # null aggregates and release pure noise around zero
        agg = F.broadcast(key_domain.dropDuplicates(gcols)).join(
            agg, on=gcols, how="left"
        )

    key = _group_key(gcols)
    out_cols: list[Column] = [F.col(c) for c in gcols]
    if count:
        out_cols.append(
            F.round(
                F.coalesce(F.col("_n"), F.lit(0.0))
                + laplace_noise(key, "count", 1.0 / eps_each, seed),
                6,
            ).alias("noisy_count")
        )
    for c, (lo, hi) in sums.items():
        sens = max(abs(float(lo)), abs(float(hi)))
        out_cols.append(
            F.round(
                F.coalesce(F.col(f"_s_{c}"), F.lit(0.0))
                + laplace_noise(key, f"sum_{c}", sens / eps_each, seed),
                6,
            ).alias(f"noisy_sum_{c}")
        )
    return agg.select(*out_cols)


def sql_dp_release(
    table_expr: str,
    group_exprs: Sequence[str],
    *,
    epsilon: float,
    sums: dict[str, tuple[float, float]] | None = None,
    count: bool = True,
    domain_expr: str | None = None,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`dp_release` (same budget split, same
    noise chain). ``group_exprs`` are output column names in the source;
    ``domain_expr`` an optional subquery/CTE name with the public keys."""
    sums = sums or {}
    n_stats = int(bool(count)) + len(sums)
    eps_each = epsilon / n_stats
    gl = ", ".join(group_exprs)
    aggs = []
    if count:
        aggs.append("CAST(COUNT(*) AS DOUBLE) AS _n")
    for c, (lo, hi) in sums.items():
        clip = (
            f"LEAST(GREATEST(CAST({c} AS DOUBLE), {float(lo)!r}), {float(hi)!r})"
        )
        aggs.append(f"{sql_dsum(clip)} AS _s_{c}")
    base = f"SELECT {gl}, {', '.join(aggs)} FROM {table_expr} GROUP BY {gl}"
    if domain_expr is not None:
        base = (
            f"SELECT d.*, a._n{''.join(f', a._s_{c}' for c in sums)} "
            f"FROM (SELECT DISTINCT {gl} FROM {domain_expr}) d "
            f"LEFT JOIN ({base}) a USING ({gl})"
        )
    key = sql_group_key(group_exprs)
    outs = [gl]
    if count:
        noise = sql_laplace(key, "count", 1.0 / eps_each, seed)
        outs.append(f"ROUND(COALESCE(_n, 0.0) + {noise}, 6) AS noisy_count")
    for c, (lo, hi) in sums.items():
        sens = max(abs(float(lo)), abs(float(hi)))
        noise = sql_laplace(key, f"sum_{c}", sens / eps_each, seed)
        outs.append(
            f"ROUND(COALESCE(_s_{c}, 0.0) + {noise}, 6) AS noisy_sum_{c}"
        )
    return f"SELECT {', '.join(outs)} FROM ({base})"


def dp_quantile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    q: float,
    *,
    epsilon: float,
    lo: float,
    hi: float,
    m: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Per-group quantile release under the EXPONENTIAL MECHANISM
    (McSherry & Talwar 2007; the discrete quantile form of Smith 2011):
    candidates are the PUBLIC grid ``lo + k*(hi-lo)/m`` (k = 0..m —
    data-independent, so the candidate set itself leaks nothing),
    utility ``u(c) = -|#(x <= c) - q*n|`` (sensitivity 1: one row moves
    any count by at most 1), and a candidate is drawn with probability
    proportional to ``exp(epsilon * u / 2)``.

    Determinism (the engineering contract of this module): weights are
    rounded to 9 decimals (the libm exp rule), the cumulative sum runs
    in candidate order — the identical IEEE fold both engines execute —
    and the draw is the seeded md5 uniform, so a release replays
    bit-for-bit in SQL (:func:`sql_dp_quantile`).

    Scale shape: one clip+bucket projection, one (group, bucket) count
    with map-side combine, one broadcast-sized candidate fan-out
    (m+1 rows per group), two ordered windows over m+1 rows per group.
    The fact table is scanned once and never re-shuffled.

    Output: ``group_cols`` + ``dp_q`` (the selected grid value, double).
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if not lo < hi:
        raise ValueError("need lo < hi")
    if m < 1:
        raise ValueError("need m >= 1")
    from pyspark.sql.window import Window

    gcols = list(group_cols)
    width = (float(hi) - float(lo)) / m
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(float(lo))),
        F.lit(float(hi)),
    )
    # bucket of x = smallest candidate index k with x <= c_k, i.e.
    # ceil((x - lo) / width), clamped into 0..m
    bidx = F.least(
        F.greatest(
            F.ceil((clipped - F.lit(float(lo))) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(m),
    )
    bcounts = df.groupBy(*gcols, bidx.alias("_b")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    cand = (
        bcounts.groupBy(*gcols)
        .agg(F.sum("_c").alias("_n"))
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(m))))
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("_k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        cand.join(
            bcounts.withColumnRenamed("_b", "_k"), [*gcols, "_k"], "left"
        )
        .withColumn("_cum", F.sum(F.coalesce(F.col("_c"), F.lit(0))).over(w_cum))
        .withColumn(
            "_w",
            F.round(
                F.exp(
                    F.lit(float(epsilon) / 2.0)
                    * -F.abs(
                        F.col("_cum").cast("double")
                        - F.lit(float(q)) * F.col("_n").cast("double")
                    )
                ),
                9,
            ),
        )
        .withColumn("_cw", F.sum("_w").over(w_cum))
    )
    key = _group_key(gcols)
    total = Window.partitionBy(*gcols)
    picked = (
        scored.withColumn("_tot", F.max("_cw").over(total))
        .withColumn("_u", _u01(key, f"quantile_{value_col}", seed))
        .filter(F.col("_cw") >= F.col("_u") * F.col("_tot"))
        .groupBy(*gcols)
        .agg(F.min("_k").alias("_sel"))
    )
    return picked.select(
        *gcols,
        F.round(F.lit(float(lo)) + F.col("_sel") * F.lit(width), 9).alias(
            "dp_q"
        ),
    )


def sql_dp_quantile(
    table_expr: str,
    group_exprs: Sequence[str],
    value_expr: str,
    q: float,
    *,
    epsilon: float,
    lo: float,
    hi: float,
    m: int = 64,
    seed: int = 42,
    value_name: str = "dp_q",
) -> str:
    """DuckDB mirror of :func:`dp_quantile` — keep in lockstep."""
    gl = ", ".join(group_exprs)
    width = (float(hi) - float(lo)) / m
    clip = (
        f"LEAST(GREATEST(CAST({value_expr} AS DOUBLE), {float(lo)!r}), "
        f"{float(hi)!r})"
    )
    bidx = (
        f"LEAST(GREATEST(CAST(CEIL(({clip} - {float(lo)!r}) / {width!r}) "
        f"AS BIGINT), 0), {m})"
    )
    key = sql_group_key(group_exprs)
    h = f"md5(concat_ws(chr(31), '{seed}', 'quantile_{value_expr}', {key}))"
    uu = (
        f"((CAST(concat('0x', substr({h}, 1, 13)) AS BIGINT) + 0.5) / "
        f"{_U_SCALE!r})"
    )
    return f"""
WITH bc AS (
  SELECT {gl}, {bidx} AS k, COUNT(*) AS c FROM {table_expr} GROUP BY ALL
),
ns AS (SELECT {gl}, SUM(c) AS n FROM bc GROUP BY ALL),
cand AS (
  SELECT ns.*, k.k FROM ns CROSS JOIN (
    SELECT unnest(range(0, {m + 1})) AS k
  ) k
),
scored AS (
  SELECT cand.*, SUM(COALESCE(bc.c, 0)) OVER (
           PARTITION BY {gl} ORDER BY k
         ) AS cum
  FROM cand LEFT JOIN bc USING ({gl}, k)
),
weighted AS (
  SELECT *, ROUND(EXP({float(epsilon) / 2.0!r}
             * -ABS(CAST(cum AS DOUBLE) - {float(q)!r} * CAST(n AS DOUBLE))),
           9) AS w
  FROM scored
),
cw AS (
  SELECT *, SUM(w) OVER (PARTITION BY {gl} ORDER BY k) AS cumw,
         SUM(w) OVER (PARTITION BY {gl}) AS tot
  FROM weighted
)
SELECT {gl},
       ROUND({float(lo)!r} + MIN(k) * {width!r}, 9) AS {value_name}
FROM cw
WHERE cumw >= {uu} * tot
GROUP BY ALL
"""
