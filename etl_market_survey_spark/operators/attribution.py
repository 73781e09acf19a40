"""Markov-chain marketing attribution with removal effects (Anderl et
al. 2014) — beyond reference; the model-based upgrade of q160's
first/last-touch rules.

Per user, the touch journey (time-ordered event types, cut at the first
conversion) becomes a first-order Markov chain: START -> touches ->
CONV (absorbing) or NULL (absorbing). A channel's value is its REMOVAL
EFFECT: how much the START->CONV absorption probability drops when
every transition into the channel is redirected to NULL; shares
normalize the effects.

Exactness discipline: transition probabilities are single double
divisions of integer counts; absorption probabilities come from K-step
value iteration ``v_{k+1}(s) = sum_d T(s,d) * v_k(d)`` where every
product term floors onto the 1e-12 grid and sums as exact integers —
order-free, so the (tiny, driver-side) Python iteration and the DuckDB
recursive-CTE replay agree bit-for-bit (q247). The heavy lifting —
journey construction and transition counting — is distributed; the
chain itself is |channels|+3 states and lives on the driver, exactly
like every production attribution implementation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START, CONV, NULL = "__start__", "__conv__", "__null__"
_GRID = 1e12
K_STEPS = 40


def journey_transitions(
    events: DataFrame,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    conv_type: str,
) -> DataFrame:
    """(src_state, dst_state, n) transition counts over per-user
    journeys cut at the first conversion. Distributed: one window pass
    + one groupBy."""
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    ev = events.withColumn("_rn", F.row_number().over(w))
    first_conv = (
        ev.filter(F.col(type_col) == conv_type)
        .groupBy(user_col)
        .agg(F.min("_rn").alias("_crn"))
    )
    kept = (
        ev.join(first_conv, user_col, "left")
        .filter(F.col("_crn").isNull() | (F.col("_rn") <= F.col("_crn")))
    )
    lagged = kept.withColumn("_prev", F.lag(type_col).over(w))
    steps = lagged.select(
        F.coalesce(F.col("_prev"), F.lit(START)).alias("src_state"),
        F.when(F.col(type_col) == conv_type, F.lit(CONV))
        .otherwise(F.col(type_col))
        .alias("dst_state"),
    )
    # terminal NULL edge for non-converting users
    last_rows = kept.withColumn(
        "_last", F.max("_rn").over(Window.partitionBy(user_col))
    ).filter(
        F.col("_crn").isNull() & (F.col("_rn") == F.col("_last"))
    ).select(
        F.col(type_col).alias("src_state"), F.lit(NULL).alias("dst_state")
    )
    return (
        steps.unionByName(last_rows)
        .groupBy("src_state", "dst_state")
        .agg(F.count("*").alias("n"))
    )


def _value_iteration(trans: dict, states: set, k_steps: int) -> float:
    """P(absorb in CONV from START) after k steps, on the exact 1e-12
    floor grid (order-free integer sums — the SQL replay is identical)."""
    v = {s: (1.0 if s == CONV else 0.0) for s in states}
    out_edges: dict = {}
    for (s, d), p in trans.items():
        out_edges.setdefault(s, []).append((d, p))
    out_edges.setdefault(CONV, [(CONV, 1.0)])
    out_edges.setdefault(NULL, [(NULL, 1.0)])
    for _ in range(k_steps):
        nv = {}
        for s in states:
            total = 0
            for d, p in out_edges.get(s, []):
                total += math.floor(p * v[d] * _GRID)
            nv[s] = total / _GRID
        v = nv
    return v.get(START, 0.0)


def markov_attribution(
    events: DataFrame,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    conv_type: str,
    k_steps: int = K_STEPS,
) -> DataFrame:
    """One row per channel: ``(channel, base_p, removed_p,
    removal_effect, share)`` — all round-9 doubles."""
    spark = events.sparkSession
    counts = {
        (r["src_state"], r["dst_state"]): r["n"]
        for r in journey_transitions(
            events, user_col, order_cols, type_col, conv_type
        ).collect()
    }
    totals: dict = {}
    for (s, _), n in counts.items():
        totals[s] = totals.get(s, 0) + n
    base_trans = {
        (s, d): n / totals[s] for (s, d), n in counts.items()
    }
    states = {s for s, _ in counts} | {d for _, d in counts} | {CONV, NULL}
    # absorbing self-loops
    base_trans[(CONV, CONV)] = 1.0
    base_trans[(NULL, NULL)] = 1.0
    base_p = _value_iteration(base_trans, states, k_steps)

    channels = sorted(states - {START, CONV, NULL})
    rows = []
    for c in channels:
        rm: dict = {}
        for (s, d), p in base_trans.items():
            if s == c:
                continue  # channel unreachable; drop its outgoing edges
            rm[(s, NULL if d == c else d)] = (
                rm.get((s, NULL if d == c else d), 0.0) + p
            )
        removed_p = _value_iteration(rm, states - {c}, k_steps)
        rows.append((c, base_p, removed_p, base_p - removed_p))
    # shares from 1e-9-grid integers — no decimal ROUND anywhere, so
    # Python and SQL cannot disagree on tie-breaking: every emitted
    # value is either a raw grid double or a ratio of exact integers
    tot_eff = sum(math.floor(eff * 1e9) for _, _, _, eff in rows) or 1
    out = [
        (c, bp, rp, eff, math.floor(eff * 1e9) / tot_eff)
        for c, bp, rp, eff in rows
    ]
    return spark.createDataFrame(
        out,
        "channel string, base_p double, removed_p double, "
        "removal_effect double, share double",
    )
