"""DSP kernels over PCM audio — tone detection without FFT.

Two primitives speech/audio curation uses constantly:

- **Zero-crossing rate**: sign changes between adjacent samples —
  integer-exact, the cheap voiced/unvoiced & noisiness signal.
- **Goertzel power** (Goertzel 1958): energy at ONE target frequency
  via the 2-tap recurrence ``s_n = x_n + 2cos(w) s_{n-1} - s_{n-2}``,
  power = ``s_{N-1}^2 + s_{N-2}^2 - 2cos(w) s_{N-1} s_{N-2}``. The
  DTMF/pilot-tone detector — O(N) per probed frequency vs an FFT's
  full spectrum nobody asked for.

Exactness: the recurrence is an inherently sequential float fold, so
it runs per key inside an Arrow kernel in sample order — the
Holt/CUSUM contract — and q280's oracle replays the identical fold as
a recursive CTE with the SAME ``2cos(w)`` double literal embedded in
both engines (computed once here, printed with repr).

Scale shape: one shuffle on the clip key; state is two floats per key.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def goertzel_coeff(k: int, n: int) -> float:
    """``2 cos(2 pi k / n)`` — the literal both engines share."""
    return 2.0 * math.cos(2.0 * math.pi * k / n)


def audio_tone_features(
    df: DataFrame,
    key_cols: list[str],
    sample_col: str,
    order_col: str,
    k: int,
    n: int,
) -> DataFrame:
    """Per key: ``n_samples``, ``zero_crossings`` (sign changes, zero
    counts as positive side — integer-exact), and ``goertzel_power``
    at DFT bin ``k`` of ``n`` (round 6). Input is one row per sample
    (long integers), ordered by ``order_col`` within each key."""
    coeff = goertzel_coeff(k, n)
    schema_fields = ", ".join(
        f"`{c}` {t}" for c, t in df.dtypes if c in key_cols
    )
    schema = (
        f"{schema_fields}, n_samples long, zero_crossings long, "
        f"goertzel_power double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, ignore_index=True)
        x = pdf[sample_col].to_numpy(dtype=np.int64)
        sgn = np.where(x >= 0, 1, -1)
        zc = int((sgn[1:] != sgn[:-1]).sum()) if len(x) > 1 else 0
        s1 = 0.0
        s2 = 0.0
        for v in x.tolist():  # sequential by definition
            s0 = float(v) + coeff * s1 - s2
            s2 = s1
            s1 = s0
        power = s1 * s1 + s2 * s2 - coeff * s1 * s2
        out = {c: pdf[c].iloc[0] for c in key_cols}
        out.update(
            n_samples=len(x),
            zero_crossings=zc,
            goertzel_power=round(power, 6),
        )
        return pd.DataFrame([out])

    from .groupmap import per_group_map

    return per_group_map(
        df, list(key_cols), schema, kernel, order_cols=[order_col]
    )


def sql_goertzel_cte(
    source_cte: str,
    coeff: float,
    out_cte: str = "goe",
) -> str:
    """Recursive-CTE replay of the identical fold. ``source_cte`` must
    expose ``(key VARCHAR, n BIGINT, x DOUBLE)`` with n = 0..N-1 dense;
    emits ``out_cte`` with ``(key, s1, s2, n_samples)`` at the final
    step. Paste inside WITH RECURSIVE."""
    return f"""
{out_cte}_steps AS (
  SELECT key, CAST(-1 AS BIGINT) AS n, CAST(0 AS DOUBLE) AS s1,
         CAST(0 AS DOUBLE) AS s2
  FROM (SELECT DISTINCT key FROM {source_cte})
  UNION ALL
  SELECT g.key, g.n + 1,
         src.x + {coeff!r} * g.s1 - g.s2,
         g.s1
  FROM {out_cte}_steps g
  JOIN {source_cte} src ON src.key = g.key AND src.n = g.n + 1
),
{out_cte} AS (
  SELECT key, s1, s2, n + 1 AS n_samples
  FROM (
    SELECT key, n, s1, s2,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC) AS rn
    FROM {out_cte}_steps
  ) WHERE rn = 1
)"""


def audio_filterbank_powers(
    df: DataFrame,
    key_cols: list[str],
    sample_col: str,
    order_col: str,
    bin_col: str,
    n: int,
) -> DataFrame:
    """Per (key, bin): Goertzel power at DFT bin ``bin_col`` of ``n``
    (round 6) — the multi-frequency filterbank sweep behind MFCC-style
    features. Input is one row per (key, bin, sample); the sequential
    fold runs per (key, bin) group with the group's own ``2cos(w)``
    coefficient, computed by :func:`goertzel_coeff` — the identical
    literal the SQL replay embeds per bin."""
    schema_fields = ", ".join(
        f"`{c}` {t}" for c, t in df.dtypes if c in key_cols
    )
    schema = f"{schema_fields}, `{bin_col}` int, power double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, ignore_index=True)
        k = int(pdf[bin_col].iloc[0])
        coeff = goertzel_coeff(k, n)
        s1 = 0.0
        s2 = 0.0
        for v in pdf[sample_col].to_numpy(dtype=np.int64).tolist():
            s0 = float(v) + coeff * s1 - s2
            s2 = s1
            s1 = s0
        power = s1 * s1 + s2 * s2 - coeff * s1 * s2
        out = {c: pdf[c].iloc[0] for c in key_cols}
        out[bin_col] = k
        out["power"] = round(power, 6)
        return pd.DataFrame([out])

    from .groupmap import per_group_map

    return per_group_map(
        df, [*key_cols, bin_col], schema, kernel,
        order_cols=[order_col],
    )


def sql_goertzel_multi_cte(source_cte: str, out_cte: str = "goem") -> str:
    """Recursive-CTE replay of per-key Goertzel folds whose coefficient
    varies by key: ``source_cte`` must expose
    ``(key VARCHAR, n BIGINT, x DOUBLE, coeff DOUBLE)`` with n dense
    from 0 and ``coeff`` constant within a key. Emits ``out_cte`` with
    ``(key, coeff, s1, s2, n_samples)``."""
    return f"""
{out_cte}_steps AS (
  SELECT key, coeff, CAST(-1 AS BIGINT) AS n, CAST(0 AS DOUBLE) AS s1,
         CAST(0 AS DOUBLE) AS s2
  FROM (SELECT DISTINCT key, coeff FROM {source_cte})
  UNION ALL
  SELECT g.key, g.coeff, g.n + 1,
         src.x + src.coeff * g.s1 - g.s2,
         g.s1
  FROM {out_cte}_steps g
  JOIN {source_cte} src ON src.key = g.key AND src.n = g.n + 1
),
{out_cte} AS (
  SELECT key, coeff, s1, s2, n + 1 AS n_samples
  FROM (
    SELECT key, coeff, n, s1, s2,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC) AS rn
    FROM {out_cte}_steps
  ) WHERE rn = 1
)"""
