"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each query maps one or more SURVEY.md §2 operators onto the driver's
TPC-H-ish testdata (FIXTURES.md §9 mapping: ``lineitem`` = measured-data
fact, ``orders``/``customer`` = join fabric, ``nation``/``region`` =
broadcast dims, ``events`` = timestamped table, ``documents``/
``embeddings`` = training-data tables).

Every oracle SQL string is kept semantically AND numerically in lockstep
with its Spark query: float aggregates route through exact decimal sums
(functions/stats.py) so value hashes match across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from ..sources.readers import read_parquet

    # events.parquet carries nanosecond timestamps -> ts surfaces as
    # epoch-nano long (see sources.readers.read_parquet).
    return read_parquet(spark, f"{sf_dir}/{table}.parquet")


# Import side-effect registration of all query groups.
from . import q_core  # noqa: E402,F401
from . import q_reshape_window  # noqa: E402,F401
from . import q_physics  # noqa: E402,F401
from . import q_dedup  # noqa: E402,F401
from . import q_text  # noqa: E402,F401
from . import q_resample_fit  # noqa: E402,F401
from . import q_strings  # noqa: E402,F401
from . import q_tct_compare  # noqa: E402,F401
from . import q_pipelines  # noqa: E402,F401
from . import q_temporal  # noqa: E402,F401
from . import q_rollup  # noqa: E402,F401
from . import q_misc  # noqa: E402,F401
from . import q_split_profile  # noqa: E402,F401
from . import q_streaming  # noqa: E402,F401
from . import q_decontam  # noqa: E402,F401
from . import q_tpch  # noqa: E402,F401
from . import q_ml  # noqa: E402,F401
from . import q_behavior  # noqa: E402,F401
