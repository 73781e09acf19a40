"""End-to-end maintained view: streaming CDC deltas (with retractions)
drain into a bucketed IVM partial-state table; the final view equals a
from-scratch recompute bit-for-bit, every join-form refresh ran with a
bucketed base scan and no base-side exchange, and batch replay
converges (exactly-once)."""

import random
import uuid

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.ivm import finalize, sum_partials
from etl_market_survey_spark.streaming.ivm_view import (
    ivm_refresh_writer,
    read_view,
    view_versions,
    write_stream_ivm_view,
)

_SCHEMA = "k string, x double, sign int"


def _cleanup(spark, table):
    for v in view_versions(spark, table):
        spark.sql(f"DROP TABLE IF EXISTS {table}_v{v}")


def test_maintained_view_end_to_end(spark, tmp_path):
    rng = random.Random(41)
    inserts = [(f"k{rng.randint(0, 19)}", round(rng.uniform(0, 10), 3), 1) for _ in range(600)]
    # batch 3 retracts a slice of batch 1's rows; batch 4 is a same-batch
    # UPDATE (retract old + insert new per key — net signed count 0 but
    # nonzero signed sums, the case a delta-side empty-group filter loses)
    updates = [
        p for (k, x, _) in inserts[100:120] for p in ((k, x, -1), (k, x + 1.0, 1))
    ]
    batches = [
        inserts[:200],
        inserts[200:600],
        [(k, x, -1) for k, x, _ in inserts[:50]],
        updates,
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
            str(tmp_path / "in" / f"{i}.parquet")
        )

    table = f"mv_demo_{uuid.uuid4().hex[:8]}"
    plans: list[str] = []
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    try:
        q = write_stream_ivm_view(
            stream,
            table,
            str(tmp_path / "ckpt"),
            keys=["k"],
            cols=["x"],
            n_buckets=n_buckets,
            sign_col="sign",
            plan_log=plans,
        )
        q.awaitTermination()
        # retention: only the newest `retain` (default 2) versions survive
        assert view_versions(spark, table) == [2, 3]

        got = {
            tuple(r[k] for k in sorted(r.asDict()))
            for r in read_view(spark, table, ["x"]).collect()
        }
        # from-scratch recompute over the surviving multiset
        all_rows = spark.createDataFrame(
            [r for b in batches for r in b], _SCHEMA
        )
        want = {
            tuple(r[k] for k in sorted(r.asDict()))
            for r in finalize(
                sum_partials(all_rows, ["k"], ["x"], sign=F.col("sign")).filter(
                    F.col("_n") != 0
                ),
                ["x"],
            ).collect()
        }
        assert got == want

        # every join-form refresh (batches 1-3) read the bucketed
        # base with zero exchange on its branch
        assert len(plans) == 3
        for plan in plans:
            assert "Bucketed: true" in plan, plan[:2000]
            base_branch = [
                ln for ln in plan.splitlines() if ln.lstrip().startswith(":")
            ]
            assert base_branch and not any(
                "Exchange" in ln for ln in base_branch
            ), plan[:2000]

        # exactly-once: replaying the last batch converges to the same view
        writer = ivm_refresh_writer(
            spark, table, ["k"], ["x"], n_buckets=n_buckets, sign_col="sign"
        )
        writer(spark.createDataFrame(batches[3], _SCHEMA), 3)
        got2 = {
            tuple(r[k] for k in sorted(r.asDict()))
            for r in read_view(spark, table, ["x"]).collect()
        }
        assert got2 == want
    finally:
        _cleanup(spark, table)
