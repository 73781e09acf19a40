"""Phase profiler: run one registry query with every public lakehouse /
uniform verb monkeypatch-timed, print a per-verb time breakdown.

Usage: python tools/phase_profile.py q412_delta_zorder_incremental [more...]

This is a measurement tool only (guide §1): it changes nothing about
what queries compute — wrappers just time the wrapped call.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC: dict[str, list] = defaultdict(lambda: [0, 0.0])  # name -> [calls, sec]
STACK: list[str] = []  # attribute nested time to the OUTERMOST verb only


def _wrap(modname: str, mod, fname: str):
    import inspect

    orig = getattr(mod, fname)
    # classes (e.g. the Python DataSource classes) must stay classes —
    # spark.dataSource.register calls classmethods on the object itself
    if (
        not callable(orig)
        or inspect.isclass(orig)
        or getattr(orig, "_pp_wrapped", False)
    ):
        return

    def timed(*a, **k):
        label = f"{modname}.{fname}"
        if STACK:  # nested verb: count the call, not the time
            ACC[label][0] += 1
            return orig(*a, **k)
        STACK.append(label)
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            STACK.pop()
            ACC[label][0] += 1
            ACC[label][1] += time.time() - t0

    timed._pp_wrapped = True  # type: ignore[attr-defined]
    setattr(mod, fname, timed)


def instrument() -> None:
    import importlib

    for modname in (
        "etl_market_survey_spark.sources.deltalog",
        "etl_market_survey_spark.sources.iceberg",
        "etl_market_survey_spark.sources.uniform",
        "etl_market_survey_spark.sources.skipindex",
        "etl_market_survey_spark.sources.pyds",
        "etl_market_survey_spark.sources.pyds_iceberg",
    ):
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        short = modname.rsplit(".", 1)[1]
        for fname in dir(mod):
            if fname.startswith("_"):
                continue
            obj = getattr(mod, fname)
            if callable(obj) and getattr(obj, "__module__", "") == modname:
                _wrap(short, mod, fname)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    instrument()
    from etl_market_survey_spark.plans import registry
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM once so the first profiled query is not paying class
    # loading (same as bench.py)
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()

    for name in sys.argv[1:]:
        ACC.clear()
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        t_build = time.time() - t0
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_mat = time.time() - t1
        total = t_build + t_mat
        print(f"\n== {name}: total {total:.2f}s "
              f"(build {t_build:.2f}s + materialize {t_mat:.2f}s)")
        accounted = 0.0
        for label, (calls, sec) in sorted(
            ACC.items(), key=lambda kv: -kv[1][1]
        ):
            star = "*" if sec else " "
            print(f"  {sec:6.2f}s {star} {calls:3d}x  {label}")
            accounted += sec
        print(f"  {t_build - accounted:6.2f}s        (query-local build work)")
        print(f"  {t_mat:6.2f}s        (final materialize)")


if __name__ == "__main__":
    main()
