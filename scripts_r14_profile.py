"""Round-14 measurement harness: time individual contract rows with
the noop sink (bench.py methodology) and dump .explain("formatted")
plans for the before/after evidence in plans/r14/.

Usage:
    python scripts_r14_profile.py q18_quarterly_serve_maintained ...
    python scripts_r14_profile.py --plans ann_ivfpq_topk   # also write plan
    python scripts_r14_profile.py --tag after --plans ...  # _after.txt
    python scripts_r14_profile.py --repeat=2 ...

Timing methodology matches bench.py exactly: warmup scan + fact
materialization excluded, noop-sink forcing, host probe recorded.
Plans are captured through the documented queryExecution explainString
entry point (mode object), not PythonSQLUtils (private, fragile —
ADVICE r13).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.session import (  # noqa: E402
    get_spark,
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _plan_text(df) -> str:
    """df.explain('formatted') as a string via the documented
    queryExecution surface (jdf.queryExecution().explainString with an
    ExplainMode — the same call DataFrame.explain makes)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:]]
    write_plans = "--plans" in args
    repeat = 1
    tag = "before"
    names = []
    it = iter(args)
    for a in it:
        if a == "--plans":
            write_plans = True
        elif a == "--tag":
            tag = next(it)
        elif a.startswith("--repeat="):
            repeat = int(a.split("=")[1])
        else:
            names.append(a)

    import __spark_entry__ as entrymod

    suite = entrymod.queries()
    unknown = [n for n in names if n not in suite]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(app_name="metro-r14-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.star import (
        sales_fact,
    )

    sales_fact(spark, sf_dir).count()
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.fact_store import (
        build_fact_store,
    )

    build_fact_store(spark, sf_dir)

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        best = None
        jobs = None
        for i in range(repeat):
            grp = f"r14-{name}-{i}"
            spark.sparkContext.setJobGroup(grp, f"r14-profile: {name}")
            t0 = time.perf_counter()
            _force(suite[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            njobs = len(tracker.getJobIdsForGroup(grp))
            if best is None or dt < best:
                best, jobs = dt, njobs
            print(f"{name}: {dt}s ({njobs} jobs)", file=sys.stderr,
                  flush=True)
        out[name] = {"sec": best, "jobs": jobs}
        if write_plans:
            df = suite[name](spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(_plan_text(df))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
