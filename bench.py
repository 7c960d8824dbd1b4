"""Benchmark harness: runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "olap_suite", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full computation,
no driver collect skew). Spark/JVM startup and a single warmup scan
are excluded from per-query timings.
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
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.queries import (
        OLAP_QUERIES,
    )

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="metro-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + parquet footer reads, excluded from timings.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    suite = entrymod.queries()
    timings: dict[str, float] = {}
    for name in sorted(suite):
        t0 = time.perf_counter()
        _force(suite[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "olap_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
