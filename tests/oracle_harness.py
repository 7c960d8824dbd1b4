"""Local replica of the driver's correctness gate: run a Spark builder
and its DuckDB oracle side-by-side, compare row count, column names and
values (columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # 17 significant digits = exact round-trip for IEEE doubles;
            # the determinism doctrine (integer cents / integer division
            # / identical association order) means both engines must
            # produce the SAME double, so we compare bit-exactly.
            # +0.0 collapses -0.0/+0.0.
            return f"{v + 0.0:.17g}"
        if isinstance(v, (list, tuple)):
            return tuple(norm_val(x) for x in v)
        return v

    normed = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr), [colnames[i] for i in order]


def compare(spark_df, con, sql: str, name: str = "query") -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm, cols = _normalize(spark_rows, spark_cols)
    d_norm, _ = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first 3 (cols={cols}): "
        + "; ".join(f"spark={a} duck={b}" for _, a, b in mismatches[:3])
    )
