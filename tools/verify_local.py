"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB, compare row-count + sorted-
column value content. Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        try:
            if str(pdf[c].dtype).startswith(("float", "Float")):
                pdf[c] = pdf[c].round(9)
            if "datetime" in str(pdf[c].dtype):
                pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
            if str(pdf[c].dtype).startswith(("int", "Int", "uint")):
                pdf[c] = pdf[c].astype("int64")
        except Exception:
            pass
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from datacollector_spark.session import get_spark

    spark = get_spark("verify-local", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails, okays, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[SPARK-ERROR] {name}")
            traceback.print_exc(limit=4)
            fails.append(name)
            continue
        if name not in oracles:
            weak.append(name)
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception:
            print(f"[ORACLE-ERROR] {name}")
            traceback.print_exc(limit=4)
            fails.append(name)
            continue
        g, e = normalize(got), normalize(exp)
        if len(g) != len(e):
            print(f"[ROWS-MISMATCH] {name}: spark={len(g)} duckdb={len(e)}")
            fails.append(name)
            continue
        if list(g.columns) != list(e.columns):
            print(f"[SCHEMA-MISMATCH] {name}: {list(g.columns)} vs {list(e.columns)}")
            fails.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-6, rtol=1e-6)
            okays.append(name)
            print(f"[OK] {name}: {len(g)} rows")
        except AssertionError as ex:
            print(f"[VALUE-MISMATCH] {name}: {str(ex).splitlines()[-1][:200]}")
            diff = g.compare(e) if g.shape == e.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
            fails.append(name)

    print(f"\n{len(okays)} ok, {len(weak)} rows-only, {len(fails)} FAILED: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
