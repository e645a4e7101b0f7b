"""Local mimic of the driver's t2 gate: run each __spark_entry__ query in
Spark AND its oracle_sql in DuckDB at a given sf, compare row count,
column names, and order-insensitive values.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def _norm_cell(v):
    import datetime

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    import duckdb

    from tools.runlock import acquire_run_lock

    import __spark_entry__ as entrymod
    from memfuse_spark.session import get_spark

    _lock = acquire_run_lock("verify_oracle")  # noqa: F841 — held to exit

    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args = [a for a in args if a != "--vanilla"]
    window = "--window" in args
    if window:
        args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if window:  # the driver's t2 gate: the FIRST 50 declared queries
        only = set(list(entrymod.queries())[:50])

    if vanilla:
        # Replicate the driver's environment: an untuned session created
        # FIRST so getOrCreate() returns it everywhere (exercises the
        # runtime-conf fallbacks in catalog.py, e.g. nanosAsLong) + the
        # entry() smoke with schema-stability check. The round-start
        # rotation recipe is now one command:
        #   python tools/verify_oracle.py --vanilla --window <sf_dir>
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        r1 = entrymod.entry(spark)
        s1, n1 = r1.schema, r1.count()
        s2 = entrymod.entry(spark).schema
        print(f"ENTRY rows={n1} schema_stable={s1 == s2}")
    else:
        spark = get_spark("verify-oracle")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok? {name}: rows-only check, {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            failures += 1
            continue
        a, b = _canon(srows, scols), _canon(orows, ocols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            failures += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
