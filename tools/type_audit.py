"""Strict type audit: Spark dtypes vs DuckDB DESCRIBE for every oracle
query, mapped to a canonical lattice. The driver's schema compare may be
type-sensitive, so width mismatches (int vs BIGINT, HUGEINT sums,
DECIMAL literals) must be caught before a round, not by it.

Usage: python tools/type_audit.py [sf_dir] [query ...]

Schema-only: Spark plans are never executed (dtypes is lazy) and DuckDB
runs DESCRIBE, so the audit covers all queries in seconds.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# canonical lattice: types mapping to the same token are driver-equal
_SPARK = {
    "bigint": "i64",
    "int": "i32",
    "smallint": "i16",
    "tinyint": "i8",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
    "binary": "bytes",
}
_DUCK = {
    "BIGINT": "i64",
    "INTEGER": "i32",
    "SMALLINT": "i16",
    "TINYINT": "i8",
    "HUGEINT": "i128",
    "UBIGINT": "u64",
    "DOUBLE": "f64",
    "FLOAT": "f32",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "tstz",
    "DATE": "date",
    "BLOB": "bytes",
}


def _canon_spark(t: str) -> str:
    t = t.strip()
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return f"list<{_canon_spark(m.group(1))}>"
    if t.startswith("decimal"):
        return "dec"
    return _SPARK.get(t, t)


def _canon_duck(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"list<{_canon_duck(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return "dec"
    return _DUCK.get(t, t)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from memfuse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdt = dict(fn(spark, sf_dir).dtypes)
        except Exception as e:
            print(f"FAIL {name}: spark plan error: {e}")
            bad += 1
            continue
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle describe error: {e}")
            bad += 1
            continue
        odt = {row[0]: row[1] for row in desc}
        mismatches = []
        for col in sdt:
            if col not in odt:
                mismatches.append(f"{col}: missing in oracle")
                continue
            a, b = _canon_spark(sdt[col]), _canon_duck(odt[col])
            if a != b:
                mismatches.append(f"{col}: spark {sdt[col]} ({a}) vs duckdb {odt[col]} ({b})")
        for col in odt:
            if col not in sdt:
                mismatches.append(f"{col}: missing in spark")
        if mismatches:
            print(f"FAIL {name}: " + "; ".join(mismatches))
            bad += 1
        else:
            print(f"PASS {name}")
    print(f"{bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
