"""Standalone driver simulation (see .claude/skills/verify/SKILL.md).

Imports ``__spark_entry__.py`` the way the external correctness driver
does (spec_from_file_location, plain local[8] session, foreign CWD),
runs ``entry`` + every ``queries()`` entry at sf0.01, and compares each
against its ``oracle_sql()`` twin in DuckDB: sorted column names, row
count, declared type classes (the driver's value hash is
type-sensitive), and an order-insensitive value multiset with floats
rounded to 6dp. Keep this loop semantically identical to
``tests/test_oracle.py::test_oracle_match``.

Usage:  cd /tmp && python /root/repo/scripts/drive_contract.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import math
import sys
import time

import duckdb

REPO = "/root/repo"
TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _spark_type_class(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith("array"):
        return "array"
    if dt == "boolean":
        return "bool"
    if dt == "string":
        return "str"
    return dt


def _duck_type_class(t: str) -> str:
    s = t.upper()
    if s.startswith("DECIMAL") or s == "HUGEINT":
        return "decimal"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.endswith("[]") or s.startswith("LIST"):
        return "array"
    if s == "BOOLEAN":
        return "bool"
    if s in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if s == "DATE":
        return "date"
    return s.lower()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6) + 0.0
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    only = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drive_contract")
        .getOrCreate()
    )
    entry_mod = _load_entry()

    if not only:
        t0 = time.time()
        n = entry_mod.entry(spark).count()
        print(f"entry(): {n} rows  [{time.time() - t0:.1f}s]")
        assert n >= 0

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:  # --only=substr (repeatable): fast single-query iteration
        queries = {
            k: v for k, v in queries.items() if any(s in k for s in only)
        }
    print(f"{len(queries)} queries, {len(oracles)} oracles, sf={sf_dir}")

    failures = []
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"[{i + 1:3d}] {name}: SPARK ERROR {exc}")
            continue
        if name not in oracles:
            print(f"[{i + 1:3d}] {name}: rows-only {len(spark_rows)} rows "
                  f"[{time.time() - t0:.1f}s]")
            continue
        spark_types = {c: _spark_type_class(t) for c, t in sdf.dtypes}
        con = _duck(sf_dir)
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            duck_schema = con.execute(
                f"DESCRIBE SELECT * FROM ({oracles[name]})"
            ).fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle error: {exc}"))
            print(f"[{i + 1:3d}] {name}: ORACLE ERROR {exc}")
            con.close()
            continue
        con.close()
        duck_types = {row[0]: _duck_type_class(row[1]) for row in duck_schema}

        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        else:
            tdiff = {c: (spark_types[c], duck_types[c])
                     for c in spark_cols if spark_types[c] != duck_types[c]}
            if tdiff:
                problems.append(f"type-class {tdiff}")
        if len(spark_rows) != len(duck_rows):
            problems.append(
                f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            s_can, d_can = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
            bad = [(a, b) for a, b in zip(s_can, d_can) if a != b]
            if bad:
                problems.append(f"values {bad[:3]}")
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"[{i + 1:3d}] {name}: {status} ({len(spark_rows)} rows) "
              f"[{time.time() - t0:.1f}s]")
        if problems:
            failures.append((name, "; ".join(problems)))

    print(f"\n{'=' * 60}\n{len(queries) - len(failures)}/{len(queries)} green")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
