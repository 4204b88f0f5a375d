"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
sf dir, then compares row count, schema shape, and an order-insensitive
canonical value comparison (columns sorted by name, rows sorted, floats
rounded to 9 significant-ish decimals to absorb benign last-bit drift — the
queries themselves are written to be deterministic, see SURVEY.md §2.C).

Usage:
    python tools/parity.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from sabd_deduplicator_spark import registry
from sabd_deduplicator_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            # NaN ≡ NULL: the pandas bridge already conflates them for
            # float columns on BOTH engines, and DuckDB's .df() renders a
            # NULL in a BOOLEAN/INTEGER column as float NaN while Spark's
            # toPandas gives None — treating them differently makes the
            # comparison asymmetric by dtype, not by value (fuzz finding)
            return "∅"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(df) -> tuple[list[str], list[tuple]]:
    """pandas DataFrame → (sorted col names, sorted canonical rows)."""
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def compare(name: str, spark_df, oracle_df) -> tuple[bool, str]:
    scols, srows = canonicalize(spark_df)
    ocols, orows = canonicalize(oracle_df)
    if scols != ocols:
        return False, f"columns differ: spark={scols} oracle={ocols}"
    if len(srows) != len(orows):
        return False, f"row count differs: spark={len(srows)} oracle={len(orows)}"
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        return False, f"values differ; first diffs (spark,oracle): {diffs}"
    return True, f"OK ({len(srows)} rows)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    registry.load_all_queries()
    names = args.names or sorted(registry.QUERIES)

    from sabd_deduplicator_spark.session import get_spark

    spark = get_spark("parity")
    con = duck_connect(args.sf)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in registry.ORACLES:
            print(f"SKIP {name}: rows-only (no oracle), spark rows={len(sdf)}")
            continue
        try:
            odf = con.sql(registry.ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        ok, msg = compare(name, sdf, odf)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {msg} [{time.time() - t0:.1f}s]")
        failures += 0 if ok else 1
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
