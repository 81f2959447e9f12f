"""Audit oracle output types for driver-canonicalizer safety.

The driver fetches oracle results through a pandas/Arrow path where DuckDB
HUGEINT (the result type of sum(BIGINT)) and DECIMAL(38,s) degrade to
float64 — rendering "6.0" where Spark renders "6" and failing the value
hash even when the values are exact. (The repo's local checker uses
fetchall(), which returns Python ints/Decimals and hides the problem.)

Rule enforced here: every compared oracle column must DESCRIBE as one of
BIGINT / INTEGER / VARCHAR / BOOLEAN / DOUBLE / DATE / TIMESTAMP*.
HUGEINT, DECIMAL, FLOAT, UHUGEINT are flagged.

Usage: python scripts/audit_oracle_types.py [sf_dir]
Exits non-zero if any oracle has a flagged column.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SAFE = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR", "BOOLEAN",
        "DOUBLE", "DATE", "TIMESTAMP")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as ent

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    bad = 0
    for name, sql in ent.oracle_sql().items():
        try:
            rows = con.execute(f"describe ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DESCRIBE ERROR {e}")
            bad += 1
            continue
        flagged = [
            (c, ty) for c, ty, *_ in rows
            if not any(ty.startswith(s) for s in SAFE)
        ]
        if flagged:
            bad += 1
            print(f"{name}: {flagged}")
    print(f"-- {bad} oracle(s) with canonicalizer-unsafe column types")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
