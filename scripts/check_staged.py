"""Drive the STAGED (unregistered, r13-candidate) query/oracle pairs the
same way scripts/check_correctness.py drives the registry: Spark vs
DuckDB on the same parquet, row count + column names + order-insensitive
value hash. Usage::

    python scripts/check_staged.py [sf_dir] [query ...]

``CHECK_JSON=/path/out.json`` writes the driver-shaped artifact;
``CHECK_PANDAS=1`` switches the oracle fetch to the driver-emulating
pandas path (see check_correctness.py for why both modes matter).
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.check_correctness import TABLES, table_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from dbt_gdpr_anonymizer_spark.operators.caching import release_caches
    from dbt_gdpr_anonymizer_spark.queries import (
        STAGED_ORACLE,
        STAGED_QUERIES,
    )
    from dbt_gdpr_anonymizer_spark.session import get_spark

    spark = get_spark("staged-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    report: dict[str, dict] = {}
    npass = nfail = 0
    for name, fn in STAGED_QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            release_caches(sdf)
            sql = STAGED_ORACLE[name]
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            if os.environ.get("CHECK_PANDAS"):
                import pandas as pd

                int_cols = {
                    c
                    for c, ty, *_ in con.execute(
                        f"describe ({sql})"
                    ).fetchall()
                    if ty in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT")
                }
                res = con.execute(sql)

                def _pd_val(v, is_int):
                    if v is None or v is pd.NaT:
                        return None
                    if isinstance(v, float) and math.isnan(v):
                        return None
                    if is_int and isinstance(v, float):
                        return int(v)
                    return v.item() if hasattr(v, "item") else v

                pdf = res.fetchdf()
                is_int = [c in int_cols for c in pdf.columns]
                orows = [
                    tuple(_pd_val(v, ii) for v, ii in zip(row, is_int))
                    for row in pdf.itertuples(index=False, name=None)
                ]
            else:
                orows = res.fetchall()
            rows_match = len(srows) == len(orows)
            schema_match = sorted(scols) == sorted(ocols)
            hash_match = table_hash(scols, srows) == table_hash(
                ocols, orows
            )
            ok = rows_match and schema_match and hash_match
            report[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "err": None,
            }
            npass += ok
            nfail += not ok
            print(f"  {name}: {'PASS' if ok else 'FAIL'} ({len(srows)} rows)")
        except Exception:
            nfail += 1
            report[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": traceback.format_exc(limit=3),
            }
            print(f"  {name}: ERR")
    out = os.environ.get("CHECK_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {out}")
    print(f"\n{npass} pass, {nfail} fail")
    return 1 if nfail else 0


if __name__ == "__main__":
    raise SystemExit(main())
