#!/usr/bin/env python
"""End-to-end pipeline CLI — the `make run && make validate` equivalent.

Reference workflow (Makefile:41-103): download/seed -> dbt run (4 models)
-> validate_anonymization.py (exit 1 on violations) -> export_pii_report.
One command here:

    python scripts/run_pipeline.py --input raw.parquet --output /data/out \
        [--schema-yml schema.yml --model stg_services] [--seed-csv seed.csv]

Reads raw data (parquet, or a CSV seed with the pinned varchar schema),
runs staging -> anonymized -> enriched -> mart with reference
materialization semantics, writes the validation gate's failing rows under
<output>/test_results, writes the PII inventory report, and exits 1 if any
violation survived — the CI contract of the reference's validation script
(validate_anonymization.py:353-374).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="raw table as parquet path")
    src.add_argument("--seed-csv", help="raw table as CSV seed (pinned schema)")
    ap.add_argument("--output", required=True, help="output root directory")
    ap.add_argument(
        "--schema-yml",
        help="dbt-shaped schema.yml with column meta policies "
        "(default: built-in reference staging policy)",
    )
    ap.add_argument(
        "--model",
        help="model name inside --schema-yml to take the policy from",
    )
    ap.add_argument("--k", type=int, default=5, help="k-anonymity threshold")
    args = ap.parse_args(argv)

    from dbt_gdpr_anonymizer_spark.operators.report import (
        export_report,
        pii_inventory,
    )
    from dbt_gdpr_anonymizer_spark.operators.validate import (
        run_validation_gate,
    )
    from dbt_gdpr_anonymizer_spark.plans.pipeline import run_pipeline
    from dbt_gdpr_anonymizer_spark.policy import (
        SERVICES_POLICY,
        policies_from_schema_yaml,
    )
    from dbt_gdpr_anonymizer_spark.session import get_spark
    from dbt_gdpr_anonymizer_spark.sources.ingest import read_seed_csv

    policy = SERVICES_POLICY
    if args.schema_yml:
        with open(args.schema_yml) as fh:
            pols = policies_from_schema_yaml(fh.read())
        if not pols:
            print("no models found in --schema-yml", file=sys.stderr)
            return 2
        name = args.model or next(iter(pols))
        if name not in pols:
            print(f"model {name!r} not in {sorted(pols)}", file=sys.stderr)
            return 2
        policy = pols[name]

    spark = get_spark("gdpr-pipeline-cli")
    raw = (
        read_seed_csv(spark, args.seed_csv)
        if args.seed_csv
        else spark.read.parquet(args.input)
    )
    layers = run_pipeline(raw, policy, output_root=args.output)
    export_report(
        pii_inventory(spark, [policy]), f"{args.output}/pii_report"
    )
    code = run_validation_gate(
        layers["enriched"],
        layers["mart"],
        k=args.k,
        failures_root=f"{args.output}/test_results",
    )
    print(f"pipeline complete: exit {code} (0 = no violations)")
    return code


if __name__ == "__main__":
    raise SystemExit(main())
