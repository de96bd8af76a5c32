"""CLI entry point — the engine's replacement for the reference's
Lambda→Glue trigger chain (SURVEY.md §3 E1): one process, one config.

    python -m data_lake_construction_and_querying_with_pyspark_spark \
        --config data_lake_config.json \
        --input people.csv --output out/

The config file keeps the reference's schema (file_type / table_name /
ps_query — reference ``config/data_lake_config.json:1-5``) so an
existing config runs unchanged; input/output paths come from flags
because locally there is no hardcoded bucket layout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_lake_construction_and_querying_with_pyspark_spark")
    ap.add_argument("--config", required=True, help="JSON job config (reference schema)")
    ap.add_argument("--input", required=True, help="input file/directory path")
    ap.add_argument("--output", default="", help="output directory (omit to skip the write)")
    ap.add_argument("--show", type=int, default=5, help="preview N result rows (0 = none)")
    args = ap.parse_args(argv)

    from data_lake_construction_and_querying_with_pyspark_spark import (
        JobConfig,
        get_spark,
        run_job,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.maintenance import preview

    cfg = JobConfig.from_json(args.config)
    cfg.input_path = args.input
    cfg.output_path = args.output

    spark = get_spark(app_name="lake_cli")
    result = run_job(spark, cfg)
    summary = {
        "total_rows": result.validation.total_rows,
        "duplicate_rows": result.validation.duplicate_rows,
        "null_counts": result.validation.null_counts,
        "result_rows": result.result_df.count(),
        "output_path": result.output_path,
        "output_format": result.output_format,
    }
    if args.show:
        print(preview(result.result_df, args.show), file=sys.stderr)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
