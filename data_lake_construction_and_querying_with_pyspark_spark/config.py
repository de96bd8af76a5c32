"""Job configuration — the engine's equivalent of the reference's
config/Lambda/Glue-args parameter plumbing.

The reference moves three parameters from a JSON document on S3 through a
Lambda into Glue job arguments (reference ``config/data_lake_config.json:1-5``,
``lambda_code/lambda_handler.py:21-28``, ``scripts/...pyspark.py:17``).
Locally that collapses to one dataclass loaded from a JSON file or dict
(SURVEY.md §3 E1 mapping).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


SUPPORTED_FORMATS = ("csv", "parquet", "json", "orc")


@dataclass
class JobConfig:
    """Parameters for one lake construct-and-query job run.

    Field names keep the reference's config schema (``file_type``,
    ``table_name``, ``ps_query``) so a reference user's config file loads
    unchanged; the extra fields are engine additions.
    """

    file_type: str
    table_name: str
    ps_query: str
    input_path: str = ""
    output_path: str = ""
    # Engine extensions (reference behavior when left at defaults):
    # reference flips format unconditionally (csv->parquet, parquet->csv,
    # SURVEY.md §2.8.6); "flip" reproduces that, or name a format directly.
    output_format: str = "flip"
    # Columns to partition output by (docx §8 recommends partitioned
    # datasets but the reference never does it; required at 100 TB).
    partition_by: list[str] = field(default_factory=list)
    # fillna map applied before dropna (reference order, SURVEY.md §2.8.2).
    fill_values: dict[str, str] = field(default_factory=lambda: {"Phone": "Unknown"})
    # Reference quirk §2.8.1: the temp view is registered *before* the
    # withColumn/filter transforms, so the SQL query never sees them.
    # True reproduces that; False runs the evident intent (query over the
    # transformed frame).
    reference_faithful: bool = True

    @classmethod
    def from_json(cls, path: str | Path) -> "JobConfig":
        with open(path) as f:
            raw = json.load(f)
        return cls(**raw)

    def validate(self) -> None:
        if self.file_type not in SUPPORTED_FORMATS:
            raise ValueError(
                f"Unsupported file type: {self.file_type!r}; "
                f"expected one of {SUPPORTED_FORMATS}"
            )

    def resolved_output_format(self) -> str:
        if self.output_format != "flip":
            return self.output_format
        # Reference: output = parquet if input was csv else csv
        # (scripts/...pyspark.py:118).
        return "parquet" if self.file_type == "csv" else "csv"
