"""PySpark-native data-lake construction & querying engine.

A clean-room, Spark-first re-expression of the capabilities of the
reference repo ``rdinesh808/Data_Lake_Construction_and_Querying_With_PySpark``
(surveyed in SURVEY.md): multi-format lake ingest, validation, cleaning,
cataloging, SQL querying, and format conversion — extended with the
operators a 100 TB training-data pipeline needs (dedup, similarity
search, text analysis, multimodal columns, streaming).

Everything is the DataFrame/SQL API: Catalyst plans the physical
execution; no RDDs, no driver-side loops, no row-at-a-time Python UDFs
in any hot path.
"""

from data_lake_construction_and_querying_with_pyspark_spark.config import JobConfig
from data_lake_construction_and_querying_with_pyspark_spark.session import get_spark
from data_lake_construction_and_querying_with_pyspark_spark.pipeline import run_job

__all__ = ["JobConfig", "get_spark", "run_job"]
__version__ = "0.1.0"
