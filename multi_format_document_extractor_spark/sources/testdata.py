"""Loaders for the driver-provided deterministic tables in /root/testdata.

Tables: region nation customer supplier part orders lineitem events
documents embeddings (TESTDATA.md). sf dirs: sf0.001 / sf0.01 / sf0.1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
