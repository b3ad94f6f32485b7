"""Registry core for the query catalog (split out of catalog.py in
r12, VERDICT r11 #7): the Query record, the register decorator filling
the shared _REGISTRY in IMPORT order, and the table loader. catalog.py
remains the public facade — import the catalog module, not this one.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from purpleair_data_logger_spark.io import load_table
from purpleair_data_logger_spark.session import configure_existing




@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY.md §2 operator ids this exercises


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        _REGISTRY[name] = Query(name, wrapped, oracle, survey_ref)
        return wrapped

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)
