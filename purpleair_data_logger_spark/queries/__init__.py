"""Query-family modules (split from catalog.py in r12). Import
purpleair_data_logger_spark.catalog — the facade — not these
modules directly; registration order is defined by catalog.py's
import sequence."""
