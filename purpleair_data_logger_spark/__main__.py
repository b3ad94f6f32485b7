"""Executable entry point — the reference's logger CLI, Spark-native.

Reference UX (e.g. ``python PurpleAirPSQLDataLogger.py -db_usr ...
-paa_read_key K -paa_multiple_sensor_request_json_file cfg.json``,
reference PurpleAirPSQLDataLogger.py:350-413) becomes:

    python -m purpleair_data_logger_spark \
        --store /data/purpleair \
        --api-key $KEY \
        --multi-config cfg.json [--single-config cfg.json] \
        [--interval 65] [--iterations N] [--fixture payload.json] \
        [--drop-all]

The config JSON shapes are the reference's own (FIXTURES.md §2.3).
``--fixture`` substitutes a recorded payload for the live API
(offline/demo mode). ``--drop-all`` is the destructive reset, gated on
interactive confirmation exactly like the reference
(PurpleAirPSQLDataLogger.py:393-405).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="purpleair_data_logger_spark")
    p.add_argument("--store", required=True, help="parquet store root path")
    p.add_argument("--api-key", default="", help="PurpleAir API read key")
    p.add_argument("--multi-config", help="multi-sensor request JSON config")
    p.add_argument("--single-config", help="single-sensor request JSON config")
    p.add_argument("--interval", type=int, default=65, help="poll seconds (floor 60)")
    p.add_argument("--iterations", type=int, default=None, help="stop after N polls")
    p.add_argument("--fixture", help="recorded payload JSON instead of live API")
    p.add_argument("--drop-all", action="store_true", help="drop all nine tables first")
    args = p.parse_args(argv)

    from purpleair_data_logger_spark.session import get_spark
    from purpleair_data_logger_spark.sinks.tables import SensorTableStore
    from purpleair_data_logger_spark.sources.config import load_config
    from purpleair_data_logger_spark.sources.purpleair_api import (
        PurpleAirSource,
        default_transport,
    )
    from purpleair_data_logger_spark.streaming.poll import PollLoop

    cfg = load_config(multi_file=args.multi_config, single_file=args.single_config)

    spark = get_spark("purpleair-logger")
    store = SensorTableStore(spark, args.store)

    if args.drop_all:
        answer = input("Drop ALL nine tables? Type 'yes' to confirm: ")
        if answer.strip().lower() == "yes":
            store.drop_all(confirm=True)
            print("Dropped all tables.")
        else:
            print("Aborted drop; continuing without reset.")

    if args.fixture:
        with open(args.fixture) as f:
            payload = json.load(f)
        transport = lambda req: (200, payload)  # noqa: E731
    else:
        transport = default_transport

    source = PurpleAirSource(spark, args.api_key, transport=transport)
    if not args.fixture:
        source.check_api_key()

    loop = PollLoop(source, store, interval_seconds=args.interval)
    if cfg.mode == "single":
        done = loop.run(
            mode="single",
            iterations=args.iterations,
            sensor_index=cfg.params["sensor_index"],
            read_key=cfg.params.get("read_key"),
            fields=cfg.params.get("fields"),
        )
    else:
        done = loop.run(
            mode="multi",
            iterations=args.iterations,
            fields=cfg.params["fields"],
            **{
                k: v
                for k, v in cfg.params.items()
                if k != "fields" and v is not None
            },
        )
    print(f"completed {done} poll batch(es); store at {args.store}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
