"""S6: JSON job-config loading & validation (SURVEY.md §2.1 S6).

Mirrors the reference's ``validate_parameters_and_run`` XOR dispatch
(PurpleAirDataLogger.py:217-245): exactly one of the single-sensor or
multi-sensor config shapes must be provided. Shapes per README.md of
the reference (FIXTURES.md §2.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass


class ConfigError(Exception):
    pass


SINGLE_KEYS = {"sensor_index"}
MULTI_KEYS = {"fields"}
SINGLE_OPTIONAL = {"read_key", "fields"}
MULTI_OPTIONAL = {
    "location_type",
    "read_keys",
    "show_only",
    "modified_since",
    "max_age",
    "nwlng",
    "nwlat",
    "selng",
    "selat",
}


@dataclass(frozen=True)
class JobConfig:
    mode: str  # "single" | "multi"
    params: dict


def load_config(
    multi_file: str | None = None, single_file: str | None = None
) -> JobConfig:
    """XOR-validated config load, matching the reference's dispatch."""
    if (multi_file is None) == (single_file is None):
        raise ConfigError(
            "exactly one of multi_file / single_file must be provided"
        )
    path = multi_file or single_file
    with open(path) as f:
        cfg = json.load(f)
    if single_file is not None:
        missing = SINGLE_KEYS - cfg.keys()
        mode = "single"
        allowed = SINGLE_KEYS | SINGLE_OPTIONAL
    else:
        missing = MULTI_KEYS - cfg.keys()
        mode = "multi"
        allowed = MULTI_KEYS | MULTI_OPTIONAL
    if missing:
        raise ConfigError(f"{mode} config missing required keys: {sorted(missing)}")
    unknown = cfg.keys() - allowed
    if unknown:
        raise ConfigError(f"{mode} config has unknown keys: {sorted(unknown)}")
    return JobConfig(mode=mode, params=cfg)
