"""Test configuration: force JAX onto a virtual 8-device CPU mesh so that all
sharding/multi-chip code paths are exercised without TPU hardware (the driver
separately dry-runs the multi-chip path; cf. reference test strategy in
SURVEY.md §4 — the reference has no distributed tests at all, we add them)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

from pathlib import Path

import pytest


@pytest.fixture(scope="session")
def data_dir() -> Path:
    return Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def smis(data_dir) -> list[str]:
    import csv

    with open(data_dir / "smis.csv") as f:
        return [row[0] for row in csv.reader(f)][1:]
