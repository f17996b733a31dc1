"""Test configuration: force JAX onto a virtual 8-device CPU mesh so that all
sharding/multi-chip code paths are exercised without TPU hardware.

Note: this environment bakes an ``axon`` TPU PJRT plugin into every Python
process via a sitecustomize on PYTHONPATH, which overrides ``JAX_PLATFORMS``.
``jax.config.update('jax_platforms', 'cpu')`` after import reliably takes
precedence; ``XLA_FLAGS`` is only read at first backend initialization, so
setting it here (before any jax op) still yields the 8 virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

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
