from __future__ import annotations

import glob

import pytest

from kgpipe.fixtures.generator import materialize
from kgpipe.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgpipe-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def unit_fixture_dir() -> str:
    return materialize("unit")


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    return "/root/testdata/sf0.001"


def sfdir(sf: str) -> str:
    paths = glob.glob(f"/root/testdata/{sf}")
    assert paths, f"missing testdata {sf}"
    return paths[0]
