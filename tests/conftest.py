from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from fs_indexer_elasticsearch_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "race: concurrency/race tests — repeatable via --repeat-races N "
        "(gate.py runs them N≥10 times so a nondeterministic winner "
        "can't sneak a flaky pass into a committed green gate)",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--repeat-races",
        type=int,
        default=1,
        help="run each @pytest.mark.race test this many times in one "
        "session (one SparkSession, N executions per test)",
    )


def pytest_generate_tests(metafunc):
    n = metafunc.config.getoption("--repeat-races")
    if n > 1 and any(
        m.name == "race" for m in metafunc.definition.iter_markers()
    ):
        metafunc.fixturenames.append("_race_rep")
        metafunc.parametrize("_race_rep", range(n))


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
