from __future__ import annotations

import os

import pytest

from iot_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"

# Inner-loop tier (VERDICT r9 item 8): `pytest -m fast` runs the
# driver-contract guards, the physical-plan pins, and the stage-cache
# race invariants — the tests that catch "this edit broke the harness
# surface or the plan shape" — in under two minutes, instead of the
# ~16-minute full suite. Module-level marking (not per-test) so a new
# test added to a guarded module is in the tier by default; the FULL
# suite remains the gate before any commit claiming green.
_FAST_MODULES = {"test_contract", "test_plans", "test_stagecache"}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iot_etl_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def pytest_runtest_logreport(report):
    """Accumulate per-module wall time when partest asks for it
    (env PARTEST_TIMING_FILE) — the measured costs drive partest's
    LPT split, so worker balance tracks the suite's real shape
    instead of hand-maintained hints (VERDICT r12 item 5)."""
    path = os.environ.get("PARTEST_TIMING_FILE")
    if not path:
        return
    mod = report.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
    _MODULE_TIMES[mod] = _MODULE_TIMES.get(mod, 0.0) + report.duration


_MODULE_TIMES: dict = {}


def pytest_sessionfinish(session, exitstatus):
    path = os.environ.get("PARTEST_TIMING_FILE")
    if not path or not _MODULE_TIMES:
        return
    import json

    with open(path, "w") as fh:
        json.dump({k: round(v, 2) for k, v in _MODULE_TIMES.items()}, fh)
