"""Registry-level invariants: cheap guards that catch contract breaks at
unit-test speed, before the (slower) full oracle gate ever runs."""

from __future__ import annotations

import duckdb
import pytest

from forgottenlandapp_etl_spark.plans import ORACLE, QUERIES
from forgottenlandapp_etl_spark.plans.registry import DRIVER_WINDOW

from .conftest import TEST_SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{TEST_SF_DIR}/{t}.parquet'"
        )
    return c


def test_every_oracle_parses_in_duckdb(con):
    """EXPLAIN every oracle (parse + bind, no execution): an edit-time SQL
    typo fails here in seconds instead of mid-gate minutes later."""
    bad = []
    for name, sql in sorted(ORACLE.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad


def test_driver_window_entries_are_all_hash_checkable():
    """Every driver-window row must carry an oracle: the window is the hard
    external signal, and a rows-only entry there would waste one of the 50
    slots on a weaker check."""
    missing = [n for n in DRIVER_WINDOW if n not in ORACLE]
    assert not missing, missing


def test_driver_window_is_prefix_of_registry():
    """The driver reads the FIRST 50 registry entries; the window list must
    be exactly that prefix or the ordering contract silently broke."""
    assert tuple(list(QUERIES)[: len(DRIVER_WINDOW)]) == DRIVER_WINDOW


def test_oracled_entries_exist_in_queries():
    orphans = [n for n in ORACLE if n not in QUERIES]
    assert not orphans, orphans
