"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in etlray library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: CDC apply_changes replay on a deterministic
    synthetic change log over the repo-files table (BASELINE.json north
    rule)."""
    sf = "/root/testdata/sf0.001"
    # no ImportError fallback: the CDC engine is long landed, and a
    # swallowed import error would turn a broken flagship into a green
    # smoke check
    from etlray.cdc.engine import flagship_cdc_demo

    return flagship_cdc_demo(sf)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from etlray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    from etlray.queries import ORACLES

    return dict(ORACLES)
