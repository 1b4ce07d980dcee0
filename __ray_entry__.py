"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator catalog (sociallink_ray/queries.py)
for the driver's DuckDB correctness gate at sf0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from sociallink_ray.pipelines.align import entry_flagship

    return entry_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from sociallink_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sociallink_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
