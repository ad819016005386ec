"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship events pipeline on sf0.001;
``queries()``/``oracle_sql()`` pair each implemented operator with a
DuckDB oracle (see the pycatcher_ray/queries/ package).  Ray is initialised by the
driver before this module is imported — nothing here calls ray.init().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: events → cascaded
    1m/1h rollup → actor-pool anomaly scan → flag rows."""
    from pycatcher_ray.queries import tokens_flags_1h

    return tokens_flags_1h("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pycatcher_ray.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from pycatcher_ray.queries import oracles as _o

    return _o()
