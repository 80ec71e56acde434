"""Physical-plan audit helpers.

The engine's scale guarantees are *plan* properties: filters reach the
parquet scan, dimension joins broadcast, bucketed joins skip the
Exchange, top-k compiles to TakeOrderedAndProject.  These helpers make
those properties assertable in tests and inspectable in notebooks
without poking at ``_jdf`` internals everywhere.
"""

from .audit import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    has_pushed_filters,
    physical_plan,
    scale_report,
    uses_take_ordered,
)
