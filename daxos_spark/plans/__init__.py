"""Query plans: the engine's declared query surface.

Each query is a QuerySpec: a DataFrame-API builder (the engine side) and
an equivalent ANSI-SQL string (the duckdb oracle side). The registry is
what `__spark_entry__.queries()/oracle_sql()` exposes to the driver.
"""

from .registry import ALL_SPECS, QuerySpec, get_specs
