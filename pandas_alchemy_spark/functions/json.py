"""JSON / nested-type bridge functions (SURVEY.md §2.9 "Spark-builtins
when we extend": ``F.to_json``/``F.from_json`` + path extraction).

The reference has no JSON surface (its engine speaks flat SQL rows);
these exist because a 100 TB corpus pipeline constantly round-trips
nested metadata (per-document provenance structs, decode stats, tool
payloads) through string columns.  All three are thin wrappers over
JVM-side Spark expressions — whole-stage codegen, no Python in the hot
path, NULL in -> NULL out — and compose with the engine's lineage so a
``json_extract`` used in a filter pushes into the plan like any other
expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def to_json(ser):
    """Serialize a nested column (struct/array/map) to JSON strings.

    ``pas.to_json(df.meta)`` — one projection, codegen.
    """
    return ser._app(F.to_json)


def from_json(ser, schema: str):
    """Parse JSON strings into a typed nested column.

    ``schema`` is a Spark DDL string (``"a INT, b STRING"`` parses to
    a struct; ``"array<double>"``, ``"map<string,string>"`` work too).
    Malformed rows become NULL (Spark PERMISSIVE mode), matching the
    engine's NaN-propagation contract.
    """
    return ser._app(lambda c: F.from_json(c, schema))


def json_extract(ser, path: str):
    """Extract one JSON path as a string column without declaring the
    full schema (Spark ``get_json_object``; path like ``"$.a.b[0]"``).

    Missing path / malformed document -> NULL.  For repeated multi-key
    extraction prefer :func:`from_json` once + struct field access —
    one parse instead of N.
    """
    return ser._app(lambda c: F.get_json_object(c, path))
