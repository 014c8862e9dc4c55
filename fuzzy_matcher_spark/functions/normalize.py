"""Normalization expressions — pure Spark built-ins (whole-stage codegen).

Reference semantics:
- ``NormalizeField`` = lowercase then delete ``[^a-zA-Z0-9]+``
  (/root/reference/fuzzy_matcher_core/normalize.go:9-15). Idempotent;
  applied at build, probe, and verification time
  (fuzzy_matcher_core.go:77,126,236-237).
- Field extraction lowercases + trims
  (fuzzy_classes/example_source.go:106-107); timestamps are formatted
  ``yyyyMMdd`` (example_source.go:108).
- Validation gate: non-empty names and avg(len(first), len(sur)) > 3.5
  (fuzzy_classes/example_source.go:84-101).

The graft invariant (BASELINE.json input_hint) — byte-identical
extracted ``text`` per url — holds because normalization only ever
produces *derived* columns; the source column is never overwritten.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_col(col: Column | str) -> Column:
    """lower + strip non-alphanumerics (normalize.go:9-15)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[^a-zA-Z0-9]+", "")


def date_key_col(col: Column | str) -> Column:
    """Timestamp -> yyyyMMdd match key (example_source.go:108)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd")


def is_valid_name_col(first: Column | str, sur: Column | str) -> Column:
    """ValidateEntry (example_source.go:84-101): both non-empty after
    trim/lower and average length > 3.5. Length is measured on the
    trimmed+lowered value (pre-normalization), as in the reference."""
    f = F.lower(F.trim(F.col(first) if isinstance(first, str) else first))
    s = F.lower(F.trim(F.col(sur) if isinstance(sur, str) else sur))
    return (
        (F.length(f) > 0)
        & (F.length(s) > 0)
        & (((F.length(f) + F.length(s)) / F.lit(2.0)) > F.lit(3.5))
    )
