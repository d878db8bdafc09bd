"""Deterministic md5-prefix flag predicates — the engine's ONE source for
every "hash this id into a fixed fraction" split.

Every deterministic split in the engine (similarity's 1/8 query sets, the
dedup ingest split, train/val/test assignment, snapshot membership) is the
same idiom: first hex nibble of md5('<tag>#' || id) compared to a
threshold. Each oracle must mirror its predicate character-for-character
(``substr(md5('<tag>#' || CAST(id AS VARCHAR)), 1, 1) < '<threshold>'``),
so the Python side is single-sourced here — a one-character drift between
a tier and its evaluation harness would silently produce a
plausible-but-wrong metric (the _hash_split lesson, now applied
engine-wide)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_flag(id_col: Column | str, tag: str, threshold: str = "2") -> Column:
    """True iff the first md5 hex nibble of ``'<tag>#' || id`` is below
    ``threshold``: '2' selects ~1/8, 'e' ~7/8, 'c' ~3/4 of rows."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.substring(F.md5(F.concat(F.lit(f"{tag}#"), col.cast("string"))), 1, 1)
        < threshold
    )
