"""Reusable column-expression helpers (JVM-side, codegen-friendly).

Tokenizer contract (reference ``bin/mr-wordc.o:get_next_word``, SURVEY.md
§2.2 W3): tokens are maximal runs of ASCII alphanumerics ``[A-Za-z0-9]+``;
every other byte is a delimiter (``_``, ``-``, ``'`` all split); tokens are
case-preserving; empty strings are suppressed. ``\\w+`` would be WRONG
(includes ``_`` and unicode word chars).

All helpers return Column expressions built from ``pyspark.sql.functions``
so they stay inside whole-stage codegen — no Python UDFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Delimiter = any run of non-alphanumerics (Java regex, ASCII classes).
TOKEN_DELIM_RE = "[^A-Za-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Array of tokens incl. possible empty leading/trailing strings."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, TOKEN_DELIM_RE)


def tokens_nonempty(col: Column | str) -> Column:
    """Array of non-empty tokens (the reference suppresses empty tokens,
    ``get_next_word+0xd3-0xde``)."""
    return F.filter(tokens(col), lambda t: F.length(t) > 0)


def explode_tokens(col: Column | str, alias: str = "token") -> Column:
    """Explode to one row per token (flatMap W3)."""
    return F.explode(tokens_nonempty(col)).alias(alias)
