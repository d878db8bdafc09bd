"""Additional applications on the mr_* compat surface.

The reference ships exactly one app (word count, ``bin/mr-wordc.o``) but
its ``.gitignore:3-4`` names two more (``mr-sleep``, ``mr-trace``) that
never made it into the repo — i.e. the API was meant to host a family of
apps. These two small apps prove the compat facade is genuinely generic:
any ``map_fn(index, lines) -> (k, v)`` / associative ``reduce_fn(v1, v2)``
pair runs unchanged on the Spark lane, with map-side combining and
partitioned reduce for free.

Both use only the callback contract from ``mapreduce.h:48-56`` — no Spark
imports in the app code, exactly like an ``mr-*.c`` app links only
against ``mapreduce.h``.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def linelen_map(index: int, lines: Iterator[str]) -> Iterable[tuple[int, int]]:
    """mr-linelen: histogram of line lengths, bucket width 10 chars."""
    for line in lines:
        yield (len(line) // 10) * 10, 1


def bigram_map(index: int, lines: Iterator[str]) -> Iterable[tuple[str, int]]:
    """mr-bigram: counts of adjacent token pairs within a line (tokens per
    the reference contract: maximal [A-Za-z0-9]+ runs, case-preserving)."""
    for line in lines:
        toks = _TOKEN_RE.findall(line)
        for a, b in zip(toks, toks[1:]):
            yield f"{a} {b}", 1


def count_reduce(v1: int, v2: int) -> int:
    """Shared associative reducer (the reference's wc_add shape)."""
    return v1 + v2


_ANAGRAM_CAP = 8


def anagram_map(index: int, lines: Iterator[str]) -> Iterable[tuple[str, tuple[str, ...]]]:
    """mr-anagram: group tokens by their sorted-letter signature (the
    classic anagram-class job). Values are TUPLES, not counts — this app
    exists to prove the facade's reducer contract is not numeric-only."""
    for line in lines:
        for tok in _TOKEN_RE.findall(line):
            yield "".join(sorted(tok.lower())), (tok.lower(),)


def setmerge_reduce(
    v1: tuple[str, ...], v2: tuple[str, ...]
) -> tuple[str, ...]:
    """Associative + commutative capped set merge: the sorted union of two
    sorted distinct tuples, truncated to the _ANAGRAM_CAP smallest — min-k
    over a set is order-insensitive, so map-side combining is safe exactly
    as it is for sums."""
    return tuple(sorted(set(v1) | set(v2)))[:_ANAGRAM_CAP]
