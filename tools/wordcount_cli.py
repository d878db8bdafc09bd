"""CLI parity with the reference application.

Usage (mirrors ``bin/mr-wordc.o:main`` — ``.rodata+0x68``:
``mr-wordc <input> <output> [# mapper threads] [buffer size]``):

    python tools/wordcount_cli.py <input> <output> [threads] [buffer_size]

Defaults threads=1, buffer_size=1000 (``main+0x1a-0x28``). ``threads`` maps
to input partitions; ``buffer_size`` is accepted and ignored (Spark's
shuffle is spill-safe — there is nothing to size). Output is the exact
golden format: lines ``"%s, %d\\n"``, ascending byte-wise token order, empty
input → empty output; elapsed wall-clock is printed like the reference's
``Time = %f`` (``mapreduce.c:224``, microseconds).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_api_spark.compat.mapreduce import mr_create, wordcount_map, wordcount_reduce
from mapreduce_framework_api_spark.session import get_spark


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(
            f"usage: {argv[0]} <input> <output> [# mapper threads] [buffer size]",
            file=sys.stderr,
        )
        return 1
    inpath, outpath = argv[1], argv[2]
    threads = int(argv[3]) if len(argv) > 3 else 1
    buffer_size = int(argv[4]) if len(argv) > 4 else 1000

    if not os.path.exists(inpath):
        print(f"error: cannot open input file {inpath}", file=sys.stderr)
        return 1

    spark = get_spark("mr-wordc", cpus=max(threads, 1))
    try:
        job = mr_create(wordcount_map, wordcount_reduce, partitions=threads, buffer_size=buffer_size)
        job.start(spark, inpath)
        elapsed = job.finish(outpath)
        print(f"Time = {elapsed * 1e6:.6f}")  # microseconds, like mapreduce.c:224
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
