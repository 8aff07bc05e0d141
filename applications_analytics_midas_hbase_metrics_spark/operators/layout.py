"""Multi-dimensional data layout: Z-order (Morton) interleaving
(extension tier — the write-side layout operator behind multi-column
data skipping: sorting output files by the interleaved key gives every
filtered dimension locality, so min/max file statistics prune scans on
ANY of the interleaved columns, not just the leading sort key).

The curve value is a pure per-row projection (an unrolled
shift-mask-or expression, fully inside whole-stage codegen — no UDF,
no shuffle); the layout step is then an ordinary
``repartitionByRange(zvalue)`` + write, so the operator adds ZERO cost
beyond the range exchange the write was already paying for a
single-column sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 8) -> Column:
    """The Morton interleave of ``bits`` low bits of each column
    (column j's bit i lands at position ``len(cols)*i + j``): equal
    z-prefixes are small hyper-rectangles in the original space.

    Inputs are masked to ``bits`` (callers bucket-reduce first — the
    curve needs bounded, roughly-uniform dimensions; production layouts
    rank-normalize each column to 2^bits buckets, which is
    stratified_percent_rank + floor).  The expression is UNROLLED over
    literal shift amounts, so the whole value stays one codegen-stage
    projection."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs >= 2 columns")
    out = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1))
            out = out + bit * F.lit(1 << (n * i + j))
    return out
