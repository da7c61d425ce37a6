"""Z-order (Morton) interleaving — multi-dimensional data clustering.

The 100 TB layout technique for tables queried on TWO dimensions at
once (device × time, user × day, region × hour): sorting files by the
bit-interleaved key makes every contiguous run of rows a small
RECTANGLE in (x, y) space, so parquet row-group min/max stats prune
scans for 2-D predicates — a 1-D sort can only prune its own leading
dimension. Same role as Delta/Iceberg Z-ORDER clustering, expressed as
a pure integer column both engines compute identically (shifts, masks,
OR — no hashing, no floats).

`zorder16_expr` interleaves two 16-bit values into a 32-bit Morton key
with the classic magic-number bit spreading (each step doubles the gap
between occupied bits):

    v = (v | v<<8) & 0x00FF00FF
    v = (v | v<<4) & 0x0F0F0F0F
    v = (v | v<<2) & 0x33333333
    v = (v | v<<1) & 0x55555555
    z = spread(x) | spread(y) << 1

tests/test_zorder.py measures the pruning claim directly: row-group
min/max stats of a z-sorted file admit strictly fewer candidate groups
for a 2-D box predicate than a time-sorted file of the same data.
"""

from __future__ import annotations

#: (shift, mask) ladder for spreading 16 bits across 32.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _shift(engine: str, expr: str, n: int) -> str:
    if engine == "spark":
        return f"shiftleft({expr}, {n})"
    return f"({expr} << {n})"


def spread16_expr(engine: str, v: str) -> str:
    """SQL expression spreading the low 16 bits of ``v`` to even bit
    positions (bit i -> bit 2i)."""
    expr = f"({v})"
    for s, m in _SPREAD:
        expr = f"(({expr} | {_shift(engine, expr, s)}) & {m})"
    return expr


def zorder16_expr(engine: str, x: str, y: str) -> str:
    """32-bit Morton key of two 16-bit dimensions (x gets even bits)."""
    return (
        f"({spread16_expr(engine, x)} | "
        f"{_shift(engine, spread16_expr(engine, y), 1)})"
    )


def zorder_py(x: int, y: int) -> int:
    """Python twin of zorder16_expr (test oracle / writer-side key)."""

    def spread(v: int) -> int:
        for s, m in _SPREAD:
            v = (v | (v << s)) & m
        return v

    return spread(x & 0xFFFF) | (spread(y & 0xFFFF) << 1)
