"""Deterministic, cross-engine hash kernels (FIXTURES.md header).

One hash family, three implementations that agree bit-for-bit:
  * numpy (vectorized, for Arrow-UDF kernels and fixture generators)
  * Spark SQL expression strings
  * DuckDB ANSI SQL expression strings (same string — dialect-shared)

Design constraint (SURVEY.md §5.3, §7 hard-part 8): Spark 4.1 runs ANSI mode
by default, where int64 overflow THROWS.  Every intermediate product here is
< 2**52, so the math is simultaneously (a) ANSI-safe, (b) exact in float64,
and (c) identical in Spark SQL, DuckDB SQL, and numpy int64.

    m1(k)  = ((k mod 999983) * 2654435761 + 1013904223) mod 2**32
    mix(k) = ((m1(k) mod 999979) * 2246822519 + 374761393) mod 2**32
    u01(k) = mix(k) / 2**32            -- in [0, 1)

``k`` must be non-negative (SQL ``%`` keeps the dividend's sign; all call
sites use non-negative keys by construction).
"""

from __future__ import annotations

import numpy as np

M1_MOD = 999983
M1_MUL = 2654435761
M1_ADD = 1013904223
M2_MOD = 999979
M2_MUL = 2246822519
M2_ADD = 374761393
U32 = 4294967296  # 2**32


def mix(k):
    """uint32 mix of non-negative int64 key(s). numpy-vectorized."""
    k = np.asarray(k, dtype=np.int64)
    m1 = ((k % M1_MOD) * M1_MUL + M1_ADD) % U32
    return ((m1 % M2_MOD) * M2_MUL + M2_ADD) % U32


def u01(k):
    """Deterministic uniform [0,1) from non-negative int64 key(s)."""
    return mix(k) / float(U32)


def mix_sql(k: str) -> str:
    """SQL expression for mix(k); valid in both Spark SQL and DuckDB."""
    m1 = f"((({k}) % {M1_MOD}) * {M1_MUL} + {M1_ADD}) % {U32}"
    return f"((({m1}) % {M2_MOD}) * {M2_MUL} + {M2_ADD}) % {U32}"


def u01_sql(k: str) -> str:
    """SQL expression for u01(k); valid in both Spark SQL and DuckDB.

    The divisor is CAST AS DOUBLE: Spark parses a ``4294967296.0`` literal as
    DECIMAL, and bigint/decimal is decimal division with different rounding
    than IEEE-754 — the cast keeps all three implementations bit-identical.
    """
    return f"(({mix_sql(k)}) / CAST({U32} AS DOUBLE))"
