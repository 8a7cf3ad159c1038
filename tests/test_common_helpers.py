"""Direct cross-engine tests for the shared oracle/engine helpers in
freki_spark/functions/common.py — until now exercised only THROUGH
op-level oracles, never pinned standalone.

_ppm_exact is the staged exact-ppm quotient under dozens of ops
(floor(num·10⁶/den) without ever forming num·10⁶): these tests drive
the documented contract 0 ≤ num ≤ den ≤ ~9.2e15 at its boundaries in
BOTH engines (Spark ``div`` and DuckDB ``//``) against a plain-python
floor reference, in one batched job per engine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from freki_spark.functions.common import _ppm_exact  # noqa: E402

DEN_MAX = 9_200_000_000_000_000  # the documented den*1000 < 2^63 bound


def _cases():
    """Boundary + seeded-random (num, den) pairs inside the contract."""
    import random

    cases = []
    dens = [1, 2, 3, 7, 999_983, 10**9, DEN_MAX - 1, DEN_MAX]
    for den in dens:
        nums = {0, 1, den // 3, den // 2, den - 1, den}
        cases += [(n, den) for n in nums if 0 <= n <= den]
    rng = random.Random(0xF2EE1)  # deterministic
    for _ in range(300):
        den = rng.randint(1, DEN_MAX)
        num = rng.randint(0, den)
        cases.append((num, den))
        # adversarial remainders: make r*1000 % den large
        cases.append((den - 1 - rng.randint(0, min(den - 1, 999)), den))
    return sorted(set(cases))


def test_ppm_exact_matches_python_floor_in_both_engines(spark):
    import duckdb

    cases = _cases()
    exp = {(n, d): n * 1_000_000 // d for n, d in cases}

    # DuckDB side ('//' integer division)
    vals = ", ".join(f"({n}, {d})" for n, d in cases)
    got_duck = {
        (n, d): v
        for n, d, v in duckdb.sql(
            f"SELECT num, den, {_ppm_exact('num', 'den', '//')} AS ppm "
            f"FROM (VALUES {vals}) t(num, den)"
        ).fetchall()
    }
    assert got_duck == exp

    # Spark side ('div' integer division), one batched job
    from pyspark.sql import functions as F

    df = spark.createDataFrame(cases, "num: bigint, den: bigint")
    got_spark = {
        (r.num, r.den): r.ppm
        for r in df.select(
            "num", "den", F.expr(_ppm_exact("num", "den", "div")).alias("ppm")
        ).collect()
    }
    assert got_spark == exp


def test_ppm_exact_is_exact_where_naive_double_math_is_not(spark):
    """The reason the staging exists: past 2^53 the naive double path
    (num * 1e6 / den) rounds, and bare bigint num*1000000 wraps.  This
    pair (found by search: num·10⁶ lands just under a multiple of den,
    so double rounding crosses the floor boundary) has BOTH naive
    forms provably wrong; the staged form must still equal the python
    floor in both engines."""
    num, den = 5_567_097_886_131_694, 8_156_250_748_849_463
    assert den <= DEN_MAX and num <= den  # inside the contract
    want = num * 1_000_000 // den  # 682555
    # naive double math flips the floor on this pair...
    assert int(num * 1e6 / den) == want + 1
    # ...and the bare bigint product overflows int64 outright
    assert num * 1_000_000 > 2**63 - 1
    import duckdb

    (duck,) = duckdb.sql(
        f"SELECT {_ppm_exact(str(num), str(den), '//')}"
    ).fetchone()
    assert duck == want
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(num, den)], "num: bigint, den: bigint")
    assert (
        df.select(F.expr(_ppm_exact("num", "den", "div")).alias("p"))
        .collect()[0]
        .p
        == want
    )
