"""Golden-parity verification operator (SURVEY.md §2.4: the engine's one
real equi-join — produced rollups vs golden fixtures).

The golden side is always small (fixtures), so it is explicitly
broadcast: the check is a map-side hash join against every produced
partition, no shuffle of the (large) produced table. ``all_close``
semantics: strict ``<`` absolute tolerance (reference
light-curve-common/src/allclose.rs:26-41); bit-exact when tol=0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def verify_parity(
    produced: DataFrame,
    golden: DataFrame,
    keys: list[str],
    value_cols: list[str],
    tol: float = 0.0,
) -> DataFrame:
    """Rows violating parity: value mismatch (|p - g| >= tol; tol=0.0
    demands bit equality — strict '<' passes, all_close semantics),
    produced rows with no golden, or golden rows with no produced.
    Empty result == parity.

    Physical shape: the bulk value check is produced LEFT OUTER JOIN
    broadcast(golden) — a map-side hash join over every produced
    partition, no shuffle of the large side (full_outer cannot broadcast,
    which is why the absence check is a separate LEFT ANTI pass from the
    small golden side)."""
    p = produced.select(
        *keys, *[F.col(c).alias(f"p_{c}") for c in value_cols]
    )
    g = golden.select(*keys, *[F.col(c).alias(f"g_{c}") for c in value_cols])
    joined = p.join(F.broadcast(g), keys, "left_outer")
    bad = F.lit(False)
    for c in value_cols:
        pc, gc = F.col(f"p_{c}"), F.col(f"g_{c}")
        if tol == 0.0:
            neq = ~(pc.eqNullSafe(gc))
        else:
            neq = pc.isNull() | gc.isNull() | (F.abs(pc - gc) >= tol)
        bad = bad | neq
    mismatched = joined.filter(bad)
    ptypes = {f.name: f.dataType for f in produced.schema.fields}
    missing = g.join(p.select(*keys), keys, "left_anti").select(
        *keys,
        *[F.lit(None).cast(ptypes[c]).alias(f"p_{c}") for c in value_cols],
        *[F.col(f"g_{c}") for c in value_cols],
    )
    return mismatched.unionByName(missing)


def assert_parity(produced, golden, keys, value_cols, tol: float = 0.0) -> None:
    bad = verify_parity(produced, golden, keys, value_cols, tol)
    n = bad.count()
    if n:
        sample = bad.limit(5).collect()
        raise AssertionError(f"parity violated on {n} rows; sample: {sample}")
