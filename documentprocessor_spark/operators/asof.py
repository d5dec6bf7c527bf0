"""As-of join — the time-series operator Spark lacks natively.

For each left row, attach the most recent right row of the same key with
``right.ts <= left.ts`` (backward, inclusive — DuckDB/kdb ASOF semantics).

Implementation is the scalable union-window pattern, NOT a range join:
tag both sides, union, and run ONE window pass per key ordered by
(ts, side) with a last(ignorenulls) carry-forward — right rows sort before
left rows at equal timestamps, which is exactly the inclusive ``>=`` rule.
Cost: a single shuffle on the key (the same shuffle a plain equi-join
would pay); no per-key Python, no cross product, no O(left × right) pair
blow-up on hot keys. The DuckDB oracle twin is a native ASOF JOIN.

Determinism: ties among right rows with identical (key, ts) are broken by
``tiebreak`` (pass a unique column like an event id). The matched right
row is carried as ONE struct, so its value columns arrive atomically —
nulls inside a matched row come through as nulls (never mixed with an
older row's fields), and right rows with a NULL timestamp are dropped up
front (``right.ts <= left.ts`` is never true for NULL — DuckDB ASOF
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    values: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join. Returns every left row plus
    ``<value><suffix>`` columns from the matching right row (all null when
    no right row at or before the left timestamp exists for the key)."""
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    vals = "__asof_vals"
    val_type = StructType(
        [StructField(v, right.schema[v].dataType, True) for v in values]
    )

    # the whole matched right row travels as ONE struct — the carry is
    # atomic, so a null inside a matched row stays that row's null instead
    # of falling through to an older row's value
    l_side = left.withColumn(_SIDE, F.lit(1)).withColumn(
        vals, F.lit(None).cast(val_type)
    )

    # the tiebreak travels as its own column (a right row's tiebreak would
    # otherwise be null-filled with the rest of the left schema): among
    # right rows tied on (key, ts) the LARGEST tiebreak wins the carry
    tb = "__asof_tb"
    if tiebreak is not None:
        # tiebreak is a RIGHT-side column; left rows carry a typed null
        l_side = l_side.withColumn(
            tb, F.lit(None).cast(right.schema[tiebreak].dataType)
        )

    r_side = (
        right.where(F.col(ts).isNotNull())  # NULL ts never matches (ASOF)
        .select(
            F.col(on),
            F.col(ts),
            F.struct(*(F.col(v).alias(v) for v in values)).alias(vals),
            *([F.col(tiebreak).alias(tb)] if tiebreak is not None else []),
        )
        .withColumn(_SIDE, F.lit(0))
    )
    for c in lcols:
        if c not in (on, ts):
            r_side = r_side.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )

    ordered = [*lcols, _SIDE, vals]
    if tiebreak is not None:
        ordered.append(tb)
    u = l_side.select(*ordered).unionByName(r_side.select(*ordered))

    order_cols = [F.col(ts).asc(), F.col(_SIDE).asc()]
    if tiebreak is not None:
        order_cols.append(F.col(tb).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(vals, ignorenulls=True).over(w)
    return (
        u.withColumn(vals, filled)
        .where(F.col(_SIDE) == 1)
        .select(
            *lcols,
            *(F.col(vals)[v].alias(f"{v}{suffix}") for v in values),
        )
    )
