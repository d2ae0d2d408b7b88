"""Shared plan helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

# Explicit F.broadcast() bypasses spark.sql.autoBroadcastJoinThreshold, so we
# gate on our own byte estimate.  Executors must hold the whole table per
# core; 256 MB keeps a comfortable margin on 4-8 GB executors.
BROADCAST_CAP_BYTES = 256 * 1024 * 1024
_SAMPLE_ROWS = 10_000


def estimated_bytes(df: DataFrame, n_rows: int) -> int:
    """n_rows x average row width from a bounded sample.  Width: strings by
    length, fixed-width types by size, +16B/row object overhead.  One tiny
    job over limit(_SAMPLE_ROWS) — call only when n_rows is already known to
    be near the broadcast regime."""
    width_exprs = []
    for f in df.schema.fields:
        if isinstance(f.dataType, StringType):
            width_exprs.append(F.coalesce(F.length(F.col(f.name)), F.lit(0)) + 4)
        elif isinstance(f.dataType, (LongType, DoubleType, TimestampType)):
            width_exprs.append(F.lit(8))
        elif isinstance(f.dataType, (IntegerType, FloatType)):
            width_exprs.append(F.lit(4))
        elif isinstance(f.dataType, (ShortType,)):
            width_exprs.append(F.lit(2))
        elif isinstance(f.dataType, (BooleanType, ByteType)):
            width_exprs.append(F.lit(1))
        else:  # arrays/structs/binary: pessimistic flat guess
            width_exprs.append(F.lit(64))
    total = width_exprs[0]
    for e in width_exprs[1:]:
        total = total + e
    row = df.limit(_SAMPLE_ROWS).agg(
        F.avg(total + 16).alias("w")
    ).collect()[0]
    avg = float(row["w"] or 64.0)
    return int(avg * n_rows)


def maybe_broadcast(
    df: DataFrame,
    n_rows: int,
    row_ceiling: int = 5_000_000,
    cap_bytes: int = BROADCAST_CAP_BYTES,
) -> DataFrame:
    """Broadcast `df` only if its row count AND estimated serialized size are
    under the caps; otherwise return it unchanged (shuffle join).  Row count
    must already be known (no extra count job); the byte estimate samples
    only when the row gate passes."""
    if n_rows > row_ceiling:
        return df
    # short-circuit (skips the sampling job — this repo minimizes fixed job
    # counts) ONLY when the schema is all fixed-width types, where the exact
    # row size is known without sampling; variable-width columns (strings,
    # arrays, binary) can hide arbitrarily wide rows and must be sampled
    fixed = {
        LongType, DoubleType, TimestampType, IntegerType, FloatType,
        ShortType, BooleanType, ByteType,
    }
    if all(type(f.dataType) in fixed for f in df.schema.fields):
        width = sum(
            8 if isinstance(f.dataType, (LongType, DoubleType, TimestampType))
            else 4 if isinstance(f.dataType, (IntegerType, FloatType))
            else 2 if isinstance(f.dataType, ShortType)
            else 1
            for f in df.schema.fields
        ) + 16
        return F.broadcast(df) if n_rows * width <= cap_bytes else df
    # variable-width schema: still skip the sampling job for genuinely tiny
    # dimension tables, under a deliberately harsh 256KB/row pessimism
    if n_rows * (256 * 1024) <= cap_bytes:
        return F.broadcast(df)
    if estimated_bytes(df, n_rows) > cap_bytes:
        return df
    return F.broadcast(df)


def artifact_bytes(name: str) -> bytes | None:
    """Read a packaged `ml/` artifact (trained weights and the like) via
    importlib.resources, so loading works identically from a source
    checkout, an installed wheel, and a `spark-submit --py-files` zip —
    zipimported packages have no real filesystem __file__, which is why
    callers must not build os.path joins off module paths.  Returns None
    when the artifact is absent (the callers' bootstrap-fallback path)."""
    from importlib import resources

    try:
        t = resources.files("berkeley_entity_spark.ml").joinpath(name)
        if not t.is_file():
            return None
        return t.read_bytes()
    except (ModuleNotFoundError, FileNotFoundError, OSError):
        return None
