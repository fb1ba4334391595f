"""Small shared helpers."""

from __future__ import annotations

from typing import Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T


def local_df(spark: SparkSession, rows: Sequence[tuple],
             schema: Union[str, T.StructType]) -> DataFrame:
    """Arrow-backed small DataFrame from driver-side rows.

    ``spark.createDataFrame(list_of_tuples)`` produces a python-RDD-backed
    plan: EVERY re-evaluation (each action over a join/union that
    references it) pays python-worker round-trips per partition — a
    7x7-row cross join of two such frames measured ~8 s at local[32].
    Routing the same rows through a pandas DataFrame plans them as
    Arrow-backed local data instead (~0.2 s for the same join).  Use for
    every driver-created table that participates in a join or union
    (report grids, cluster id maps, prior-state pass-throughs).
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    names = [f.name for f in schema.fields]
    pdf = pd.DataFrame(list(rows), columns=names, dtype=object)
    # object dtype keeps None as None (no NaN coercion); Spark casts
    # per-column to the declared schema during Arrow conversion
    return spark.createDataFrame(pdf, schema=schema)


def widen_small_scan(df: DataFrame, min_parts: int = None) -> DataFrame:
    """Repartition an input whose scan plans NARROWER than the session's
    parallelism — and only then.

    A small input (one file, or one parquet row group) scans as a single
    partition, which serializes every pre-shuffle expression — regex
    masking, shingle explodes, Arrow match UDFs — onto one task while
    the other cores idle (measured: q15's posting aggregation spent
    4-8s in a one-task stage at sf0.1).  File-split settings can't fix
    it: a single-row-group parquet file is indivisible no matter how
    ``maxPartitionBytes``/``minPartitionNum`` are tuned.

    At production scale (files >> cores) the partition count already
    exceeds the target and this returns the input UNCHANGED — no shuffle
    is ever added where it would cost something.  The round-robin
    shuffle it does add on small inputs moves only the small input
    itself.  Operators that consume this remain order-insensitive
    (mining sorts per group on the order key; set/count aggregations are
    partition-invariant), so results are identical either way."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df  # e.g. streaming DataFrames: no static partitioning
    return df.repartition(target) if n < target else df


def carry_schema(base: "T.StructType", df: "DataFrame",
                 carry) -> "T.StructType":
    """Output schema for a per-clip stats operator that passes input
    columns through (``carry``): the base schema plus each carried
    column's StructField copied from the input — so a ds/codec-keyed
    rollup never re-joins the corpus on clip_id (a second full scan
    plus a corpus-sized shuffle at 10^12 rows).  Rejects carried names
    that collide with the operator's own output columns."""
    from pyspark.sql import types as T
    taken = {f.name for f in base.fields}
    fields = list(base.fields)
    for c in carry:
        if c in taken:
            raise ValueError(f"carry column collides with output: {c!r}")
        fields.append(df.schema[c])
        taken.add(c)
    return T.StructType(fields)
