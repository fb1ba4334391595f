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
