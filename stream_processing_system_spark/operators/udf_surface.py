"""The user-extension surface (SURVEY.md §2.11).

The reference's intended (vestigial) plugin API is:
- Spout:  Init(path) / Open() / NextTuple() → map[string]string
  (`Apps/WordCountSpout.go:18-44`)
- Bolt:   Execute(in map[string]string) → map[string]string
  (`Apps/WordCountBolt.go:17-37`)
- Stateful bolt: methods mutating per-key maps (`bolt/bolt.go:566-626`)

Spark-native equivalents, as thin documented wrappers (not a
framework): all Python extension points are Arrow-batched
(pandas_udf / mapInPandas / applyInPandas) — never row-at-a-time
Python UDFs, which are 10-100x slower in the hot path."""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def spout_from_iterator(
    spark: SparkSession, tuples: Iterable[dict[str, str]], schema: str
) -> DataFrame:
    """Batch spout parity: materialize a NextTuple()-style iterator of
    dicts as a DataFrame. For unbounded custom sources, implement a
    PySpark DataSource (spark.dataSource.register) instead — file
    drop-in directories (streaming/jobs.py) cover the reference's
    actual sources."""
    return spark.createDataFrame((tuple(d.values()) for d in tuples), schema=schema)


def scalar_bolt(
    fn: Callable[[pd.Series], pd.Series], return_type: str = "string"
):
    """1-in/1-out bolt (Execute contract) as an Arrow-batched
    pandas_udf: `fn` receives/returns a pandas Series per batch.

    >>> upper = scalar_bolt(lambda s: s.str.upper())
    >>> df.select(upper("name"))
    """
    return F.pandas_udf(fn, returnType=return_type)


def flatmap_bolt(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], Iterator[pd.DataFrame]],
    schema: str,
) -> DataFrame:
    """1-in/N-out bolt: mapInPandas — `fn` takes an iterator of
    input batches and yields output batches with `schema`. The
    Spark-side batch shape (Arrow columnar) is what makes this viable
    at scale, unlike the reference's per-tuple JSON hops
    (`bolt/bolt.go:220-221`)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield from fn(batch)

    return df.mapInPandas(_gen, schema=schema)


def grouped_agg_bolt(
    fn: Callable[[pd.Series], object], return_type: str = "double"
):
    """UDAF surface: a grouped-aggregate pandas_udf — `fn` reduces a
    pandas Series (one group's values, Arrow-delivered) to a scalar.
    Usable in groupBy().agg() and as a window function.

    >>> iqr = grouped_agg_bolt(lambda s: s.quantile(.75) - s.quantile(.25))
    >>> df.groupBy("k").agg(iqr("v"))
    """
    return F.pandas_udf(fn, returnType=return_type, functionType=F.PandasUDFType.GROUPED_AGG)


def table_bolt(cls, return_schema: str):
    """UDTF surface (Spark 3.5+ Python user-defined table function):
    the closest modern analog of the reference's `NextTuple()` spout
    contract — a class whose `eval(...)` yields rows. Registered per
    call site:

    >>> @F.udtf(returnType="word: string")
    ... class Split:
    ...     def eval(self, line: str):
    ...         for w in line.split(): yield (w,)

    This wrapper just applies the decorator, keeping the engine's
    extension surface in one module."""
    return F.udtf(cls, returnType=return_schema)


def stateful_bolt(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Per-key stateful bolt (batch): applyInPandas — `fn` sees the
    complete group as one pandas DataFrame. The streaming variant
    with incremental state is streaming.jobs.stream_running_counts
    (applyInPandasWithState)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)
