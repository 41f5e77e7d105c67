"""File sinks reproducing the reference's output formats
(SURVEY.md §2.10 K1-K3). Formatting happens in codegen'd expressions;
the write is a parallel text write (coalesce(1) optional for the
byte-faithful single-file layout the reference produces — its boltl
is a single reducer, `Nimbus.go:637`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bolt/bolt.go:535 writes a 43-character '=' rule between host blocks.
K3_SEPARATOR = "=" * 43


def write_kv_lines(
    df: DataFrame, path: str, key: str, value: str, single_file: bool = False
) -> None:
    """K1/K2: `key:value` lines (`bolt/bolt.go:296-310` wordcount,
    `:398-419` reddit top-50)."""
    out = df.select(
        F.concat_ws(":", F.col(key).cast("string"), F.col(value).cast("string")).alias(
            "value"
        )
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_host_report(
    df: DataFrame,
    path: str,
    host: str = "host",
    hits: str = "hits",
    routes_arr: str = "routes_arr",
    single_file: bool = False,
) -> None:
    """K3: per-host block — `host:count`, one route per line, then a
    `====` separator (`bolt/bolt.go:522-541`; the reference emits a
    43-char rule, bolt.go:535). The whole block is built as one
    string column per host, so the writer stays parallel."""
    block = F.concat_ws(
        "\n",
        F.concat_ws(":", F.col(host).cast("string"), F.col(hits).cast("string")),
        F.array_join(F.col(routes_arr), "\n"),
        F.lit(K3_SEPARATOR),
    )
    out = df.select(block.alias("value"))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
