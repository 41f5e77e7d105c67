"""Local mirror of the driver's DuckDB differential-oracle check
(SURVEY.md §5): run the Spark query and the oracle SQL on the same
parquet tables and compare row count, column names, and values
order-insensitively. Tests use this at sf0.001 for speed; run
`python -m tests.oracle` to check every registered query at sf0.01
(the driver's scale)."""

from __future__ import annotations

import duckdb
import pandas as pd

from stream_processing_system_spark.sources.tables import TABLES, table_path


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_matches_oracle(spark_df, sf_dir: str, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(duck_run(sf_dir, sql))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )


def main() -> None:
    import sys

    import __spark_entry__ as contract
    from stream_processing_system_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query names for a targeted re-check
    spark = get_spark(app_name="oracle-check")
    queries = contract.queries()
    if only:
        queries = {n: f for n, f in queries.items() if n in only}
    oracles = contract.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:32s} rows-only ({n} rows)")
            continue
        try:
            assert_matches_oracle(fn(spark, sf_dir), sf_dir, oracles[name])
            print(f"{name:32s} OK")
        except Exception as e:
            failed.append(name)
            print(f"{name:32s} FAIL: {str(e)[:500]}")
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all queries match the DuckDB oracle")


if __name__ == "__main__":
    main()
