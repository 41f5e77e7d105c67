"""Local mirror of the driver's DuckDB differential-oracle check
(SURVEY.md §5): run the Spark query and the oracle SQL on the same
parquet tables and compare row count, column names, and values
order-insensitively.

The comparison is EXACT (round-3 change): every cell is canonicalized
to a string (floats via `repr`, so any last-ulp divergence fails) and
row multisets must be identical. Round 2 shipped a broken query
(`events_twap_daily`) precisely because this module used
`rtol=1e-9` while the driver hashes exact values — tolerance here is
strictly weaker than the check it claims to mirror, so there is none.

Tests use this at sf0.001 for speed; run `python -m tests.oracle` to
check every registered query at sf0.01 (the driver's scale).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from stream_processing_system_spark.sources.tables import TABLES, table_path


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con.execute(sql).df()


def canon_cell(v) -> str:
    """Canonical string for one value, identical for any two values a
    value-hash would treat as equal: floats/Decimals through float64
    `repr` (exact — two doubles canon equal iff bit-equal, modulo
    +0.0/-0.0 which we deliberately keep distinct), ints as ints,
    temporal types as ISO strings, arrays recursively."""
    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "nan" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "∅"
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [
        tuple(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    out.sort()
    return out


def assert_matches_oracle(spark_df, sf_dir: str, sql: str) -> None:
    got_pd = spark_df.toPandas()
    want_pd = duck_run(sf_dir, sql)
    assert sorted(got_pd.columns) == sorted(want_pd.columns), (
        f"column mismatch: spark={sorted(got_pd.columns)} "
        f"oracle={sorted(want_pd.columns)}"
    )
    assert len(got_pd) == len(want_pd), (
        f"row count: spark={len(got_pd)} oracle={len(want_pd)}"
    )
    got = canon_rows(got_pd)
    want = canon_rows(want_pd)
    if got != want:
        cols = sorted(got_pd.columns)
        diffs = [
            (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
        ][:3]
        msg = "; ".join(
            f"row {i}: spark={dict(zip(cols, g))} oracle={dict(zip(cols, w))}"
            for i, g, w in diffs
        )
        raise AssertionError(f"exact value mismatch ({len(diffs)}+ rows): {msg}")


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
            print(f"{name:32s} rows-only ({n} rows)", flush=True)
            continue
        try:
            assert_matches_oracle(fn(spark, sf_dir), sf_dir, oracles[name])
            print(f"{name:32s} OK", flush=True)
        except Exception as e:
            failed.append(name)
            print(f"{name:32s} FAIL: {str(e)[:500]}", flush=True)
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all queries match the DuckDB oracle")


if __name__ == "__main__":
    main()
