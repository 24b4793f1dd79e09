"""DuckDB-oracle comparison harness (SURVEY.md §5.2 #1).

Mimics the driver's correctness gate: run the Spark query and the ANSI-SQL
oracle on the same parquet fixtures, canonicalize (sort columns by name, sort
rows), and compare values exactly. Exact equality — not tolerance — is the
point: the engine's float policy (DECIMAL exact sums, DOUBLE left-fold +
round(6), total-order tie-breaks) must make the two engines bit-identical.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import pandas as pd


def duckdb_connection(sf_dir: str):
    import duckdb

    from webscale_vector_search_spark.schemas import FIXTURE_TABLES

    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = "" if self.ok else f" :: {'; '.join(self.mismatches[:5])}"
        return f"[{status}] {self.name} spark={self.spark_rows} oracle={self.oracle_rows}{extra}"


def _canonical(v) -> str:
    """Driver-faithful canonical form of one cell.

    The driver hashes stringified cells, so `24` (int64) and `24.0` (float64)
    are DIFFERENT, as are `0.0` and `-0.0` — while Python `==` treats both
    pairs as equal. r3 shipped three red driver rows that the old `==`
    comparison reported [OK] locally; canonical-repr comparison reproduces
    the driver's verdict exactly (verified on the r3 failures pre-fix).
    """
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):  # numpy scalar
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    # sequence check FIRST: pd.isna(ndarray) returns an array, and bool() of
    # it raises — the guard below must never see a multi-element sequence
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canonical(x) for x in v) + "]"
    if v is None or (not isinstance(v, (str, bytes, dict)) and pd.isna(v)):
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)  # repr(-0.0) == '-0.0' != '0.0'; int never equals float
    return f"{type(v).__name__}:{v!r}"


def _values_equal(a, b) -> bool:
    return _canonical(a) == _canonical(b)


def compare(name: str, spark_df, oracle_con, oracle_sql: str) -> CompareResult:
    spark_pd = canonicalize(spark_df.toPandas())
    oracle_pd = canonicalize(oracle_con.execute(oracle_sql).fetchdf())
    res = CompareResult(name, True, len(spark_pd), len(oracle_pd))

    if list(spark_pd.columns) != list(oracle_pd.columns):
        res.ok = False
        res.mismatches.append(f"columns spark={list(spark_pd.columns)} oracle={list(oracle_pd.columns)}")
        return res
    if len(spark_pd) != len(oracle_pd):
        res.ok = False
        res.mismatches.append("row count")
        return res

    for col in spark_pd.columns:
        sv, ov = spark_pd[col].tolist(), oracle_pd[col].tolist()
        bad = [i for i, (a, b) in enumerate(zip(sv, ov)) if not _values_equal(a, b)]
        if bad:
            res.ok = False
            i = bad[0]
            res.mismatches.append(
                f"col {col}: {len(bad)}/{len(sv)} differ, first@{i}: spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return res


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from webscale_vector_search_spark.queries import ORACLE_SQL, QUERIES

    con = duckdb_connection(sf_dir)
    results = []
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        if name not in ORACLE_SQL:
            continue
        try:
            results.append(compare(name, fn(spark, sf_dir), con, ORACLE_SQL[name]))
        except Exception as e:  # noqa: BLE001 - harness reports, doesn't crash
            results.append(CompareResult(name, False, -1, -1, [f"exception: {e}"]))
    return results
