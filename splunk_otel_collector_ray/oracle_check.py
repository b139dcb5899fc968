"""Driver-style correctness harness: engine queries vs DuckDB oracle.

Mirrors the external driver's compare: row count + column names + an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded, timestamps normalized to naive-UTC µs). Used by the pytest suite and
scripts/check_parity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype(np.float64), 6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype(np.int64)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def make_duckdb(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{name}.parquet')")
    return con


def compare_one(got_df: pd.DataFrame, exp_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    got, exp = canon(got_df), canon(exp_df)
    if len(got) != len(exp):
        problems.append(f"rows {len(got)} != {len(exp)}")
    if list(got.columns) != list(exp.columns):
        problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    elif not problems and value_hash(got) != value_hash(exp):
        neq = (got != exp) & ~(got.isna() & exp.isna())
        bad = [c for c in got.columns if neq[c].any()]
        problems.append(f"values differ in {bad}")
        for c in bad[:2]:
            i = int(neq[c].idxmax())
            problems.append(f"first diff {c}[{i}]: got={got[c][i]!r} "
                            f"exp={exp[c][i]!r}")
    return problems


def run_parity(sf_dir: str, names: set[str] | None = None,
               log=print) -> list[tuple[str, str]]:
    """Run queries vs oracle at ``sf_dir``; return (name, problem) failures."""
    import time

    import __ray_entry__ as e
    from splunk_otel_collector_ray import corpus

    qs, oracles = e.queries(), e.oracle_sql()
    # the shipped oracle SQL targets the driver's sf0.01 corpus; retarget the
    # transcript glob when checking another scale
    tglob = e.ORACLE_TGLOB
    mine = corpus.ensure_transcripts(sf_dir) + "/*.parquet"
    con = make_duckdb(sf_dir)
    fails: list[tuple[str, str]] = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001 - harness surface
            fails.append((name, f"query raised {type(ex).__name__}: {ex}"))
            log(f"FAIL {name}: {fails[-1][1]}")
            continue
        if name not in oracles:
            log(f"ok(rows-only) {name}: {len(got)} rows [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name].replace(tglob, mine)).fetchdf()
        except Exception as ex:  # noqa: BLE001
            fails.append((name, f"oracle raised {type(ex).__name__}: {ex}"))
            log(f"FAIL {name}: {fails[-1][1]}")
            continue
        problems = compare_one(got, exp)
        if problems:
            fails.append((name, "; ".join(problems)))
            log(f"FAIL {name}: {fails[-1][1]}")
        else:
            log(f"ok {name}: {len(got)} rows [{time.time()-t0:.1f}s]")
    return fails
