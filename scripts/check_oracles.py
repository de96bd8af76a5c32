"""Driver-style correctness harness: run every registered query on
Spark AND its DuckDB oracle, compare row count, column names, and
values (order-insensitive, exact).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists/arrays → tuples so they sort/compare
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # The external driver hashes typed values: an int64 68423 and a
        # float64 68423.0 hash differently even though they're "equal".
        # Flag int-vs-float dtype divergence instead of coercing it away
        # (r01 lesson: DuckDB floor/ceil→DOUBLE, SUM(CASE)→HUGEINT→float
        # vs Spark BIGINT passed locally but failed the driver's hash).
        s_int = pd.api.types.is_integer_dtype(sv)
        o_int = pd.api.types.is_integer_dtype(ov)
        s_float = pd.api.types.is_float_dtype(sv)
        o_float = pd.api.types.is_float_dtype(ov)
        if (s_int and o_float) or (s_float and o_int):
            problems.append(
                f"col {c}: dtype mismatch spark={sv.dtype} oracle={ov.dtype}"
                " (typed value-hash would diverge)"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv_f = pd.to_numeric(sv, errors="coerce").astype(float)
            ov_f = pd.to_numeric(ov, errors="coerce").astype(float)
            both_nan = sv_f.isna() & ov_f.isna()
            exact = (sv_f == ov_f) | both_nan
            if not exact.all():
                bad = (~exact).sum()
                diff = (sv_f - ov_f).abs().max()
                problems.append(f"col {c}: {bad} float mismatches, max abs diff {diff}")
        else:
            eq = (sv.astype(str) == ov.astype(str))
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(f"col {c}: {(~eq).sum()} mismatches, e.g. {sv[i]!r} vs {ov[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark

    spark = get_spark(shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    # Spill OUTSIDE the repo: an in-memory DuckDB under pressure writes
    # duckdb_temp_storage-*.tmp into cwd/.tmp by default — the r4
    # sweep's recursive-CTE queries spilled 8.6 GB there and the files
    # were accidentally committed (ADVICE r4). /tmp is host scratch.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = m.queries(), m.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
