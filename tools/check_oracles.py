"""Driver-mimicking correctness harness: run every queries() entry and its
oracle_sql() side-by-side, compare row count, schema (column names) and
order-insensitive values. Usage:

    PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


EXACT = "--exact" in sys.argv  # driver-style bit-exact value compare
# --physical additionally requires identical pandas dtypes and identical
# pd.util.hash_pandas_object digests — the driver's value hash is
# physical-representation-sensitive (int64 vs float64, pd.NA vs NaN), so
# a query can pass --exact yet fail the driver (round-2's rollup/cube/
# outer-join lesson). Run the full sweep with --physical before a round
# ends.
PHYSICAL = "--physical" in sys.argv


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    if PHYSICAL:
        rd_ = ray_df[sorted(ray_df.columns)]
        sd_ = sql_df[sorted(sql_df.columns)]
        dt_a = {c: str(rd_[c].dtype) for c in rd_.columns}
        dt_b = {c: str(sd_[c].dtype) for c in sd_.columns}
        if dt_a != dt_b:
            problems.append(
                "physical dtypes: " + ", ".join(
                    f"{c}: ray={dt_a[c]} sql={dt_b[c]}"
                    for c in dt_a if dt_a[c] != dt_b[c]))
        elif len(rd_) == len(sd_):
            key = list(rd_.columns)
            a_s = rd_.sort_values(key, kind="mergesort",
                                  na_position="last").reset_index(drop=True)
            b_s = sd_.sort_values(key, kind="mergesort",
                                  na_position="last").reset_index(drop=True)
            ha = pd.util.hash_pandas_object(a_s, index=False).sum()
            hb = pd.util.hash_pandas_object(b_s, index=False).sum()
            if ha != hb:
                problems.append("physical hash: pandas value-hash differs "
                                "(null representation or raw bytes)")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=EXACT,
                                          rtol=0 if EXACT else 1e-6,
                                          atol=0 if EXACT else 1e-6)
        except AssertionError as e:
            problems.append("values: " + str(e).split("\n")[0])
            merged = a.merge(b, how="outer", indicator=True, on=list(a.columns))
            diff = merged[merged._merge != "both"]
            problems.append(f"  {len(diff)} differing rows; sample:\n{diff.head(6)}")
    return problems


def main() -> int:
    import ray

    argv = [a for a in sys.argv[1:] if a not in ("--exact", "--physical")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from code_graph_rag_ray.stages.relational import clear_broadcast_cache

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            clear_broadcast_cache()  # release prior query's pinned sides
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(ray_df)} (no oracle — rows-only)")
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print("   ", p)
        else:
            print(f"PASS {name}: rows={len(ray_df)}")
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
