"""Local mimic of the driver's correctness gate: run each queries() entry and
its oracle_sql() on the same sf dir, compare row count + schema-insensitive
sorted value hash.  Usage: python scripts/check_oracle.py [sf_dir] [names...]
"""

import hashlib
import sys
import time

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[2:])
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24} RAY-ERROR {type(exc).__name__}: {exc}")
            continue
        ray_sec = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:24} rows-only: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24} SQL-ERROR {type(exc).__name__}: {exc}")
            continue
        rc = "OK " if len(got) == len(exp) else f"ROWS {len(got)} vs {len(exp)}"
        hg, he = value_hash(got.copy()), value_hash(exp.copy())
        hc = "HASH-OK" if hg == he else "HASH-MISMATCH"
        print(f"{name:24} {rc} {hc}  {ray_sec:6.2f}s")
        if hg != he and len(got) == len(exp):
            g = got.reindex(sorted(got.columns), axis=1).sort_values(
                sorted(got.columns)).reset_index(drop=True)
            e = exp.reindex(sorted(exp.columns), axis=1).sort_values(
                sorted(exp.columns)).reset_index(drop=True)
            print("  got :", g.head(3).to_dict("records"))
            print("  want:", e.head(3).to_dict("records"))
    ray.shutdown()


if __name__ == "__main__":
    main()
