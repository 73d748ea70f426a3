"""Local simulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same sf dir, compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified). Exit 0 iff all match.

Usage: python scripts/check_oracles.py [--json OUT.json] [sf_dir] [only_query ...]

``--json`` writes a per-query artifact (name, wall, rows, hash outcome)
so every round ships a checked-in full-surface gate record (VERDICT r4
#8) instead of relying on the driver's 13-query sample.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return repr(int(f))
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> tuple:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "\x1f".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(pdf), tuple(cols), h


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracles.py [sf_dir] [query ...] "
                  "[--json OUT.json]", file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from search_engine_spark.session import build_session

    spark = build_session(cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                          shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, rows_only, records = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            records.append({"name": name, "outcome": "spark_error",
                            "err": str(e)[:300],
                            "wall_s": round(time.time() - t0, 2)})
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"[rows-only] {name}: {len(spdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            records.append({"name": name, "outcome": "rows_only",
                            "rows": len(spdf),
                            "wall_s": round(time.time() - t0, 2)})
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL] {name}: oracle error: {e}")
            records.append({"name": name, "outcome": "oracle_error",
                            "err": str(e)[:300],
                            "wall_s": round(time.time() - t0, 2)})
            continue
        sh, oh = frame_hash(spdf), frame_hash(opdf)
        ok = sh == oh
        status = "ok" if ok else "MISMATCH"
        print(f"[{status}] {name}: spark={sh} oracle={oh} "
              f"({time.time()-t0:.1f}s)")
        records.append({"name": name,
                        "outcome": "ok" if ok else "mismatch",
                        "rows": sh[0], "hash": sh[2],
                        "oracle_rows": oh[0], "oracle_hash": oh[2],
                        "wall_s": round(time.time() - t0, 2)})
        if not ok:
            failures.append((name, f"spark={sh} oracle={oh}"))
            # show a small diff for debugging
            try:
                sc = spdf[sorted(spdf.columns)]
                oc = opdf[sorted(opdf.columns)]
                print("  spark head:\n", sc.sort_values(list(sc.columns))
                      .head(5).to_string())
                print("  oracle head:\n", oc.sort_values(list(oc.columns))
                      .head(5).to_string())
            except Exception:
                pass
    print(f"\n{len(failures)} failures; rows-only: {rows_only}")
    if json_out:
        n_ok = sum(1 for r in records if r["outcome"] == "ok")
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(records),
                       "n_ok": n_ok, "n_rows_only": len(rows_only),
                       "n_failures": len(failures),
                       "queries": records}, f, indent=1)
        print(f"wrote {json_out}: {n_ok}/{len(records)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
