#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Runs each oracle_sql.json query in DuckDB against the sf parquet tables,
loads the corresponding Spark result parquet, sorts columns by name and
rows by all columns, and compares cell-by-cell.

A handful of queries have a declared PYTHON oracle instead of SQL
(PYTHON_ORACLES below): DuckDB 1.0 exposes no deflate, but this harness
is Python and Python has zlib, so the compression-ratio query is
independently recomputed here rather than left unchecked. The DuckDB-SQL
contract stays the rule; a python arm needs the same justification an
allowlist entry does.
"""
import json
import math
import sys
import zlib

import duckdb
import pandas as pd


def _compression_ratio_oracle(con, sf_dir: str) -> pd.DataFrame:
    """E32 replica: JDK Deflater(BEST_SPEED) == zlib level 1 (same
    wrapper, windowBits 15, memLevel 8, default strategy — verified
    byte-identical lengths on all docs at sf0.01 and sf0.1). The ratio
    rounds like JVM Math.round: floor(x*1e4 + 0.5)/1e4."""
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id").fetchdf()
    rows = []
    for _, d in docs.iterrows():
        raw = d["text"].encode("utf-8")
        comp = len(zlib.compress(raw, 1))
        rows.append((d["doc_id"], len(raw), comp,
                     math.floor(comp / max(len(raw), 1) * 1e4 + 0.5) / 1e4))
    return pd.DataFrame(rows,
                        columns=["doc_id", "raw_bytes", "deflate_bytes", "ratio"])


PYTHON_ORACLES = {
    "q_compression_ratio": _compression_ratio_oracle,
}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # python-oracle queries join the compare set when their Spark dump
    # exists (Verify subsets may exclude them); sql=None marks them
    import os
    for name in PYTHON_ORACLES:
        if name not in oracle and os.path.exists(f"{out_dir}/{name}"):
            oracle[name] = None
    n_pass = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        try:
            if sql is None:
                exp = canon(PYTHON_ORACLES[name](con, sf_dir))
            else:
                exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql failed: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not cells_equal(g, e):
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: col={c} row={i}: spark={g!r} oracle={e!r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass}/{len(oracle)} passed ==")
    sys.exit(0 if n_pass == len(oracle) else 1)

if __name__ == "__main__":
    main()
