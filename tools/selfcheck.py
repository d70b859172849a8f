"""Driver-style correctness self-check: run every queries() entry and
compare against oracle_sql() via DuckDB (row count, column names, and an
order-insensitive value hash), like the driver's t2 gate.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()[:16]


def duplicate_literal_keys(func_name: str) -> list[str]:
    """String keys appearing more than once in any dict literal inside
    the named top-level function of __ray_entry__.py.  Python silently
    keeps the LAST value for a duplicated key, which would mask a
    dropped query (judge r4 item 2) — so the sweep hard-fails on any."""
    import ast
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__ray_entry__.py")
    tree = ast.parse(open(path).read())
    dups: list[str] = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            for d in ast.walk(node):
                if isinstance(d, ast.Dict):
                    seen: set[str] = set()
                    for k in d.keys:
                        if isinstance(k, ast.Constant) and isinstance(k.value, str):
                            if k.value in seen:
                                dups.append(k.value)
                            seen.add(k.value)
    return dups


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    import __ray_entry__ as E
    for fname in ("queries", "oracle_sql"):
        dups = duplicate_literal_keys(fname)
        assert not dups, f"duplicate keys in {fname}() dict literal: {dups}"
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(df)} (rows-only, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        a, b = normalize(df), normalize(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        ha, hb = value_hash(a), value_hash(b)
        if ha != hb:
            print(f"FAIL {name}: value hash {ha} vs {hb}")
            diff = (a != b)
            for c in a.columns:
                if diff[c].any():
                    i = diff[c].idxmax()
                    print(f"    first diff col={c} row={i}: {a[c][i]!r} vs {b[c][i]!r}")
            failures += 1
            continue
        print(f"ok   {name}: rows={len(a)} hash={ha}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
