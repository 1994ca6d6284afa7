#!/usr/bin/env python3
"""Dev-only harness replicating the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB with views over the same parquet tables, and
compares values (sorted columns, sorted rows, exact match; float equality is
exact to mirror hash-matching).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def numeric_kind(a: np.ndarray) -> str:
    """Classify a column the way the driver's hash distinguishes values:
    int-family, float, bool, temporal (dates/timestamps hash by value), or
    object (strings, Decimal, arrays...).  Object columns are sub-classified by
    their first non-null element so Decimal-vs-float and date-vs-string
    mismatches are caught."""
    k = a.dtype.kind
    if k in 'iu':
        return 'int'
    if k == 'f':
        return 'float'
    if k == 'b':
        return 'bool'
    if k in 'mM':
        return 'temporal'
    if k == 'O':
        import decimal, datetime
        first = next((x for x in a if x is not None and not (isinstance(x, float) and pd.isna(x))), None)
        if isinstance(first, decimal.Decimal):
            return 'decimal'
        if isinstance(first, (datetime.date, datetime.datetime, pd.Timestamp)):
            return 'temporal'
        if isinstance(first, bool):
            return 'bool'
        if isinstance(first, (int, np.integer)):
            return 'int'
        if isinstance(first, (float, np.floating)):
            return 'float'
    return 'object'

def iso_strings(a: np.ndarray) -> list:
    out = []
    for x in a:
        if x is None or (isinstance(x, float) and pd.isna(x)) or x is pd.NaT:
            out.append(None)
        else:
            ts = pd.Timestamp(x)
            # dates normalize to midnight timestamps on both sides
            out.append(ts.isoformat())
    return out

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pq = os.path.join(outdir, name)
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(pq)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            ka, kb = numeric_kind(a), numeric_kind(b)
            # The driver's hash is dtype-sensitive: an int64 column on one side
            # and float64 on the other (DuckDB HUGEINT/DECIMAL -> float64 via
            # .df()) hash-differ even when values are numerically equal.  Fail
            # loudly on kind mismatches instead of silently coercing.
            if ka != kb:
                print(f"FAIL {name}: column {c} dtype-kind mismatch "
                      f"spark={ka}({a.dtype}) duckdb={kb}({b.dtype}) — driver hash would differ")
                ok = False
                break
            try:
                if ka == 'float':
                    af, bf = a.astype('f8'), b.astype('f8')
                    eq = (np.array_equal(af, bf, equal_nan=True)
                          and np.array_equal(np.signbit(af), np.signbit(bf)))
                    if not eq and np.array_equal(af, bf, equal_nan=True):
                        print(f"FAIL {name}: column {c} float signbit differs (-0.0 vs 0.0)")
                        ok = False
                        break
                elif ka == 'temporal':
                    eq = iso_strings(a) == iso_strings(b)
                else:
                    eq = (pd.Series(a).astype(object).where(pd.notna(a), None).tolist() ==
                          pd.Series(b).astype(object).where(pd.notna(b), None).tolist())
            except Exception:
                eq = a.tolist() == b.tolist()
            if not eq:
                idx = next((i for i in range(len(a)) if (a[i] != b[i]) and not (pd.isna(a[i]) and pd.isna(b[i]))), None)
                print(f"FAIL {name}: column {c} differs; first diff row {idx}: "
                      f"spark={a[idx] if idx is not None else '?'} duckdb={b[idx] if idx is not None else '?'} "
                      f"(dtypes {a.dtype}/{b.dtype})")
                ok = False
                break
        if ok:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
