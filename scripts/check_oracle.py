#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and compare row sets (columns sorted by name).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes: timestamps -> ns, ints -> int64 where possible
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got_raw = pd.concat([pd.read_parquet(f) for f in files])
        exp_raw = con.sql(oracle[name]).df()
        # dtype pin: the driver's hash compare is dtype-sensitive. Every
        # oracle column must arrive as int64 / float64 / bool / object /
        # datetime BEFORE canon-normalization — a DuckDB HUGEINT (from
        # an uncast sum/window) lands as float64 while Spark writes
        # int64, failing the driver's hash even when values match; an
        # unsortable column (arrays) crashes the checker. Catch both
        # classes here: FAIL on any raw-dtype divergence between the
        # two sides, so the gate SQL gets an explicit CAST instead.
        for c in sorted(set(got_raw.columns) & set(exp_raw.columns)):
            gk, ek = got_raw[c].dtype.kind, exp_raw[c].dtype.kind
            num = set("iuf")
            # only the numeric class breaks the driver's hash (int64 vs
            # HUGEINT->float64); date-object vs datetime64 normalizes in
            # canon and passes the driver today
            if (gk in num or ek in num) and gk != ek:
                raise AssertionError(
                    f"dtype drift on col {c}: spark={got_raw[c].dtype} "
                    f"oracle={exp_raw[c].dtype} — CAST it in the oracle SQL")
            # float width drift (float32 vs float64) also diverges the
            # driver's hash; integer widths are safe (canon -> int64)
            if gk == "f" and ek == "f" and got_raw[c].dtype != exp_raw[c].dtype:
                raise AssertionError(
                    f"float width drift on col {c}: spark={got_raw[c].dtype} "
                    f"oracle={exp_raw[c].dtype} — CAST it in the oracle SQL")
            if gk == "O":
                gv = got_raw[c].dropna()
                if len(gv) and not isinstance(
                        gv.iloc[0], (str, bytes, int, float,
                                     __import__("datetime").date)):
                    raise AssertionError(
                        f"non-scalar object col {c} "
                        f"({type(gv.iloc[0]).__name__}) — project to a "
                        f"string/scalar form for the gate")
        got = canon(got_raw)
        exp = canon(exp_raw)
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    ok = True
    for c in got.columns:
        g, e = got[c].values, exp[c].values
        if pd.api.types.is_float_dtype(got[c]) or pd.api.types.is_float_dtype(exp[c]):
            if not np.allclose(g.astype(float), e.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                exact = (g == e) | (pd.isna(g) & pd.isna(e))
                print(f"FAIL {name}: col {c} mismatch, first diffs:")
                bad = np.where(~np.isclose(g.astype(float), e.astype(float), rtol=1e-9, atol=1e-9))[0][:5]
                for i in bad:
                    print(f"   row {i}: got={g[i]!r} exp={e[i]!r}")
                ok = False; break
        else:
            eq = (got[c].astype(str).values == exp[c].astype(str).values)
            if not eq.all():
                bad = np.where(~eq)[0][:5]
                print(f"FAIL {name}: col {c} mismatch:")
                for i in bad:
                    print(f"   row {i}: got={g[i]!r} exp={e[i]!r}")
                ok = False; break
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fails += 1

# queries with no oracle: just check output exists
all_qdirs = set(os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d))
for name in sorted(all_qdirs - set(oracle)):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
    print(f"INFO {name}: no oracle, rows={n}")

print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
