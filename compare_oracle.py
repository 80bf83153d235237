#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle gate (driver-side deps only;
NOT part of the library). Reads each /tmp/vout/<q> parquet, runs the matching
oracle_sql.json query in DuckDB over the same sf tables, and compares
rows / schema-width / values (doubles to 1e-9 rel, approx queries to the
BASELINE.md envelope when --approx-envelope)."""
import json, math, sys, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
ENV = 3 * 1.04 / math.sqrt(2 ** 16)  # approx envelope per BASELINE.md

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for q in sorted(oracles):
    files = glob.glob(f"{out}/{q}/*.parquet")
    if not files:
        fails.append((q, "no spark output")); continue
    got = con.execute(f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").fetchdf()
    try:
        exp = con.execute(oracles[q]).fetchdf()
    except Exception as e:
        fails.append((q, f"oracle SQL error: {e}")); continue
    # Spark writes UTC-adjusted timestamps (tz-aware after the NTZ source
    # normalization), the DuckDB oracle produces naive ones — same instants.
    # Strip tz on both sides before comparing, like the driver's gate.
    for df in (got, exp):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64") and \
                    getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        fails.append((q, f"columns differ: spark={gcols} oracle={ecols}")); continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        fails.append((q, f"row count: spark={len(g)} oracle={len(e)}")); continue
    # only sketch-estimate queries get the envelope; everything else exact
    approx = q.startswith(("q30_", "q31_", "q32_", "q33_", "q34_", "q36_"))
    ok, msg = True, ""
    for c in gcols:
        gv, ev = g[c], e[c]
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            if a is None or (isinstance(a, float) and math.isnan(a)):
                if b is None or (isinstance(b, float) and math.isnan(b)): continue
                ok, msg = False, f"{c}[{i}]: {a!r} vs {b!r}"; break
            if isinstance(a, float) or isinstance(b, float):
                if b == 0: same = a == 0
                else: same = abs(float(a) - float(b)) / max(abs(float(b)), 1e-12) < 1e-9
                if not same: ok, msg = False, f"{c}[{i}]: {a!r} vs {b!r}"; break
            elif hasattr(a, "__int__") and hasattr(b, "__int__") and approx:
                if b != 0 and abs(int(a) - int(b)) / abs(int(b)) > ENV:
                    ok, msg = False, f"{c}[{i}]: approx {a} vs exact {b} > envelope"; break
                elif b == 0 and a != 0:
                    ok, msg = False, f"{c}[{i}]: approx {a} vs exact 0"; break
            elif str(a) != str(b):
                ok, msg = False, f"{c}[{i}]: {a!r} vs {b!r}"; break
        if not ok: break
    if ok:
        exact = "envelope" if approx else "exact"
        passes.append((q, f"{len(g)} rows {exact}"))
    else:
        fails.append((q, msg))

declared = set(json.load(open(f"{out}/oracle_sql.json")))
for d in sorted(glob.glob(f"{out}/q*")):
    q = d.split("/")[-1]
    if q not in declared:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{q}/*.parquet')").fetchone()[0]
        skips.append((q, f"rows-only: {n} rows"))

print(f"== PASS ({len(passes)}) ==")
for q, m in passes: print(f"  {q}: {m}")
print(f"== ROWS-ONLY ({len(skips)}) ==")
for q, m in skips: print(f"  {q}: {m}")
print(f"== FAIL ({len(fails)}) ==")
for q, m in fails: print(f"  {q}: {m}")
sys.exit(1 if fails else 0)
