#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (driver-side tooling only;
not part of the engine). Compares graft.Verify parquet dumps against the
DuckDB oracle SQL in oracle_sql.json.

Usage: verify_local.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    """Sort columns by name, then rows; stringify cells. Returns the
    column order, sorted rows, and a count of NEGATIVE-ZERO cells —
    signed zeros hash differently across engines ('-0.0' vs '0.0' repr)
    and any appearance is latent red even while the row sets match
    (round-10 q108/q109: green at sf0.01, red at sf0.1)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    neg_zero = 0
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    if v == 0.0 and math.copysign(1.0, v) < 0:
                        neg_zero += 1
                    rr.append(repr(round(v, 9)))
            else:
                rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out, neg_zero

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # Oracle type lint: an uncast aggregate-derived column types HUGEINT
    # (int128) in DuckDB while Spark emits int64 — the driver's typed-value
    # hash then mismatches with IDENTICAL numbers (round-9 q148). DESCRIBE
    # is plan-only (no execution), so linting every oracle is cheap; any
    # HUGEINT column is a red gate here before it can go red on the driver.
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE failed: {e}")
            n_bad += 1
            continue
        huge = [c for c, t, *_ in desc if "HUGEINT" in t.upper()]
        if huge:
            print(f"FAIL {name}: HUGEINT oracle columns {huge} — "
                  f"CAST the aggregate to BIGINT in the oracle SQL")
            n_bad += 1
    try:
        failed = json.load(open(f"{out_dir}/failed.json"))
    except FileNotFoundError:
        failed = {}
    for name, msg in sorted(failed.items()):
        # (msg.splitlines() or ['']) — getMessage can be an empty string,
        # and an empty failure message must not crash the gate itself
        print(f"FAIL {name}: query threw during Verify: {(msg.splitlines() or [''])[0][:200]}")
        n_bad += 1
    for name, sql in sorted(oracle.items()):
        if name in failed:
            continue  # already reported red above
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols, g_rows, g_nz = canon(got.fetchall(), [d[0] for d in got.description])
            exp = con.execute(sql)
            e_cols, e_rows, e_nz = canon(exp.fetchall(), [d[0] for d in exp.description])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if g_nz or e_nz:
            print(f"WARN {name}: negative-zero cells (engine {g_nz}, oracle "
                  f"{e_nz}) — latent signed-zero flake; normalize the emitted "
                  f"column with '+ 0' on BOTH engines (the q127 rule)")
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}")
            n_bad += 1
        elif g_rows != e_rows:
            diff = [(a, b) for a, b in zip(g_rows, e_rows) if a != b]
            print(f"FAIL {name}: {len(g_rows)} vs {len(e_rows)} rows; "
                  f"first diffs: {diff[:3]}"
                  + (f" extra_got={g_rows[len(e_rows):][:2]}" if len(g_rows) > len(e_rows) else "")
                  + (f" extra_exp={e_rows[len(g_rows):][:2]}" if len(e_rows) > len(g_rows) else ""))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
