#!/usr/bin/env python3
"""Local driver-mimic: compare Verify.scala parquet dumps against the DuckDB
oracle, the same way the round driver does (column-name sort, row/schema/value
compare). Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]"""
import sys, glob, os, json
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    rows_only = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            rows_only.append((name, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ok = True
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); ok = False
        else:
            g, e = got[gcols], exp[ecols]
            def norm(v):
                if hasattr(v, "tolist"):
                    v = v.tolist()
                if isinstance(v, list):
                    return tuple(norm(x) for x in v)
                return v
            def same(a, b):
                # Driver-strict: the driver hashes rendered values, so
                # 5.0 (float) vs 5 (int) must NOT compare equal. Require
                # identical Python types after numpy->python conversion,
                # recursively through array values.
                if a is None or b is None:
                    return a is None and b is None
                if isinstance(a, float) and isinstance(b, float):
                    return a == b or (a != a and b != b)
                if type(a) is not type(b):
                    return False
                if isinstance(a, tuple):
                    return len(a) == len(b) and all(
                        same(x, y) for x, y in zip(a, b))
                return a == b
            for c in gcols:
                gv, ev = [norm(x) for x in g[c]], [norm(x) for x in e[c]]
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev))
                       if not same(a, b)]
                if bad:
                    i, a, b = bad[0]
                    print(f"FAIL {name}: col {c} differs at row {i}: "
                          f"{a!r} ({type(a).__name__}) vs {b!r} ({type(b).__name__}); "
                          f"{len(bad)}/{len(gv)} rows differ")
                    ok = False
                    break
                # dtype check: int-kind vs float-kind divergence is how the
                # doc_pack HUGEINT->float64 bug shipped; fail, don't warn.
                gk, ek = g[c].dtype.kind, e[c].dtype.kind
                if gk != ek and {gk, ek} <= {"i", "u", "f"} and not (
                        {gk, ek} <= {"i", "u"}):
                    print(f"FAIL {name}: col {c} dtype kind {g[c].dtype} vs "
                          f"{e[c].dtype} (int/float divergence)")
                    ok = False
                    break
                if str(g[c].dtype) != str(e[c].dtype):
                    print(f"WARN {name}: col {c} dtype {g[c].dtype} vs {e[c].dtype}")
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    for name, n in rows_only:
        print(f"ROWS-ONLY {name}: {n} rows" + (" (EMPTY!)" if n == 0 else ""))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)

main()
