#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Spark parquet
dumps produced by `graft.Verify`. Exact-value compare (floats must be
bit-identical unless rounded in both queries).

Usage: oracle_check.py [SF_DIR] [VERIFY_OUT] [--json PATH] [--only a,b,c]

--json PATH   also write a machine-readable per-query artifact, stamped
              with the git SHA + sf dir (provenance for the self-evidence
              chain).
--only NAMES  comma-separated subset of oracle queries to check (local
              iteration after a subset `graft.Verify` run)."""
import sys, json, glob, os, time, subprocess
import duckdb
import pandas as pd
import numpy as np


def flag_with_value(argv, flag):
    """Extract `flag VALUE` from argv; usage error when VALUE is missing
    (a bare trailing flag used to raise an unhandled IndexError)."""
    if flag not in argv:
        return None
    i = argv.index(flag)
    if i + 1 >= len(argv):
        print(f'usage error: {flag} requires a value\n\n' + __doc__)
        sys.exit(2)
    v = argv[i + 1]
    del argv[i:i + 2]
    return v


argv = list(sys.argv[1:])
json_out = flag_with_value(argv, '--json')
only = flag_with_value(argv, '--only')
only = set(only.split(',')) if only else None
sf = argv[0] if len(argv) > 0 else '/root/testdata/sf0.01'
out = argv[1] if len(argv) > 1 else '/tmp/verify_out'

con = duckdb.connect()
for p in sorted(glob.glob(f'{sf}/*.parquet')):
    name = os.path.basename(p).replace('.parquet', '')
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
failures = 0
results = {}
oracle_secs = {}
def record(name, ok, detail):
    results[name] = {'ok': ok, 'detail': detail}
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    sql = oracle[name]
    spark_dir = f'{out}/{name}'
    parts = glob.glob(f'{spark_dir}/*.parquet')
    if not parts:
        print(f'{name}: MISSING spark output'); failures += 1
        record(name, False, 'MISSING spark output'); continue
    try:
        t0 = time.monotonic()
        exp = con.sql(sql).df()
        oracle_secs[name] = time.monotonic() - t0
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); failures += 1
        record(name, False, f'ORACLE ERROR {e}'); continue
    got = duckdb.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    # driver-style: columns sorted by name, rows sorted by all columns
    exp = exp[sorted(exp.columns)]
    got_cols = sorted(got.columns)
    if sorted(exp.columns) != got_cols:
        print(f'{name}: SCHEMA MISMATCH spark={got_cols} oracle={sorted(exp.columns)}')
        failures += 1
        record(name, False, f'SCHEMA MISMATCH spark={got_cols} oracle={sorted(exp.columns)}'); continue
    got = got[got_cols]
    ek = exp.sort_values(by=list(exp.columns), na_position='first').reset_index(drop=True)
    gk = got.sort_values(by=list(got.columns), na_position='first').reset_index(drop=True)
    if len(ek) != len(gk):
        print(f'{name}: ROWCOUNT got={len(gk)} exp={len(ek)}'); failures += 1
        record(name, False, f'ROWCOUNT got={len(gk)} exp={len(ek)}'); continue
    bad = []
    for c in ek.columns:
        e, g = ek[c], gk[c]
        if e.dtype.kind == 'f' or g.dtype.kind == 'f':
            both_nan = e.isna() & g.isna()
            eq = (e == g) | both_nan
        else:
            eq = (e == g) | (e.isna() & g.isna())
        if not eq.all():
            idx = (~eq).idxmax()
            detail = f'row{idx}: got={gk[c][idx]!r} exp={ek[c][idx]!r}'
            if e.dtype.kind == 'f':
                diff = (pd.to_numeric(e, errors='coerce') - pd.to_numeric(g, errors='coerce')).abs().max()
                detail += f' maxabsdiff={diff}'
            bad.append(f'col {c} {detail} ({int((~eq).sum())} rows differ)')
    if bad:
        print(f'{name}: VALUE MISMATCH ' + '; '.join(bad)); failures += 1
        record(name, False, 'VALUE MISMATCH ' + '; '.join(bad))
    else:
        print(f'{name}: OK ({len(ek)} rows)')
        record(name, True, f'OK ({len(ek)} rows)')
print('FAILURES:', failures)
# the DuckDB side is unmeasured in the driver gate and will eventually
# become its bottleneck as queries grow — surface the heavy replays
slowest = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
if slowest:
    print('slowest oracle replays: ' +
          ', '.join(f'{n}={s:.1f}s' for n, s in slowest))
if json_out:
    try:
        sha = subprocess.run(['git', 'rev-parse', 'HEAD'],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))
                             ).stdout.strip() or None
    except Exception:
        sha = None
    with open(json_out, 'w') as f:
        json.dump({'sf': sf, 'git_sha': sha,
                   'total': len(results), 'ok': len(results) - failures,
                   'failures': failures,
                   'slowest_oracle_sec': {n: round(s, 2) for n, s in slowest},
                   'queries': results}, f, indent=0, sort_keys=True)
    print(f'wrote {json_out}')
sys.exit(1 if failures else 0)
