"""Pre-flight the driver's correctness gate locally: run the first N
registry keys (the driver window) at a given SF against the DuckDB
oracle, reporting row-count / schema / value matches per key.

Usage: python tools/preflight.py [sf_dir] [n_keys] [key ...]
  With explicit key names, checks exactly those keys instead of the
  window prefix.

Staleness audit (no Spark started):
  python tools/preflight.py --stalest N [--check]
    Reads every CORRECTNESS_r*.json, prints the N registry keys with the
    oldest (or no) driver row, and warns about any of them NOT inside
    the current 50-key window prefix — the rotation-debt self-audit the
    builder runs before the driver window lands.  With --check, also
    runs those N keys against the oracle (requires Spark).
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def _rows_close(g, w):
    for a, b in zip(g, w):
        if isinstance(a, float) and isinstance(b, float):
            if not math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6):
                return False
        elif a != b:
            return False
    return True


WINDOW = 50  # the driver gates the first WINDOW registry keys


def staleness(registry_keys):
    """(key -> latest driver round or None), from CORRECTNESS_r*.json."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    return {k: latest.get(k) for k in registry_keys}


def stalest_keys(n):
    """The n registry keys owed a driver row soonest: never-checked
    first (registry order), then ascending latest-round."""
    import __spark_entry__ as entry_mod

    keys = list(entry_mod.queries())
    rounds = staleness(keys)
    pos = {k: i for i, k in enumerate(keys)}
    ranked = sorted(keys, key=lambda k: (rounds[k] is not None,
                                         rounds[k] or 0, pos[k]))
    window = set(keys[:WINDOW])
    print(f"registry {len(keys)} keys, window {WINDOW}; "
          f"{sum(1 for k in keys if rounds[k] is None)} never checked")
    out = ranked[:n]
    for k in out:
        r = rounds[k]
        tag = "NEVER" if r is None else f"r{r:02d}"
        note = "" if k in window else "  <-- NOT in current window"
        print(f"  {tag}  {k}{note}")
    missing = [k for k in out if k not in window]
    if missing:
        print(f"\nWARNING: {len(missing)}/{n} stalest keys are outside "
              f"the window prefix — rotate queries() before the driver "
              f"runs.")
    else:
        print(f"\nOK: all {n} stalest keys are inside the window prefix.")
    return out, bool(missing)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--stalest":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else WINDOW
        keys, missing = stalest_keys(n)
        if "--check" not in sys.argv:
            sys.exit(1 if missing else 0)
        sys.argv = [sys.argv[0], "/root/testdata/sf0.01", str(n)] + keys

    import duckdb
    import __spark_entry__ as entry_mod
    from scardina_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    keys = sys.argv[3:] or list(queries)[:n]

    spark = get_spark("scardina-preflight")
    duck = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            duck.sql(f"create view {t} as select * from '{p}'")

    import time
    bad = 0
    for k in keys:
        t0 = time.time()
        try:
            df = queries[k](spark, sf_dir)
            cols = df.columns
            got = _canon([r.asDict() for r in df.collect()], cols)
            if k not in oracles:
                print(f"{k}: ROWS-ONLY rows={len(got)} "
                      f"({time.time()-t0:.1f}s)")
                continue
            res = duck.sql(oracles[k])
            oc = [d[0] for d in res.description]
            schema_ok = sorted(oc) == sorted(cols)
            want = _canon([dict(zip(oc, r)) for r in res.fetchall()], cols) \
                if schema_ok else []
            rows_ok = len(got) == len(want)
            vals_ok = rows_ok and all(
                _rows_close(g, w) for g, w in zip(got, want))
            ok = schema_ok and rows_ok and vals_ok
            bad += 0 if ok else 1
            print(f"{k}: {'PASS' if ok else 'FAIL'} "
                  f"rows={len(got)}/{len(want)} schema={schema_ok} "
                  f"vals={vals_ok} ({time.time()-t0:.1f}s)")
        except Exception as e:
            bad += 1
            print(f"{k}: ERROR {type(e).__name__}: {e}")
    print(f"\n{len(keys) - bad}/{len(keys)} green")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
