#!/usr/bin/env python3
"""Scale-sized variant of check.py: exact MULTISET equality computed
inside DuckDB (EXCEPT ALL both directions over name-ordered columns)
instead of fetching every row into Python. check.py's row loop is the
right gate at sf0.01 (it also reports near-miss diagnostics), but at
sf1 a single 5M-row query costs it ~20 min of pure-Python canon; this
runs the same comparison as SQL in seconds.

Usage: python3 tools/check_fast.py [--timeout SEC] <sfdir> <verify_outdir> [name ...]
--timeout interrupts any single entry's DuckDB work after SEC seconds
and reports it as TIMEOUT (exit stays nonzero) instead of hanging the
whole sweep on one intractable oracle — those entries then go through
the GenSample route (sampled corpus, same compare) instead.
(driver-side tooling only — not part of the Scala library)
"""
import sys, json, os, threading
import duckdb


def main():
    args = sys.argv[1:]
    timeout = None
    tmpdir = os.environ.get("CHECK_FAST_TMPDIR")
    memlimit = os.environ.get("CHECK_FAST_MEMLIMIT")
    tmpcap = os.environ.get("CHECK_FAST_TMPCAP")
    while args and args[0] in ("--timeout", "--tmp", "--mem", "--tmpcap"):
        if args[0] == "--timeout":
            timeout = float(args[1])
        elif args[0] == "--tmp":      # DuckDB spill dir (default: cwd/.tmp
            tmpdir = args[1]          # — round 14 filled the root fs there)
        elif args[0] == "--tmpcap":
            tmpcap = args[1]          # e.g. "40GB"
        else:
            memlimit = args[1]        # e.g. "48GB"
        args = args[2:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    if tmpdir:
        os.makedirs(tmpdir, exist_ok=True)
        con.sql(f"SET temp_directory='{tmpdir}'")
        # DuckDB snapshots the dir's free space at connect time as the
        # temp cap — a transiently-full disk silently pins the cap low
        # (seen: 17.5 GiB on a 118 GiB tmpfs). Default the explicit cap
        # to min(90% of the temp filesystem's TOTAL size, free space at
        # connect + 2 GiB slack): the total-size term alone would, on a
        # volume already substantially occupied by durable data, still
        # let a big spill fill the disk — the free-space term bounds the
        # cap by what the volume can actually absorb, and the slack only
        # covers transient dips at the statvfs instant (not a constant —
        # a hardcoded 90GB on a smaller volume would DISABLE the
        # disk-safety cap entirely); --tmpcap / CHECK_FAST_TMPCAP
        # override for shared volumes where even this is too generous.
        if not tmpcap:
            st = os.statvfs(tmpdir)
            total = st.f_frsize * st.f_blocks
            free = st.f_frsize * st.f_bavail
            cap = min(0.9 * total, free + 2 * 2**30)
            tmpcap = f"{int(cap / 2**30)}GB"
        con.sql(f"SET max_temp_directory_size='{tmpcap}'")
    if memlimit:
        con.sql(f"SET memory_limit='{memlimit}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{outdir}/{name}"
        if not os.path.isdir(pdir):
            print(f"✗ {name}: MISSING_SPARK_OUTPUT"); bad += 1; continue
        timer = None
        timed_out = [False]
        # done + lock close the timer race entirely: the timer checks
        # done and interrupts UNDER the lock, and the main thread sets
        # done under the same lock, so the timer can never pass the
        # done check just before the main thread sets it and then
        # con.interrupt() the SHARED connection into the NEXT entry's
        # query (a flaky false ERR in sweeps — the bare done-flag
        # version only narrowed that window).
        done = [False]
        done_lock = threading.Lock()
        if timeout:
            def interrupt():
                with done_lock:
                    if done[0]:
                        return
                    timed_out[0] = True
                    con.interrupt()
            timer = threading.Timer(timeout, interrupt)
            timer.start()
        try:
            sp = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
            cols = ", ".join(f'"{c}"' for c in sorted(sp.columns))
            con.sql(f"CREATE OR REPLACE TEMP VIEW _sp AS "
                    f"SELECT {cols} FROM '{pdir}/*.parquet'")
            con.sql(f"CREATE OR REPLACE TEMP VIEW _du AS "
                    f"SELECT {cols} FROM ({sql})")
            n_sp = con.sql("SELECT count(*) FROM _sp").fetchone()[0]
            n_du = con.sql("SELECT count(*) FROM _du").fetchone()[0]
            if n_sp != n_du:
                print(f"✗ {name}: ROWS spark={n_sp} oracle={n_du}")
                bad += 1; continue
            # two one-sided EXCEPT ALLs = exact multiset equality
            # (row counts already matched, so one empty side implies
            # the other, but both are cheap and the symmetry is free
            # insurance against NULL-handling surprises)
            d1 = con.sql("SELECT count(*) FROM "
                         "(SELECT * FROM _sp EXCEPT ALL SELECT * FROM _du)"
                         ).fetchone()[0]
            d2 = con.sql("SELECT count(*) FROM "
                         "(SELECT * FROM _du EXCEPT ALL SELECT * FROM _sp)"
                         ).fetchone()[0]
        except Exception as e:
            with done_lock:
                done[0] = True
            if timer: timer.cancel()
            if timed_out[0]:
                print(f"✗ {name}: TIMEOUT after {timeout:.0f}s (oracle intractable at this scale)")
            else:
                print(f"✗ {name}: ERR {str(e)[:200]}")
            bad += 1; continue
        with done_lock:
            done[0] = True
        if timer: timer.cancel()
        if d1 == 0 and d2 == 0:
            print(f"✓ {name}: OK ({n_sp} rows)"); ok += 1
        else:
            print(f"✗ {name}: DIFF spark-only={d1} oracle-only={d2} of {n_sp}")
            bad += 1
    print(f"\n{ok}/{ok + bad} multiset-exact")
    sys.exit(0 if bad == 0 else 1)


main()
