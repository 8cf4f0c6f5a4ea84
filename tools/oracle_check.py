#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name>.parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views over
<sfDir>/*.parquet), sorts columns by name and rows by all columns, and
compares cell-by-cell (exact; floats must already be rounded engine-side).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def pq(path: str) -> str:
    """Parquet read pattern for either layout: the driver drops single files
    (sf0.1 and below); Spark-written scale-up tables (GenScale) are
    directories of part files."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def _fast_equal(con, got_src: str, sql: str) -> tuple:
    """Multiset compare inside DuckDB: row count + sum of per-row hashes over
    VARCHAR-normalized, name-sorted columns. Exactly as strict as the pandas
    path for this catalog (every float is engine-rounded, both sides render
    through the same DuckDB value-to-string rules) but runs at engine speed —
    the pandas astype(str) compare is minutes per 10M-row result at sf10.

    Caveat (accepted): this is a pre-filter whose PASS is probabilistic —
    a sum-of-64-bit-hashes collision, or a value containing the chr(31)/
    chr(0) sentinel bytes, could false-PASS, and a collision-pass never
    reaches the strict pandas path. Collision odds are ~2^-64 per query;
    the catalog's values are numeric/ASCII so the sentinel bytes do not
    occur. A FAIL is always re-checked by the strict path, so no false
    FAILs. Returns (ok, detail)."""
    def cols(src):
        return sorted(r[0] for r in con.execute(f"DESCRIBE {src}").fetchall())
    gc, wc = cols(got_src), cols(f"({sql})")
    if gc != wc:
        return False, f"columns {gc} != {wc}"
    def sig(src, names):
        rendered = ", ".join(
            'coalesce(CAST("%s" AS VARCHAR), chr(0))' % c for c in names)
        cnt, h = con.execute(
            f"SELECT count(*), sum(CAST(hash(concat_ws(chr(31), {rendered})) "
            f"AS HUGEINT)) FROM {src}").fetchone()
        return cnt, h
    gn, gh = sig(got_src, gc)
    wn, wh = sig(f"({sql})", wc)
    if gn != wn:
        return False, f"rows {gn} != {wn}"
    if gh != wh:
        return False, None  # caller re-runs the slow path to print diffs
    return True, gn


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # big scale-up sweeps run concurrently with the Spark side; cap DuckDB's
    # parallelism (and let it spill) instead of fighting for every core
    threads = os.environ.get("ORACLE_THREADS")
    if threads:
        con.execute(f"SET threads = {int(threads)}")
    # DuckDB's default limit (80% of RAM) invites the kernel OOM killer when
    # Spark JVMs share the host during a scale-up sweep; cap it and let the
    # temp_directory absorb the difference
    mem = os.environ.get("ORACLE_MEMORY")
    if mem:
        con.execute(f"SET memory_limit = '{mem}'")
    # PER-PROCESS spill dir (r12): two concurrent oracle processes sharing
    # one fixed temp_directory clobber each other's spill files — observed
    # as "Could not read enough bytes from duckdb_temp_storage" and
    # garbage-size "Cannot resize vector to N PiB" failures when an sf10
    # retry overlapped the sf30 sweep. Same lesson as the r11 mktemp
    # scratch log, one layer down.
    # best-effort reap of spill dirs left by SIGKILLed runs (ADVICE r12:
    # oracle_sweep's timeout kills leave one stale dir per attempt and
    # nothing else ever cleans them) — a dir whose pid is no longer alive
    # is garbage by construction; live concurrent runs are untouched
    import shutil
    for d in os.listdir("/tmp"):
        if d.startswith("duckdb_oracle_spill_"):
            pid = d.rsplit("_", 1)[-1]
            if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(f"/tmp/{d}", ignore_errors=True)
    con.execute(
        f"SET temp_directory = '/tmp/duckdb_oracle_spill_{os.getpid()}'")
    # row order is irrelevant (both compare paths sort); letting DuckDB drop
    # insertion-order preservation unlocks streaming execution for the
    # list-heavy ANN oracles, whose order-preserving buffering is what blew
    # a 48 GB memory_limit into a 130 GB RSS OOM kill on the sf10 sweep
    con.execute("SET preserve_insertion_order = false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pq(f'{sf_dir}/{t}.parquet')}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    fast = os.environ.get("ORACLE_FAST") == "1"
    # targeted re-checks / resume of an interrupted big-SF sweep:
    # comma-separated include list of query names
    only = os.environ.get("ORACLE_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        oracle = {k: v for k, v in oracle.items() if k in names}
    # mirror of Verify's SPARK_GRAFT_VERIFY_SKIP: hold out queries whose
    # result was deliberately not dumped (quadratic-output ground-truth
    # twins at big SF); each use must be justified in BENCH_NOTES
    skip = os.environ.get("ORACLE_SKIP")
    if skip:
        names = {n.strip() for n in skip.split(",") if n.strip()}
        oracle = {k: v for k, v in oracle.items() if k not in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            if fast:
                src = f"(SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet'))"
                ok, detail = _fast_equal(con, src, sql)
                if ok:
                    print(f"PASS {name} ({detail} rows)")
                    n_pass += 1
                    continue
                if detail is not None:
                    raise AssertionError(detail)
                # hash mismatch: fall through to the pandas path for diffs
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            if list(got.columns) != list(want.columns):
                raise AssertionError(
                    f"columns {list(got.columns)} != {list(want.columns)}")
            if len(got) != len(want):
                raise AssertionError(f"rows {len(got)} != {len(want)}")
            gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
            # exact compare; engine must have rounded floats already
            diff = (gs.astype(str) != ws.astype(str))
            if diff.any().any():
                bad = diff.any(axis=1)
                raise AssertionError(
                    "value mismatch, first diffs:\n"
                    f"got:\n{gs[bad].head(3)}\nwant:\n{ws[bad].head(3)}")
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {str(e)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
