#!/usr/bin/env python3
"""Gate for bench artifacts: refuse any artifact that is not a clean
measurement, so contaminated numbers are STRUCTURALLY unusable downstream
(SCALE.md slope math, round-over-round deltas, BENCH_NOTES adjudications).

An artifact is refused when:
  - `failed` is non-empty (a query raised; since r14 its timing is null);
  - any per-query timing is null (failed-on-some-pass sentinel);
  - `load1m_start` exceeds the idle bar (default 1.0; override with
    --max-load for deliberately-loaded adjudication runs, which must then
    say so wherever the number is used).

Usage:
  python3 tools/bench_check.py BENCH_LOCAL_sf30.json [more.json ...]
  python3 tools/bench_check.py --max-load 4.0 loaded_run.json
  python3 tools/bench_check.py --selftest    # negative tests of this gate

Exit 0 = every artifact is clean; exit 1 = at least one refusal (reasons on
stderr). Use it before ANY cross-artifact arithmetic.
"""
import argparse
import json
import sys


def check(doc, max_load):
    """Return a list of refusal reasons (empty = clean)."""
    reasons = []
    failed = doc.get("failed", [])
    if failed:
        reasons.append(f"failed queries present: {failed}")
    nulls = [k for k, v in doc.get("queries", {}).items() if v is None]
    if nulls:
        reasons.append(f"null timings (failed on some pass): {nulls}")
    load = doc.get("load1m_start")
    if load is None:
        reasons.append("no load1m_start stamp (pre-r11 artifact?)")
    elif load > max_load:
        reasons.append(
            f"host not idle at start: load1m_start={load} > {max_load}")
    return reasons


def selftest():
    clean = {"load1m_start": 0.2, "failed": [],
             "queries": {"q1": 1.0, "q2": 2.0}}
    assert check(clean, 1.0) == [], "clean artifact must pass"
    bad_failed = dict(clean, failed=["q9"])
    assert any("failed queries" in r for r in check(bad_failed, 1.0)), \
        "non-empty failed must refuse"
    bad_null = dict(clean, queries={"q1": 1.0, "q2": None})
    assert any("null timings" in r for r in check(bad_null, 1.0)), \
        "null timing must refuse"
    bad_load = dict(clean, load1m_start=2.2)
    assert any("not idle" in r for r in check(bad_load, 1.0)), \
        "loaded start must refuse"
    assert check(bad_load, 4.0) == [], "--max-load override must admit it"
    no_stamp = {"failed": [], "queries": {"q1": 1.0}}
    assert any("load1m_start" in r for r in check(no_stamp, 1.0)), \
        "missing load stamp must refuse"
    print("bench_check selftest: 5/5 refusal paths OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="*")
    ap.add_argument("--max-load", type=float, default=1.0)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()
    if args.selftest:
        selftest()
        return 0
    if not args.artifacts:
        ap.error("no artifacts given")
    bad = 0
    for path in args.artifacts:
        with open(path) as f:
            # artifacts are one JSON object per line; take the total_detail
            # line (the only one with a queries map) or the sole line
            docs = [json.loads(line) for line in f if line.strip()]
        doc = next((d for d in docs if d.get("metric") == "total_detail"),
                   docs[-1])
        reasons = check(doc, args.max_load)
        if reasons:
            bad += 1
            for r in reasons:
                print(f"REFUSED {path}: {r}", file=sys.stderr)
        else:
            print(f"ok {path}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
