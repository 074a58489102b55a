#!/usr/bin/env python3
"""Calibration-normalized comparison of two bench artifacts.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--top N]

Reads two `bench_full.json`-style artifacts (as written by `graft.Bench` via
SPARK_GRAFT_BENCH_OUT) and answers the question a raw total cannot: did the
plans move, or did the host? Protocol (see SCALE.md "bench calibration" and
memory note bench-ab-protocol):

  1. Sessions are normalized by the calibration query (min-of-5 q_sma runs at
     session start/end). ratio = (new_q / new_cal) / (old_q / old_cal), where
     cal = mean(start_sec, end_sec). If either artifact lacks calibration,
     raw ratios are reported and flagged as unnormalized.
  2. Ambient movement is the MEDIAN normalized ratio: uniform drift moves
     every query identically, so a real regression is a query whose ratio
     stands out from the median by >1.5x, not one whose raw time grew.
  3. shuffle_mb is compared unnormalized (bytes are host-independent): any
     query whose shuffle grew >20% and >8 MB is flagged as a plan-shape
     regression regardless of wall time.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def cal_of(art):
    c = art.get("calibration")
    if not c:
        return None
    vals = [c[k] for k in ("start_sec", "end_sec") if isinstance(c.get(k), (int, float))]
    return sum(vals) / len(vals) if vals else None


def selftest():
    """Synthetic A/B: uniform 2x ambient must NOT flag (exit 0); one query
    at 4x under the same ambient MUST flag (exit 1)."""
    import copy
    import subprocess
    import tempfile

    old = {"value": 10.0, "queries": {"a": 1.0, "b": 1.0, "c": 1.0},
           "shuffle_mb": {"a": 10.0},
           "calibration": {"query": "q", "runs": 5,
                           "start_sec": 1.0, "end_sec": 1.0}}
    amb = copy.deepcopy(old)
    amb["queries"] = {k: v * 2 for k, v in old["queries"].items()}
    amb["calibration"] = {"query": "q", "runs": 5,
                          "start_sec": 2.0, "end_sec": 2.0}
    reg = copy.deepcopy(amb)
    reg["queries"]["b"] = 4.0
    with tempfile.TemporaryDirectory() as td:
        paths = {}
        for name, art in [("old", old), ("amb", amb), ("reg", reg)]:
            paths[name] = f"{td}/{name}.json"
            with open(paths[name], "w") as f:
                json.dump(art, f)
        for name, expect_rc in [("amb", 0), ("reg", 1)]:
            p = subprocess.run(
                [sys.executable, __file__, paths["old"], paths[name]],
                capture_output=True, text=True)
            assert p.returncode == expect_rc, \
                f"{name}: rc={p.returncode}, expected {expect_rc}\n{p.stdout}"
    print("selftest OK: ambient-only unflagged, single-query 4x flagged")


def main():
    argv = sys.argv[1:]
    top = 10
    if "--selftest" in argv:
        selftest()
        sys.exit(0)
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i:i + 2]
    args = argv
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    ocal, ncal = cal_of(old), cal_of(new)
    normalized = ocal is not None and ncal is not None and ocal > 0 and ncal > 0
    calratio = (ncal / ocal) if normalized else 1.0

    common = sorted(set(oq) & set(nq))
    ratios = {}
    for k in common:
        if oq[k] and oq[k] > 0:
            ratios[k] = (nq[k] / oq[k]) / calratio
    med = statistics.median(ratios.values()) if ratios else float("nan")

    print(f"old: {args[0]}  total={old.get('value')}s  n={len(oq)}  cal={ocal}")
    print(f"new: {args[1]}  total={new.get('value')}s  n={len(nq)}  cal={ncal}")
    if normalized:
        print(f"session calibration ratio (new/old): {calratio:.3f} "
              f"(ambient host factor divided out of every per-query ratio)")
    else:
        print("WARNING: calibration missing in at least one artifact — "
              "ratios below are RAW and conflate host noise with plan movement")
    print(f"common queries: {len(common)}  "
          f"added: {sorted(set(nq) - set(oq))[:8] or '[]'}  "
          f"removed: {sorted(set(oq) - set(nq))[:8] or '[]'}")
    print(f"median normalized ratio: {med:.3f} "
          f"(residual ambient after calibration; 1.0 = no drift)")

    movers = sorted(ratios.items(), key=lambda kv: kv[1], reverse=True)
    # absolute growth measured in NEW-session seconds: old time projected
    # into the new session is oq[k] * calratio
    flagged = [(k, r) for k, r in movers
               if r > 1.5 * med and nq[k] - oq[k] * calratio > 0.5]
    print(f"\nregressions (>1.5x median AND >0.5s absolute): {len(flagged)}")
    for k, r in flagged[:top]:
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s  normalized x{r:.2f}")
    print(f"\ntop {top} movers (normalized ratio):")
    for k, r in movers[:top]:
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s  x{r:.2f}")
    print(f"top {top} improvements:")
    for k, r in movers[::-1][:top]:
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s  x{r:.2f}")

    osh, nsh = old.get("shuffle_mb", {}), new.get("shuffle_mb", {})
    sh_common = sorted(set(osh) & set(nsh))
    sh_flag = [(k, osh[k], nsh[k]) for k in sh_common
               if nsh[k] > osh[k] * 1.2 and nsh[k] - osh[k] > 8.0]
    print(f"\nshuffle_mb compared on {len(sh_common)} queries; "
          f"grown >20% and >8 MB: {len(sh_flag)}")
    for k, o, n in sh_flag[:top]:
        print(f"  {k}: {o:.1f} MB -> {n:.1f} MB")
    sys.exit(1 if (flagged or sh_flag) else 0)


if __name__ == "__main__":
    main()
