"""Diff two bench runs: per-query regressions/improvements + totals.

    python tools/bench_compare.py OLD.json NEW.json [--thresh 1.2 --abs 0.3]

Accepts either a raw bench.py stdout line (the full JSON with
"queries") or a driver BENCH_r{N}.json wrapper (falls back to
whatever per-query timings are recoverable from its captured tail).
"""

from __future__ import annotations

import json
import re
import sys


def _timings(path: str) -> dict[str, float]:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return dict(d["queries"])
    if isinstance(d, dict) and "cal.spark" in d:
        # the compact final bench line (what the driver's "parsed"
        # retains): no per-query map, but the calibration anchors and
        # train.total ride as top-level fields (r10 verdict #1) —
        # recover them so host drift is separable even when only the
        # parsed headline survived
        return {
            k: float(v)
            for k, v in d.items()
            if "." in k and isinstance(v, (int, float))
        }
    if isinstance(d, dict) and "tail" in d:  # driver wrapper
        out: dict[str, float] = {}
        for k, v in re.findall(r'"([a-z0-9_.]+)": ([0-9.]+)', d["tail"]):
            if k not in ("value", "sf", "n_queries"):
                out[k] = float(v)
        return out
    # raw bench stdout: take the first line with "queries"
    for line in raw.splitlines():
        if '"queries"' in line:
            return dict(json.loads(line)["queries"])
    raise SystemExit(f"no per-query timings found in {path}")


def main() -> None:
    # accept both --flag=value and --flag value (the docstring's form;
    # the latter previously parsed as a bare boolean and float(True)
    # silently became the threshold)
    args: list[str] = []
    opts: dict[str, str] = {}
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            key = a.lstrip("-")
            if "=" in key:
                key, val = key.split("=", 1)
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                i += 1
                val = argv[i]
            else:
                raise SystemExit(f"--{key} needs a value")
            opts[key] = val
        else:
            args.append(a)
        i += 1
    thresh = float(opts.get("thresh", 1.2))
    abs_floor = float(opts.get("abs", 0.3))
    old, new = _timings(args[0]), _timings(args[1])
    # phase-split rows (ivfpq.build / lsh_state.ingest — always dotted,
    # query names never are) coexist with their sum keys
    # (ann_ivfpq_search / dedup_incremental_minhash); keep them out of
    # totals and regression rows or that time double-counts
    dropped = sorted(
        k for k in set(old) | set(new) if "." in k
    )
    if dropped:
        # never silent: a truncated driver tail can carry a phase row
        # without its sum key, and silently dropping it would hide a
        # regression in that phase
        print(f"phase rows excluded from totals ({len(dropped)}): "
              + ", ".join(dropped))
    # host-calibration pair (bench.py emits cal.cpu / cal.spark after
    # warm-up): when both runs carry it, report the host-speed ratio
    # and a normalized total so host drift is separable from code
    # drift (r8: a slow driver host read as a fake 24% regression)
    cal_ratio = None
    if "cal.spark" in old and "cal.spark" in new:
        cal_ratio = new["cal.spark"] / old["cal.spark"]
        print(
            f"host calibration: spark {old['cal.spark']:.2f}s -> "
            f"{new['cal.spark']:.2f}s (x{cal_ratio:.2f}), "
            f"cpu {old.get('cal.cpu', float('nan')):.2f}s -> "
            f"{new.get('cal.cpu', float('nan')):.2f}s"
        )
    old = {k: v for k, v in old.items() if "." not in k}
    new = {k: v for k, v in new.items() if "." not in k}
    common = sorted(set(old) & set(new))
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    print(f"common {len(common)} queries: {so:.1f}s -> {sn:.1f}s "
          f"({(sn - so) / so * 100:+.1f}%)")
    if cal_ratio:
        print(f"host-normalized: {so:.1f}s -> {sn / cal_ratio:.1f}s "
              f"({(sn / cal_ratio - so) / so * 100:+.1f}% after dividing "
              f"new times by the x{cal_ratio:.2f} host ratio)")
    for title, pred in (
        ("REGRESSIONS", lambda a, b: b > a * thresh and b - a > abs_floor),
        ("IMPROVEMENTS", lambda a, b: a > b * thresh and a - b > abs_floor),
    ):
        rows = [(k, old[k], new[k]) for k in common if pred(old[k], new[k])]
        rows.sort(key=lambda t: -abs(t[2] - t[1]))
        print(f"{title}: {len(rows)}")
        for k, a, b in rows:
            print(f"  {a:7.2f} -> {b:7.2f}  {k}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"NEW ({len(only_new)}): " + ", ".join(
            f"{k}={new[k]:.2f}" for k in only_new))


if __name__ == "__main__":
    main()
