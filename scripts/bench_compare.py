#!/usr/bin/env python3
"""Mechanical round-over-round bench comparison (round-17 verdict #5:
"emit the box-speed calibration as data ... so round-over-round
comparisons normalize mechanically").

Usage: scripts/bench_compare.py OLD.json NEW.json

Both files are bench records (bench_out.json / BENCH_QUIET_rN.json).
Per-query deltas are screened with the r13+ rule (flag when
new > 1.5*old + 0.3 s) twice: RAW, and NORMALIZED by the
calibration_secs ratio when both records carry the field (a 2x
calibration means the box — not the code — is 2x slower; a query that
only tracks the box is not a regression). Records from different
SPARK_GRAFT_CPUS settings are not comparable — the cpus field is
printed when present so that mistake is visible.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    co, cn = old.get("calibration_secs"), new.get("calibration_secs")
    ratio = (cn / co) if (co and cn) else None
    print(f"old: total={old.get('value')} iters={old.get('iters')} "
          f"calibration={co} cpus={old.get('cpus', '?')}")
    print(f"new: total={new.get('value')} iters={new.get('iters')} "
          f"calibration={cn} cpus={new.get('cpus', '?')}")
    if ratio:
        print(f"box-speed ratio (new/old calibration): {ratio:.2f}x")
    else:
        print("calibration_secs missing from one side - RAW screen only")
    def norm_keys(qs):
        # pre-r18 records carried qNN-prefix keys (the driver-tail
        # degrade); reduce full names to the same prefixes, breaking
        # x36-style collisions with letter suffixes in alphabetical
        # full-name order (matches the old shortNames rule)
        out, seen = {}, {}
        for k in sorted(qs):
            p = k.split("_")[0]
            n = seen.get(p, 0)
            seen[p] = n + 1
            out[p if n == 0 else f"{p}{chr(ord('a') + n)}"] = qs[k]
        return out

    qo = norm_keys({k: v for k, v in old.get("queries", {}).items() if v >= 0})
    qn = norm_keys({k: v for k, v in new.get("queries", {}).items() if v >= 0})
    common = sorted(set(qo) & set(qn))
    print(f"common rows: {len(common)} "
          f"(old-only {len(set(qo) - set(qn))}, new-only {len(set(qn) - set(qo))})")
    if not common:
        sys.exit(0)
    so = sum(qo[k] for k in common)
    sn = sum(qn[k] for k in common)
    print(f"sum over common rows: {so:.1f} -> {sn:.1f} s "
          f"({sn / so:.2f}x raw" +
          (f", {sn / so / ratio:.2f}x box-normalized)" if ratio else ")"))

    def screen(label, norm):
        flagged = [(k, qo[k], qn[k]) for k in common
                   if qn[k] / norm > 1.5 * qo[k] + 0.3]
        print(f"{label}: {len(flagged)} flagged")
        for k, o, n in sorted(flagged, key=lambda t: -(t[2] / norm - t[1]))[:20]:
            print(f"  {k:34s} {o:7.2f} -> {n:7.2f}"
                  + (f"  ({n / norm:.2f} normalized)" if norm != 1 else ""))

    screen("RAW regression screen (>1.5x + 0.3s)", 1.0)
    if ratio and abs(ratio - 1) > 0.05:
        screen(f"NORMALIZED screen (/ {ratio:.2f})", ratio)
    improved = [(k, qo[k], qn[k]) for k in common
                if qo[k] / (1 / (ratio or 1)) > 1.5 * qn[k] + 0.3]
    if improved:
        print(f"improved (same screen, reversed): {len(improved)}")
        for k, o, n in sorted(improved, key=lambda t: -(t[1] - t[2]))[:10]:
            print(f"  {k:34s} {o:7.2f} -> {n:7.2f}")


if __name__ == "__main__":
    main()
