#!/usr/bin/env python3
"""Repo hygiene scan (driver-side tooling only; not part of the engine).

Greps every git-tracked source/doc file for anything that looks
non-public — private-infrastructure hostnames, artifact-mirror hosts,
object-store bucket URIs, chat-permalink/short-link shapes, credential
shapes, suspicious environment variables — and writes LEAKCHECK.json
with the hit lists PLUS a provenance stamp (scan time, commit hash), so
the artifact self-describes which tree state it certifies.

Categories mirror the historical LEAKCHECK.json keys so the artifact
stays diffable round-over-round. All patterns are generic SHAPES; the
scan is a tripwire, not an allowlist — any hit is reviewed by hand.

Usage: scripts/leakcheck.py [round_number]
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone

PATTERNS = {
    # imports of obviously non-public namespaces
    "internal-import": re.compile(
        r"^\s*import\s+\S*\.(?:internal|corp|intranet)\.", re.M),
    # URLs on private-suffix hosts
    "internal-url": re.compile(
        r"https?://[A-Za-z0-9.-]*\.(?:internal|corp|intranet|local)(?:[/:]|\b)"),
    # artifact-mirror / package-proxy hosts (public builds resolve from
    # Maven Central / the pre-warmed local cache only)
    "internal-pkg2": re.compile(
        r"\b(?:artifactory|nexus)\.[A-Za-z0-9-]+\.[A-Za-z0-9.-]+"),
    # object-store buckets (none belong in this repo at all)
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?)://[A-Za-z0-9._-]+"),
    # chat permalinks and go/-style short links
    "slack-link": re.compile(
        r"slack\.com/archives/|(?<![\w/.-])go/[a-z][a-z0-9-]{2,30}(?![\w.-])"),
    # credential shapes (cloud key ids, long secret-prefixed tokens)
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{24,}|ghp_[A-Za-z0-9]{36})\b"),
    # env vars that smell like private deployment wiring
    "axon-env": re.compile(
        r"\b[A-Z][A-Z0-9_]*(?:_INTERNAL|_CORP|_SECRET_KEY|_ACCESS_KEY)\b"),
}

# The scan certifies SOURCES; generated artifacts that merely QUOTE scan
# machinery (this file's own patterns, the output itself) are skipped.
SKIP = {"LEAKCHECK.json", "scripts/leakcheck.py"}
BINARY_EXT = (".parquet", ".png", ".jar", ".class", ".zip", ".gz")


def main(round_no):
    # NUL-delimited so paths containing whitespace survive the split —
    # a whitespace split fragments them into nonexistent paths whose
    # open() failure is silently swallowed below (a hole in the tripwire)
    files = [f for f in subprocess.run(
        ["git", "ls-files", "-z"], capture_output=True,
        text=True, check=True).stdout.split("\0") if f]
    commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                            text=True, check=True).stdout.strip()
    hits = {k: [] for k in PATTERNS}
    for f in files:
        if f in SKIP or f.endswith(BINARY_EXT):
            continue
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except (OSError, IsADirectoryError):
            continue
        for key, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[key].append(f"{f}:{line}:{m.group(0)[:80]}")
    out = {
        "round": round_no,
        "scanned_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "commit": commit,
        "n_files": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open("LEAKCHECK.json", "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"scanned {len(files)} files at {commit[:9]}: "
          f"{out['n_hits']} hits")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else None))
