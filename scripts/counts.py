#!/usr/bin/env python3
"""Machine-derived round counts — run after `sbt test` and paste the
output into round notes instead of hand-maintaining totals (the r15
"786 specs" vs actual 810 drift this exists to prevent).

Reads: target/test-reports/*.xml (suites/tests), the query registry
(via grep over src/main/scala/graft/queries), and oracle row counts.
"""
import glob
import re
import subprocess
import xml.etree.ElementTree as ET

# ScalaTest junit reports
suites = glob.glob("target/test-reports/*.xml")
tests = failures = errors = 0
for p in suites:
    try:
        a = ET.parse(p).getroot().attrib
        tests += int(a.get("tests", 0))
        failures += int(a.get("failures", 0))
        errors += int(a.get("errors", 0))
    except ET.ParseError:
        print(f"warn: unparseable {p}")
print(f"test suites: {len(suites)}")
print(f"tests: {tests} ({failures} failures, {errors} errors)")

# query registry rows and oracle coverage
src = ""
for p in glob.glob("src/main/scala/graft/queries/*.scala"):
    with open(p) as f:
        src += f.read()
names = re.findall(r'Q\("(q[0-9]+[a-z0-9_]*)"', src)
dupes = {n for n in names if names.count(n) > 1}
if dupes:
    print(f"WARN duplicate query names: {sorted(dupes)}")
print(f"registry rows: {len(names)}")

# rows-only (no oracle) entries: Q("name", None, ...)
none_rows = re.findall(r'Q\("(q[0-9]+[a-z0-9_]*)",\s*\n?\s*None', src)
print(f"rows-only (no oracle): {len(none_rows)} {sorted(none_rows)}")

# main-source LoC (the judge's diagnostic)
wc = subprocess.run(
    "find src/main/scala -name '*.scala' | xargs wc -l | tail -1",
    shell=True, capture_output=True, text=True).stdout.split()
print(f"src/main LoC: {wc[0]}")
