#!/usr/bin/env python3
"""Generate the events-timestamp encoding fixtures for EventsEncodingSpec.

The driver's testdata generator has shipped `events.ts` under two parquet
encodings so far — TIMESTAMP(NANOS) (rounds 1-6) and plain `timestamp[us]`
(round 7's regen, which silently broke the hard-wired readers). This script
freezes both (plus the adjusted-to-UTC micros variant) as tiny committed
fixtures with IDENTICAL logical rows, so the Scala regression spec can
assert every encoding decodes to the same result forever.

Run once from the repo root (pyarrow is a build-box tool, not a library
dependency of the engine):  python3 scripts/gen_ts_fixtures.py
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "src" / "test" / "resources" / "events_ts_fixtures"

# 2023-05-01T00:00:00Z plus whole-microsecond offsets, so the reader's
# ns->us truncation is exact and all encodings carry identical instants.
BASE_US = 1682899200000000
ROWS = [
    (i + 1,                       # event_id
     BASE_US + i * 37_000_123,    # ts in microseconds since epoch (UTC)
     (i * 7) % 5 + 1,             # user_id
     ["click", "view", "purchase"][i % 3],  # event_type
     round(i * 1.25, 2),          # value
     '{"k":%d}' % i)              # props
    for i in range(20)
]

cols = list(zip(*ROWS))

def write(name, ts_type, ts_values):
    t = pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(ts_values, ts_type),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array(cols[5], pa.string()),
    })
    d = OUT / name
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, d / "events.parquet")
    print(f"wrote {d}/events.parquet ts={ts_type}")

us = list(cols[1])
write("nanos", pa.timestamp("ns"), [v * 1000 for v in us])   # rounds 1-6 encoding
write("nanos_utc", pa.timestamp("ns", tz="UTC"),
      [v * 1000 for v in us])                                 # adjusted-nanos variant
write("us_ntz", pa.timestamp("us"), us)                       # round-7 regen encoding
write("us_utc", pa.timestamp("us", tz="UTC"), us)             # adjusted-to-UTC variant

# a deliberately-unsupported encoding: the spec asserts the reader FAILS
# LOUDLY instead of guessing (silent misreads are the failure mode that
# motivated this fixture set)
write("bad_string", pa.string(), [str(v) for v in us])
