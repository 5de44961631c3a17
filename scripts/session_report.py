#!/usr/bin/env python3
"""One-command budget read for a bench session (r18, VERDICT r17 task 1).

Usage: python3 scripts/session_report.py <session.json> [record.json]

Prints the session's raw total, its calibration tuple (the pinned
CPU/memory/Spark probes Bench runs before the first and after the last
pass, excluded from the total), and — when a record is given (default
bench_r18_full.json) — the per-key ratio distribution vs the record and
the ratio-normalized total. The MEDIAN per-key ratio over 250+ keys is
the session's host factor: unchanged implementations can only differ
from their cross-session record by host regime, and a median over the
whole suite is insensitive to the handful of keys that legitimately
changed. A session is budget-clean if raw <= budget; on a slow-regime
day the honest read is the normalized total plus the calib tuple that
shows WHICH host axis moved.
"""
import json, statistics, sys

if len(sys.argv) < 2:
    sys.exit("usage: session_report.py <session.json> [record.json]")
sess = json.load(open(sys.argv[1]))
rec_path = sys.argv[2] if len(sys.argv) > 2 else "bench_r18_full.json"
q = sess["queries"]
raw = sess["value"]
print(f"session: {sys.argv[1]}")
print(f"raw total: {raw:.1f} s over {len(q)} keys, errors={sess.get('errors') or '{}'}")
cal = sess.get("calib")
if cal:
    print("calib:", json.dumps(cal))
try:
    rec = json.load(open(rec_path))["queries"]
except FileNotFoundError:
    sys.exit(f"(no record at {rec_path} — ratio normalization skipped)")
ratios = sorted(q[k] / rec[k] for k in q if k in rec and rec[k] > 0 and q[k] >= 0)
# guard the degenerate paths (r18 ADVICE): a fresh record / all-failed
# session shares no valid keys (median on [] raises), and an all-zero
# session would make the normalization a division by zero
if not ratios:
    sys.exit(f"(no shared valid keys with {rec_path} — "
             "ratio normalization skipped; raw total above is the read)")
med = statistics.median(ratios)
if med == 0:
    sys.exit("(median per-key ratio is 0 — degenerate session timings; "
             "raw total above is the read)")
print(f"vs record {rec_path}: median per-key ratio {med:.3f} "
      f"(p25 {ratios[len(ratios)//4]:.3f}, p75 {ratios[3*len(ratios)//4]:.3f}; "
      f"{sum(1 for r in ratios if r > 1.5)}/{len(ratios)} keys >1.5x)")
print(f"ratio-normalized total: {raw/med:.1f} s  (raw {raw:.1f} / median ratio {med:.3f})")
