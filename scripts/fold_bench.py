#!/usr/bin/env python3
"""Fold bench sessions into the round record.

Usage: python3 scripts/fold_bench.py <prior_record.json> <out.json> \
         [--changed k1,k2] session1.json [session2.json ...]

Per-key fold = min over this round's sessions, additionally min'd with the
prior record EXCEPT for keys named --changed (implementation changed this
round: their record entries are honestly RE-MEASURED, never min'd against
retired code — the r15 d20/d25 convention) and keys new this round.
Emits the same shape Bench writes ("queries" + "value" total; "runs" holds
each key's per-session folded minima for provenance).
"""
import json, sys

args = sys.argv[1:]
prior_path, out_path = args[0], args[1]
changed = set()
if args[2] == "--changed":
    changed = set(args[3].split(","))
    sessions = args[4:]
else:
    sessions = args[2:]

prior = json.load(open(prior_path))["queries"]
runs = [json.load(open(p)) for p in sessions]
keys = set()
for r in runs:
    keys |= set(r["queries"])

out_q, out_runs = {}, {}
for k in sorted(keys):
    vals = [r["queries"][k] for r in runs if k in r["queries"]
            and r["queries"][k] >= 0]
    best = min(vals)
    if k in prior and k not in changed:
        best = min(best, prior[k])
    out_q[k] = best
    out_runs[k] = vals
dropped = [k for k in prior if k not in keys]
if dropped:
    print(f"WARNING: {len(dropped)} prior keys absent this round: {dropped}",
          file=sys.stderr)
total = sum(out_q.values())
rec = {"metric": "total", "value": total, "unit": "sec", "queries": out_q,
       "runs": out_runs, "errors": {}, "sf": runs[-1].get("sf", "")}
json.dump(rec, open(out_path, "w"))
print(f"folded {len(out_q)} keys over {len(sessions)} sessions "
      f"(+prior for unchanged): total {total:.2f} s; "
      f"changed(re-measured)={sorted(changed)}")
