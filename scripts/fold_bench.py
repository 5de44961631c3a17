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

Guards (r17, VERDICT r16 task 6): a key that failed in every session
(no timing ≥ 0) falls back to the prior record if present, else is
recorded at -1 and WARNED — never a min() on empty. Zero session files is
a usage error. And every key whose folded value came from the PRIOR (the
prior min beat all of this round's sessions) is printed, so a changed key
missing from --changed shows up as a suspicious prior-sourced entry
instead of silently keeping a retired implementation's time.
"""
import json, sys

args = sys.argv[1:]
if len(args) < 2:
    sys.exit("usage: fold_bench.py <prior_record.json> <out.json> "
             "[--changed k1,k2] session1.json [...]")
prior_path, out_path = args[0], args[1]
changed = set()
if len(args) > 2 and args[2] == "--changed":
    changed = set(args[3].split(","))
    sessions = args[4:]
else:
    sessions = args[2:]
if not sessions:
    sys.exit("fold_bench.py: no session files given — nothing to fold")

prior = json.load(open(prior_path))["queries"]
runs = [json.load(open(p)) for p in sessions]
keys = set()
for r in runs:
    keys |= set(r["queries"])

out_q, out_runs = {}, {}
all_failed, prior_sourced = [], []
for k in sorted(keys):
    vals = [r["queries"][k] for r in runs if k in r["queries"]
            and r["queries"][k] >= 0]
    if not vals:
        # failed in every session this round: keep the prior record entry
        # if one exists (and the key wasn't re-implemented), else record
        # the Bench failure sentinel — never min() on empty
        all_failed.append(k)
        out_q[k] = prior[k] if (k in prior and k not in changed) else -1.0
        out_runs[k] = []
        continue
    best = min(vals)
    if k in prior and k not in changed:
        if prior[k] < best:
            prior_sourced.append(k)
        best = min(best, prior[k])
    out_q[k] = best
    out_runs[k] = vals
dropped = [k for k in prior if k not in keys]
if dropped:
    print(f"WARNING: {len(dropped)} prior keys absent this round: {dropped}",
          file=sys.stderr)
if all_failed:
    print(f"WARNING: {len(all_failed)} keys failed in EVERY session "
          f"(prior kept where available): {all_failed}", file=sys.stderr)
# a changed/new key that failed everywhere has NO honest timing: the -1
# sentinel would be silently excluded from the summed total, making a
# broken record look better than a working one — hard-exit instead, and
# surface the prior-sourced fallbacks in "errors" so downstream budget
# reads can't take the record as clean (r17 ADVICE)
unrecoverable = [k for k in all_failed if out_q[k] < 0]
if unrecoverable:
    sys.exit(f"fold_bench.py: {len(unrecoverable)} changed/new keys failed "
             f"in every session with no prior record: {unrecoverable}")
total = sum(v for v in out_q.values() if v >= 0)
# errors keeps Bench's NUMERIC {key: fail-count} shape (r18 ADVICE — the
# prior prose-valued shape silently broke consumers comparing session vs
# folded records); the prose lives in a separate "notes" field. The count
# is the summed per-session fail count where the sessions recorded one,
# else the number of sessions (it failed in every one).
def _session_fails(k):
    c = 0
    for r in runs:
        v = r.get("errors", {}).get(k, 0)
        c += v if isinstance(v, int) else 1
    return c if c > 0 else len(sessions)
errors = {k: _session_fails(k) for k in all_failed}
notes = {k: "all sessions failed; prior record kept" for k in all_failed}
rec = {"metric": "total", "value": total, "unit": "sec", "queries": out_q,
       "runs": out_runs, "errors": errors, "notes": notes,
       "sf": runs[-1].get("sf", "")}
json.dump(rec, open(out_path, "w"))
print(f"folded {len(out_q)} keys over {len(sessions)} sessions "
      f"(+prior for unchanged): total {total:.2f} s; "
      f"changed(re-measured)={sorted(changed)}")
if prior_sourced:
    print(f"{len(prior_sourced)} keys kept the PRIOR record (prior < all "
          f"session times) — verify none changed implementation this round: "
          f"{prior_sourced}")
