#!/usr/bin/env python3
"""Round-end adjudication-anchor check (committed round 13; round 12 ran
this ad hoc): for every query in BASELINE.md's MiniBench history, the
LAST recorded block's value must sit within the adjudication bound
max(2 x miniBest, miniBest + 1) — BenchGuard.adjudicateStamped consults
exactly that (last block, minimum ratchet), so a round that closes with
an over-bound last block silently forfeits its own adjudication evidence
for that query. Run after the final stamped MiniBench recording; a FAIL
means record another (calmer-box) run before closing the round.

Mirrors BenchGuard.miniBlocks: blocks parse ONLY from sections under a
'## ... MiniBench ...' heading, one block per section, `qNN_name: X s`
lines."""
import re
import sys

md = open(sys.argv[1] if len(sys.argv) > 1 else "BASELINE.md").read()

blocks = []
cur = None
for line in md.splitlines():
    if line.startswith("## "):
        if cur is not None:
            blocks.append(cur)
        cur = [] if "minibench" in line.lower() else None
    elif cur is not None:
        m = re.match(r"^(q\d+\w*):\s*([0-9.]+) s$", line.strip())
        if m:
            cur.append((m.group(1), float(m.group(2))))
if cur is not None:
    blocks.append(cur)
blocks = [b for b in blocks if b]

hist = {}
for b in blocks:
    for q, v in b:
        hist.setdefault(q, []).append(v)

fails = []
for q, vs in sorted(hist.items()):
    best, last = min(vs), vs[-1]
    bound = max(2 * best, best + 1.0)
    ok = last <= bound
    if not ok:
        fails.append(q)
    print(f"{'ok  ' if ok else 'FAIL'} {q}: last {last:.3f} "
          f"bound {bound:.3f} (best {best:.3f}, {len(vs)} recordings)")

print(f"\n{len(hist) - len(fails)} ok / {len(fails)} over-bound"
      + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
