#!/usr/bin/env python3
"""2v8 steady-state pair estimators from the two leg JSON lines.

All per-rep figures (wall, task CPU, task RUN, utilization) are taken from
the SAME rep — the one with the best wall time — never from independent
minima over the sample lists: min(run)/min(wall) across different reps can
report a utilization no single rep achieved.
"""
import json, re, sys

def load(path):
    with open(path) as f:
        txt = f.read()
    m = re.search(r'\{"metric".*\}', txt)
    return json.loads(m.group(0))

l2, l8 = load(sys.argv[1]), load(sys.argv[2])
n = l2["e2e_docs"]
assert l8["e2e_docs"] == n

def report(tag, j):
    s = j["e2e_samples"]
    window = sum(s)
    sustained = len(s) * n / window
    i = min(range(len(s)), key=lambda k: s[k])  # the best-wall rep
    best = n / s[i]
    cpu, run = j["task_cpu_sec_samples"][i], j["task_run_sec_samples"][i]
    print(f"{tag}: reps={len(s)} window={window:.1f}s sustained={sustained:.1f} docs/s "
          f"best-rep={best:.1f} docs/s (rep {s[i]:.1f}s)")
    print(f"  best rep task CPU={cpu:.1f}s  task RUN={run:.1f}s  "
          f"util={run / (s[i]*j['cpus']) *100:.0f}%")
    print(f"  matched stable: {j['matched_stable']} ({j['matched_pairs']})")
    return sustained, best, cpu, run

s2, b2, c2, r2 = report("local[2]", l2)
s8, b8, c8, r8 = report("local[8]", l8)
print(f"\nsustained eff(2->8) = {s8/(4*s2):.3f}")
print(f"best-rep wall eff    = {b8/(4*b2):.3f}")
print(f"best-rep task-CPU eff = {c2/c8:.3f} (2c work / 8c work; 1.0 = no extra work)")
print(f"best-rep task-RUN eff = {r2/r8:.3f}")
