#!/usr/bin/env python3
"""2v8 steady-state pair estimators from the two leg JSON lines."""
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
    best = n / min(s)
    print(f"{tag}: reps={len(s)} window={window:.1f}s sustained={sustained:.1f} docs/s "
          f"best-rep={best:.1f} docs/s (rep {min(s):.1f}s)")
    cpu, run = j["task_cpu_sec_samples"], j["task_run_sec_samples"]
    print(f"  task CPU min={min(cpu):.1f}s  task RUN min={min(run):.1f}s  "
          f"util(best rep)={min(run)/ (min(s)*j['cpus']) *100:.0f}%")
    print(f"  matched stable: {j['matched_stable']} ({j['matched_pairs']})")
    return sustained, best, min(cpu), min(run)

s2, b2, c2, r2 = report("local[2]", l2)
s8, b8, c8, r8 = report("local[8]", l8)
print(f"\nsustained eff(2->8) = {s8/(4*s2):.3f}")
print(f"best-rep wall eff    = {b8/(4*b2):.3f}")
print(f"best-rep task-CPU eff = {c2/c8:.3f} (2c work / 8c work; 1.0 = no extra work)")
print(f"best-rep task-RUN eff = {r2/r8:.3f}")
