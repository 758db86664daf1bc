#!/usr/bin/env python3
"""Scale-divergence oracle gate (round-11 verdict ask #1).

Runs the DuckDB correctness compare at sf0.1 for the scale-shape-
sensitive subset in tools/sf01_subset.txt (iteration-bounded /
threshold-bearing / cap-bearing operators — the class whose sf0.01-
green answers can silently diverge at sf0.1, as spatial_dbscan's did
in round 10), and writes the committed artifact CORRECTNESS_SF01.md.

Usage: python3 tools/sf01_gate.py [sfDir] [outDir]
"""
import subprocess, sys, os, datetime

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf01_gate"

subset = [l.strip() for l in open(f"{repo}/tools/sf01_subset.txt")
          if l.strip() and not l.startswith("#")]

env = dict(os.environ)
env.setdefault("SPARK_GRAFT_CPUS", "16")
r = subprocess.run(
    [sys.executable, f"{repo}/tools/local_verify.py", sf, out,
     "--only=" + ",".join(subset)],
    capture_output=True, text=True, timeout=5400, env=env, cwd=repo)
report = r.stdout + r.stderr
print(report[-4000:])

head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=repo,
                      capture_output=True, text=True).stdout.strip()
status = "ALL GREEN" if "ALL GREEN" in report and r.returncode == 0 \
    else "FAILING"
tail = [l for l in report.splitlines()
        if l.startswith(("PASS", "FAIL", "  ", "ALL GREEN"))]
with open(f"{repo}/CORRECTNESS_SF01.md", "w") as f:
    f.write(f"""# Scale-divergence oracle gate — sf0.1

- **Status: {status}**
- Commit: {head}
- Data: `{sf}` ({len(subset)} scale-shape-sensitive queries:
  iteration-bounded closures, LSH bucket caps, grid/threshold ops,
  k-means fixpoints, packing/histogram boundaries)
- Ran: {datetime.date.today().isoformat()} via `python3 tools/sf01_gate.py`
- Checks per query: rows + schema + value compare vs the DuckDB oracle
  (same canonicalization as the driver's hash gate)

```
{chr(10).join(tail)}
```

Subset contract: `tools/sf01_subset.txt`, pinned by ContractSpec
("the sf0.1 scale-gate subset ...") — every `graph_*`/`spatial_*`/
`dedup_clusters*` gate key plus the named cap/iteration bearers must
be listed, and every listed name must be a live gate key.
""")
print(f"wrote CORRECTNESS_SF01.md ({status})")
sys.exit(0 if status == "ALL GREEN" else 2)
