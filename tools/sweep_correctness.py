#!/usr/bin/env python3
"""Off-gate-scale correctness sweep (round-14 verdict task 1).

Runs tools/check_oracle.py over a graft.Verify dump and writes a
committable JSON artifact (per-query status + summary), so the full
oracle surface is certified at scales the driver gate never runs
(sf0.001 and sf0.1 — the cross-engine numeric footguns in the verify
skill's Gotchas are exactly the class that only fires off-gate-scale).

Usage: tools/sweep_correctness.py <sf_dir> <verify_out_dir> <artifact.json>
"""
import json
import re
import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]


def main(sf_dir, out_dir, artifact):
    p = subprocess.run(
        [sys.executable, f"{REPO}/tools/check_oracle.py", sf_dir, out_dir],
        capture_output=True, text=True)
    res = {}
    for line in p.stdout.splitlines():
        m = re.match(r"OK   (\S+) \((\d+) rows\)", line)
        if m:
            res[m.group(1)] = {"status": "ok", "rows": int(m.group(2))}
            continue
        m = re.match(r"FAIL (\S+?):?\s", line)
        if m and m.group(1) not in res:
            res[m.group(1)] = {"status": "fail", "detail": line.strip()}
    n_ok = sum(1 for v in res.values() if v["status"] == "ok")
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(res),
        "n_ok": n_ok,
        "n_fail": len(res) - n_ok,
        "queries": res,
    }
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{artifact}: {n_ok}/{len(res)} ok")
    return 0 if n_ok == len(res) else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
