"""Regenerate VERIFIED_GATES.json from git history.

For every recorded driver correctness run (CORRECTNESS_r<N>.json,
committed by the driver in a "round N: verdict/..." commit), the code
the driver actually executed is the PARENT of that commit. This script
checks each parent out into a temporary worktree, imports that
snapshot's gate registry, computes content fingerprints with the
CURRENT fingerprint algorithm (loaded by file path from HEAD so old
snapshots don't need the module), and attributes each fingerprint to
the gates that went fully green (rows+schema+hash) in that round.

Output: VERIFIED_GATES.json — {gate: [fingerprint, ...]} (a gate
re-verified under several emissions keeps every green fingerprint).
``__spark_entry__`` treats a gate as verified only if its current
fingerprint appears in its list, so editing a gate re-queues it for the
driver window automatically.

Run from the repo root after each round's artifacts land:
    python tools/refresh_verified_gates.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNAPSHOT_PROG = r"""
import importlib.util, json, sys
worktree, fp_path = sys.argv[1], sys.argv[2]
sys.path.insert(0, worktree)
spec = importlib.util.spec_from_file_location("_gatefp", fp_path)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from edgelake_spark.queries import ORACLE_SQL, SPARK_QUERIES
out = {n: mod.gate_fingerprint(n, fn, ORACLE_SQL.get(n))
       for n, fn in SPARK_QUERIES.items()}
json.dump(out, sys.stdout)
"""


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout


def _round_commits() -> dict[int, str]:
    """round number -> commit whose tree the driver ran (parent of the
    verdict commit that added CORRECTNESS_r<N>.json)."""
    out = {}
    log = _git("log", "--format=%H %s")
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict/", subject)
        if m:
            out.setdefault(int(m.group(1)), sha + "^")
    return out


def _snapshot_fingerprints(commitish: str) -> dict[str, str]:
    with tempfile.TemporaryDirectory(prefix="gatefp_") as tmp:
        wt = os.path.join(tmp, "wt")
        _git("worktree", "add", "--detach", wt, commitish)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _SNAPSHOT_PROG, wt,
                 os.path.join(REPO, "edgelake_spark", "fingerprint.py")],
                capture_output=True, text=True, cwd=wt,
            )
            if proc.returncode != 0:
                print(f"  snapshot {commitish}: import failed\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                return {}
            return json.loads(proc.stdout)
        finally:
            _git("worktree", "remove", "--force", wt)


def main() -> None:
    commits = _round_commits()
    verified: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        if rnd not in commits:
            print(f"round {rnd}: no verdict commit found, skipped", file=sys.stderr)
            continue
        with open(path) as fh:
            results = json.load(fh)
        green = {
            g for g, res in results.items()
            if isinstance(res, dict) and res.get("rows_match")
            and res.get("schema_match") and res.get("hash_match")
        }
        if not green:
            continue
        fps = _snapshot_fingerprints(commits[rnd])
        hit = 0
        for gate in green:
            fp = fps.get(gate)
            if fp is not None:
                verified.setdefault(gate, [])
                if fp not in verified[gate]:
                    verified[gate].append(fp)
                hit += 1
        print(f"round {rnd}: {len(green)} green, {hit} fingerprinted "
              f"({commits[rnd]})", file=sys.stderr)

    out = os.path.join(REPO, "VERIFIED_GATES.json")
    with open(out, "w") as fh:
        json.dump({k: sorted(v) for k, v in sorted(verified.items())}, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out}: {len(verified)} gates", file=sys.stderr)


if __name__ == "__main__":
    main()
