"""Run ONE suite stage (subprocess-isolated) and merge it into results.json.

``python -m benchmarks.suite`` measures every stage in sequence and
rewrites results.json wholesale — fine for a full refresh, but under a
wall-clock budget (or after a code change that only touches some stages)
the per-stage form lets each stage refresh independently while keeping
the others' committed measurements:

    python -m benchmarks.merge_stage battery wav2vec2_fused

Each named stage runs exactly as the full suite runs it (own process, one
retry, link probe, baseline ratio) and replaces only its own entry.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.suite import STAGES, _attach_ratio, _load_json  # noqa: E402


def run_and_merge(names, quick=False, timeout=3600):
    path = os.path.join(REPO, "benchmarks", "results.json")
    results = _load_json(path)
    baselines = _load_json(os.path.join(REPO, "benchmarks", "baselines.json"))
    import jax

    results["backend"] = jax.default_backend()
    for name in names:
        if name not in STAGES:
            raise SystemExit(f"unknown stage {name!r}; stages: {STAGES}")
        t0 = time.perf_counter()
        cmd = [sys.executable, "-m", "benchmarks.suite", "--stage", name]
        if quick:
            cmd.append("--quick")
        entry = None
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=timeout,
                    cwd=REPO,
                )
                line = next(
                    (l for l in proc.stdout.splitlines()
                     if l.startswith("STAGE_RESULT ")), None,
                )
                if line:
                    entry = json.loads(line[len("STAGE_RESULT "):])
                    break
                tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                entry = {"error": " | ".join(tail[-3:])[:300]}
            except subprocess.TimeoutExpired:
                entry = {"error": "stage timeout"}
        entry["total_seconds"] = time.perf_counter() - t0
        _attach_ratio(name, entry, baselines)
        results[name] = entry
        print(f"{name}: {json.dumps(entry)[:400]}")
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)
    print(f"written: {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="+")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()
    run_and_merge(args.stages, quick=args.quick, timeout=args.timeout)


if __name__ == "__main__":
    main()
