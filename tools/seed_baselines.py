#!/usr/bin/env python
"""Seed per-model bench baselines from the round-5 zoo table (VERDICT r4
weak #7 / next #6): for every artifacts/bench_r05/zoo_<model>_infer.json,
write baselines/BENCH_BASELINE_<model>.json if absent. Existing baselines
are left untouched (refresh them explicitly, with a documented reason)."""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(force=False):
    for path in sorted(glob.glob(
            os.path.join(REPO, "artifacts/bench_r05/zoo_*_infer.json")) +
            sorted(glob.glob(
                os.path.join(REPO, "artifacts/bench_r05/zoo_*_train.json")))):
        m = re.match(r"zoo_(.+?)_(infer|train)\.json", os.path.basename(path))
        model = m.group(1) + ("_train" if m.group(2) == "train" else "")
        try:
            rec = json.load(open(path))
        except Exception as e:
            print(f"skip {model}: unreadable ({e})")
            continue
        if not rec.get("value"):
            print(f"skip {model}: no value")
            continue
        dest = os.path.join(REPO, f"baselines/BENCH_BASELINE_{model}.json")
        if os.path.exists(dest) and not force:
            print(f"keep existing baseline for {model}")
            continue
        json.dump(rec, open(dest, "w"), indent=1)
        print(f"seeded {dest}: {rec['value']} pairs/s (batch {rec.get('batch')})")


if __name__ == "__main__":
    main(force="--force" in sys.argv)
