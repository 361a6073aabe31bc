#!/usr/bin/env python
"""Extract the per-epoch metric table from a training log into a CSV.

Usage: python scripts/extract_curve.py RUN_DIR/log_rank0.txt > curve.csv

Parses the epoch-end metric tables the trainer prints (trainer.py epoch
summary) into one CSV row per epoch: epoch, then <metric>_train /
<metric>_valid columns. This is the committed training-curve artifact for
convergence evidence (VERDICT round-2 item 2).
"""

import csv
import re
import sys


def parse(path):
    epochs = []
    cur = None
    with open(path) as fh:
        for line in fh:
            m = re.search(r"vm_asr_tpu: Epoch (\d+):\s*$", line)
            if m:
                cur = {"epoch": int(m.group(1))}
                epochs.append(cur)
                continue
            if cur is None:
                continue
            m = re.match(
                r"(\w[\w/]*)\s+(-?\d+\.\d+)?\s*(-?\d+\.\d+)?\s*$", line
            )
            if m and m.group(2) is not None:
                name = m.group(1)
                cur[f"{name}_train"] = float(m.group(2))
                if m.group(3) is not None:
                    cur[f"{name}_valid"] = float(m.group(3))
            elif line.strip() and not set(line.strip()) <= {"-"} and \
                    "metric" not in line and "INFO" in line:
                cur = None  # table ended
    return epochs


def main():
    epochs = parse(sys.argv[1])
    if not epochs:
        print("no epoch tables found", file=sys.stderr)
        return 1
    cols = ["epoch"]
    for e in epochs:
        for k in e:
            if k not in cols:
                cols.append(k)
    w = csv.DictWriter(sys.stdout, fieldnames=cols)
    w.writeheader()
    for e in epochs:
        w.writerow(e)
    return 0


if __name__ == "__main__":
    sys.exit(main())
