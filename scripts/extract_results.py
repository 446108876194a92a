#!/usr/bin/env python
"""Scrape TensorBoard event files across per-noise-type experiment dirs
into a CSV — the rebuild of the reference's result-extraction pair
(/root/reference/extract_zeroshot.py, extract_l1.py), generalized: one
script, a --tags list (default the zero-shot metric trio), --first/--last
selection, and the same ``noise(\\d+)`` run-name convention.

Usage:
  python scripts/extract_results.py RUNS_ROOT --tags test_pesq_nb test_sisdr test_stoi
  python scripts/extract_results.py RUNS_ROOT --tags test_loss --out l1.csv
"""
import argparse
import glob
import os
import re

import pandas as pd
from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)


def scrape(expdir: str, tags, which: str = "first"):
    events = sorted(glob.glob(os.path.join(expdir, "events.out.tfevents.*")))
    if not events:
        return None
    row = {}
    for event_file in events:
        acc = EventAccumulator(event_file)
        acc.Reload()
        for tag in tags:
            if tag not in acc.Tags()["scalars"]:
                continue
            scalars = acc.Scalars(tag)
            if not scalars:
                continue
            value = scalars[0].value if which == "first" else scalars[-1].value
            if tag not in row or which == "last":
                row[tag] = value
    return row or None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="directory holding per-run experiment dirs")
    ap.add_argument("--tags", nargs="+",
                    default=["test_pesq_nb", "test_sisdr", "test_stoi"])
    ap.add_argument("--which", choices=["first", "last"], default="first")
    ap.add_argument("--pattern", default=r"noise(\d+)",
                    help="regex whose group(1) labels each run")
    ap.add_argument("--out", default="results.csv")
    args = ap.parse_args()

    searcher = re.compile(args.pattern)
    rows = {}
    for d in sorted(glob.glob(os.path.join(args.root, "*"))):
        if not os.path.isdir(d):
            continue
        m = searcher.search(os.path.basename(d))
        if m is None:
            continue
        row = scrape(d, args.tags, args.which)
        if row is not None:
            rows[int(m.group(1))] = row

    df = pd.DataFrame.from_dict(rows, orient="index").sort_index()
    df.index.name = "noise_type"
    df.to_csv(args.out)
    print(df)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
