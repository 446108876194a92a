#!/usr/bin/env python
"""Generate frozen LibriSpeech split lists.

Rebuild of the reference's split assets and scripts (SURVEY.md section 2
item 11): the reference ships libri-test-clean-10s.txt (test-clean
utterances <= 10 s) split with seed 1227 into libri-adapt.txt (10) +
libri-test.txt (1200), and libri-dev-all/few lists from dev-clean. This
script regenerates equivalent lists from a LibriSpeech root so the assets
are reproducible instead of frozen blobs.

Usage:
  python scripts/make_splits.py /data/LibriSpeech --out-dir lists/
"""
import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from speech_enhancement_by_s3prl_tpu.data.audio_io import read_audio
from speech_enhancement_by_s3prl_tpu.data.datasets import find_audio_files


def duration_filter(root: str, subset: str, max_sec: float):
    base = os.path.join(root, subset)
    kept = []
    for path in find_audio_files(base):
        wav, sr = read_audio(path)
        if wav.shape[-1] / sr <= max_sec:
            kept.append(os.path.relpath(path, root))
    return sorted(kept)


def write_list(path: str, items):
    with open(path, "w") as f:
        for it in items:
            f.write(it + "\n")
    print(f"wrote {path}: {len(items)} files")


def split_master(master_lines, seed: int = 1227, adapt_num: int = 10,
                 test_num: int = 1200):
    """The published adapt/test split (/root/reference/split-test.py:1-16):
    seed-1227 shuffle of the master list IN FILE ORDER, first 10 = adapt,
    next 1200 = test. Reproduces the reference's frozen libri-adapt.txt /
    libri-test.txt bit-exactly from its libri-test-clean-10s.txt (verified
    by tests/test_make_splits.py), so the assets need not be vendored."""
    lines = list(master_lines)
    random.Random(seed).shuffle(lines)
    return lines[:adapt_num], lines[adapt_num : adapt_num + test_num]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("libri_root", nargs="?")
    ap.add_argument(
        "--from-master",
        help="derive libri-adapt/test from an existing libri-test-clean-10s"
        " list instead of scanning a LibriSpeech root",
    )
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--max-sec", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=1227)
    ap.add_argument("--adapt-num", type=int, default=10)
    ap.add_argument("--test-num", type=int, default=1200)
    ap.add_argument("--dev-few-num", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.from_master:
        with open(args.from_master) as f:
            ten_s = [line.rstrip("\n") for line in f if line.strip()]
    else:
        assert args.libri_root, "need a LibriSpeech root or --from-master"
        # test-clean <= 10 s filter (the master list the reference froze)
        ten_s = duration_filter(args.libri_root, "test-clean", args.max_sec)
        write_list(os.path.join(args.out_dir, "libri-test-clean-10s.txt"), ten_s)

    adapt, test = split_master(ten_s, args.seed, args.adapt_num, args.test_num)
    write_list(os.path.join(args.out_dir, "libri-adapt.txt"), adapt)
    write_list(os.path.join(args.out_dir, "libri-test.txt"), test)

    if args.from_master:
        return

    # dev-clean: all + a small fixed subset
    dev = [
        os.path.relpath(p, args.libri_root)
        for p in find_audio_files(os.path.join(args.libri_root, "dev-clean"))
    ]
    write_list(os.path.join(args.out_dir, "libri-dev-all.txt"), sorted(dev))
    rng = random.Random(args.seed)
    dev_shuffled = sorted(dev)
    rng.shuffle(dev_shuffled)
    write_list(os.path.join(args.out_dir, "libri-dev-few.txt"),
               dev_shuffled[: args.dev_few_num])


if __name__ == "__main__":
    main()
