#!/usr/bin/env python
"""Generate frozen LibriSpeech split lists.

Rebuild of the reference's split assets and scripts (SURVEY.md section 2
item 11): the reference ships libri-test-clean-10s.txt (test-clean
utterances <= 10 s) split with seed 1227 into libri-adapt.txt (10) +
libri-test.txt (1200), and libri-dev-all/few lists from dev-clean. This
script regenerates equivalent lists from a LibriSpeech root so the assets
are reproducible instead of frozen blobs.

The generated lists are vendored under lists/ (regenerated bit-exactly —
sha256-asserted against the reference assets by tests/test_make_splits.py)
so CLI eval can use the frozen splits with only a LibriSpeech mount:

  OnlineDataset_test:
    speech:
      filestrs: 'lists/libri-test.txt'
      fileroot: '/path/to/LibriSpeech'

Usage:
  python scripts/make_splits.py /data/LibriSpeech --out-dir lists/
  python scripts/make_splits.py --from-master libri-test-clean-10s.txt \
      --from-dev-master libri-dev-all.txt --out-dir lists/
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


def split_dev(dev_files, seed: int = 1227, few_num: int = 10):
    """The published dev lists (/root/reference/split-dev.py:1-29): sorted
    dev-clean files, one seed-1227 shuffle, dev-all written IN SHUFFLED
    ORDER, then dev-few drawn by `random.sample` from the SAME generator
    state (the reference uses module-level `random` for both calls).
    Because the shuffle is deterministic from the sorted input, the whole
    construction regenerates bit-exactly from a vendored libri-dev-all.txt
    (sort it back, reshuffle, resample) — verified by
    tests/test_make_splits.py."""
    files = sorted(dev_files)
    rng = random.Random(seed)
    rng.shuffle(files)
    few = rng.sample(files, few_num)
    return files, few


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("libri_root", nargs="?")
    ap.add_argument(
        "--from-master",
        help="derive libri-adapt/test from an existing libri-test-clean-10s"
        " list instead of scanning a LibriSpeech root",
    )
    ap.add_argument(
        "--from-dev-master",
        help="derive libri-dev-all/few from an existing dev list "
        "(order-insensitive: the file set is re-sorted and reshuffled)",
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
        write_list(
            os.path.join(args.out_dir, "libri-test-clean-10s.txt"), ten_s
        )
    elif args.libri_root:
        # test-clean <= 10 s filter (the master list the reference froze)
        ten_s = duration_filter(args.libri_root, "test-clean", args.max_sec)
        write_list(os.path.join(args.out_dir, "libri-test-clean-10s.txt"), ten_s)
    else:
        assert args.from_dev_master, (
            "need a LibriSpeech root, --from-master, or --from-dev-master"
        )
        ten_s = None

    if ten_s is not None:
        adapt, test = split_master(
            ten_s, args.seed, args.adapt_num, args.test_num
        )
        write_list(os.path.join(args.out_dir, "libri-adapt.txt"), adapt)
        write_list(os.path.join(args.out_dir, "libri-test.txt"), test)

    if args.from_dev_master:
        with open(args.from_dev_master) as f:
            dev = [line.rstrip("\n") for line in f if line.strip()]
    elif args.libri_root:
        dev = [
            os.path.relpath(p, args.libri_root)
            for p in find_audio_files(os.path.join(args.libri_root, "dev-clean"))
        ]
    else:
        return

    dev_all, dev_few = split_dev(dev, args.seed, args.dev_few_num)
    write_list(os.path.join(args.out_dir, "libri-dev-all.txt"), dev_all)
    write_list(os.path.join(args.out_dir, "libri-dev-few.txt"), dev_few)


if __name__ == "__main__":
    main()
