"""Frozen-split reproduction (SURVEY.md section 2 item 11).

The reference ships frozen libri-*.txt lists; this framework regenerates
them. `split_master` must reproduce the reference's seed-1227 adapt/test
split exactly — proven bit-for-bit against the reference assets when
/root/reference is present, and structurally on a synthetic master list
otherwise (sizes 10/1200 from /root/reference/split-test.py:1-16)."""
import hashlib
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from make_splits import split_dev, split_master  # noqa: E402

REF = "/root/reference"
LISTS = os.path.join(REPO, "lists")
ALL_LISTS = [
    "libri-test-clean-10s.txt", "libri-adapt.txt", "libri-test.txt",
    "libri-dev-all.txt", "libri-dev-few.txt",
]


def _read(path):
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def _digest(p):
    with open(p, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_split_sizes_and_determinism():
    master = [f"test-clean/{i}/{i}/{i}-{i}-{i:04d}.flac" for i in range(2058)]
    adapt, test = split_master(master)
    assert len(adapt) == 10 and len(test) == 1200
    assert not (set(adapt) & set(test))
    assert set(adapt) | set(test) <= set(master)
    adapt2, test2 = split_master(master)
    assert adapt == adapt2 and test == test2


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/libri-test-clean-10s.txt"),
    reason="reference assets not mounted",
)
def test_split_matches_reference_lists_exactly():
    """Derived from the reference's master list, our split must equal its
    frozen libri-adapt.txt / libri-test.txt line for line — the lists need
    not be vendored because they regenerate bit-exactly."""
    with open(f"{REF}/libri-test-clean-10s.txt") as f:
        master = [line.rstrip("\n") for line in f if line.strip()]
    assert len(master) == 2058

    adapt, test = split_master(master)
    with open(f"{REF}/libri-adapt.txt") as f:
        ref_adapt = [line.rstrip("\n") for line in f if line.strip()]
    with open(f"{REF}/libri-test.txt") as f:
        ref_test = [line.rstrip("\n") for line in f if line.strip()]
    assert adapt == ref_adapt
    assert test == ref_test


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/libri-test-clean-10s.txt"),
    reason="reference assets not mounted",
)
def test_from_master_cli(tmp_path):
    out = tmp_path / "lists"
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_splits.py"),
            "--from-master", f"{REF}/libri-test-clean-10s.txt",
            "--from-dev-master", f"{REF}/libri-dev-all.txt",
            "--out-dir", str(out),
        ],
        check=True,
        capture_output=True,
    )
    for name in ALL_LISTS:
        assert _digest(out / name) == _digest(f"{REF}/{name}"), name


def test_vendored_lists_self_consistent():
    """The checked-in lists/ assets regenerate from each other: adapt/test
    from the vendored master, dev-few + dev-all order from the vendored
    dev list. Runs without the reference mounted — the vendored set is
    internally pinned."""
    master = _read(os.path.join(LISTS, "libri-test-clean-10s.txt"))
    assert len(master) == 2058
    adapt, test = split_master(master)
    assert adapt == _read(os.path.join(LISTS, "libri-adapt.txt"))
    assert test == _read(os.path.join(LISTS, "libri-test.txt"))

    dev_all = _read(os.path.join(LISTS, "libri-dev-all.txt"))
    assert len(dev_all) == 2703
    re_all, few = split_dev(dev_all)
    assert re_all == dev_all  # shuffled order is a fixpoint of regeneration
    assert few == _read(os.path.join(LISTS, "libri-dev-few.txt"))

    pat = re.compile(r"^[a-z-]+/\d+/\d+/\d+-\d+-\d+\.flac$")
    for name in ALL_LISTS:
        for line in _read(os.path.join(LISTS, name)):
            assert pat.match(line), (name, line)


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/libri-test-clean-10s.txt"),
    reason="reference assets not mounted",
)
def test_vendored_lists_match_reference_bit_exactly():
    """lists/ == the reference's frozen assets, sha256 for sha256."""
    for name in ALL_LISTS:
        assert _digest(os.path.join(LISTS, name)) == _digest(f"{REF}/{name}"), name


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/libri-test-clean-10s.txt"),
    reason="reference assets not mounted",
)
def test_reference_list_format():
    """The list-file consumption path (filestrs2list + fileroot join,
    /root/reference/dataset.py:39-41) assumes subset/speaker/chapter/utt
    relative FLAC paths — pin that format."""
    pat = re.compile(r"^[a-z-]+/\d+/\d+/\d+-\d+-\d+\.flac$")
    with open(f"{REF}/libri-test-clean-10s.txt") as f:
        for line in f:
            assert pat.match(line.strip()), line
