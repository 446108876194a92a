"""LibriSpeech-format corpus path end to end: FLAC files in the
subset/speaker/chapter layout, consumed via a list file + fileroot (the
reference's libri-*.txt branch, /root/reference/dataset.py:39-41), decoded
by the native decoder inside OnlineDataset, batched by the loader."""
import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.data.datasets import (
    OnlineDataset,
    filestrs2list,
)
from speech_enhancement_by_s3prl_tpu.data.loader import DataLoader
from tests.test_flac import (  # noqa: F401
    build_flac,
    encode_fixed1_rice,
    lib_available,
)


@pytest.fixture(scope="module")
def libri_layout(lib_available, tmp_path_factory):
    root = tmp_path_factory.mktemp("LibriSpeech")
    rng = np.random.default_rng(0)
    rel_paths = []
    for spk in (19, 26):
        for chap in (198,):
            d = root / "test-clean" / str(spk) / str(chap)
            d.mkdir(parents=True)
            for utt in range(3):
                samples = np.cumsum(
                    rng.integers(-7, 8, size=4096)
                ).astype(np.int64)
                rel = f"test-clean/{spk}/{chap}/{spk}-{chap}-{utt:04d}.flac"
                (root / rel).write_bytes(
                    build_flac(encode_fixed1_rice(samples), samples)
                )
                rel_paths.append(rel)
    lst = root / "libri-test.txt"
    lst.write_text("".join(p + "\n" for p in sorted(rel_paths)))
    return root, lst, rel_paths


def test_filestrs2list_listfile_fileroot(libri_layout):
    root, lst, rel_paths = libri_layout
    files = filestrs2list(str(lst), fileroot=str(root))
    assert len(files) == len(rel_paths)
    assert all(f.startswith(str(root)) for f in files)
    assert all(f.endswith(".flac") for f in files)


def test_online_dataset_over_flac_corpus(libri_layout):
    root, lst, _ = libri_layout
    ds = OnlineDataset(
        speech={"filestrs": str(lst), "fileroot": str(root)},
        noise={"filestrs": str(lst), "fileroot": str(root)},
        sample_rate=16000,
        max_time=250,
        snrs=[0],
    )
    assert len(ds) == 6
    item = ds[0]
    assert item.shape == (4000, 3)  # max_time crop, (noisy, clean, noise)
    assert np.isfinite(item).all()

    loader = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for lengths, wavs in batches:
        assert wavs.shape[0] == 3 and wavs.shape[1] == 3
        assert np.isfinite(wavs).all()
        assert np.abs(wavs).max() > 0
