"""Data-pipeline tests on a synthetic on-disk corpus (the reference has no
test suite; SURVEY.md section 4 calls for synthetic-corpus integration
coverage)."""
import os

import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.data.audio_io import (
    load_audio,
    read_wav,
    write_wav,
)
from speech_enhancement_by_s3prl_tpu.data.datasets import (
    NoisyCleanDataset,
    OnlineDataset,
    PseudoDataset,
    filestrs2list,
    pad_collate,
)
from speech_enhancement_by_s3prl_tpu.data.loader import (
    DataLoader,
    bucket_length,
    default_buckets,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    speech_dir = root / "speech"
    noise_dir = root / "noise"
    speech_dir.mkdir()
    noise_dir.mkdir()
    for i in range(8):
        t = rng.integers(8000, 24000)
        write_wav(str(speech_dir / f"utt{i}.wav"), rng.standard_normal(t) * 0.1, 16000)
    for i in range(4):
        t = rng.integers(4000, 12000)
        write_wav(str(noise_dir / f"n{i}.wav"), rng.standard_normal(t) * 0.1, 16000)
    return root


def test_wav_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, wav, 16000)
    out, sr = read_wav(p)
    assert sr == 16000 and out.shape == (1, 5000)
    np.testing.assert_allclose(out[0], wav, atol=1.5 / 32767)


def test_load_audio_resamples(tmp_path):
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    p = str(tmp_path / "y.wav")
    write_wav(p, wav, 8000)
    out, sr = load_audio(p, sr=16000)
    assert sr == 16000
    assert abs(len(out) - 16000) <= 2


def test_filestrs2list_dir_listfile_glob(corpus, tmp_path):
    d = filestrs2list(str(corpus / "speech"))
    assert len(d) == 8
    # deterministic across calls (seed-0 shuffle, dataset.py:46)
    assert d == filestrs2list(str(corpus / "speech"))

    listfile = tmp_path / "list.txt"
    listfile.write_text("speech/utt0.wav\nspeech/utt1.wav\n")
    lst = filestrs2list(str(listfile), fileroot=str(corpus))
    assert len(lst) == 2 and all(os.path.exists(p) for p in lst)

    g = filestrs2list(str(corpus / "speech" / "utt*.wav"))
    assert len(g) == 8

    # sample_num split: first k (select_sampled) vs the rest
    head = filestrs2list(str(corpus / "speech"), sample_num=3, select_sampled=True)
    tail = filestrs2list(str(corpus / "speech"), sample_num=3, select_sampled=False)
    assert len(head) == 3 and len(tail) == 5 and not (set(head) & set(tail))


def test_online_dataset_deterministic_fixed_mode(corpus):
    kw = dict(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        sample_rate=16000,
        max_time=1200,
        snrs=[-4, 0, 4],
        infinite=False,
    )
    ds1, ds2 = OnlineDataset(**kw), OnlineDataset(**kw)
    assert len(ds1) == 8
    a, b = ds1[3], ds2[3]
    np.testing.assert_array_equal(a, b)  # fixed noise+snr per index
    assert a.shape[1] == 3 and a.shape[0] <= 16 * 1200
    # noisy == speech + scaled_noise
    np.testing.assert_allclose(a[:, 0], a[:, 1] + a[:, 2], atol=1e-6)


def test_online_dataset_max_time_trim_and_min_time_pad(corpus):
    ds = OnlineDataset(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=500,
        min_time=400,
    )
    for i in range(len(ds)):
        t = ds[i].shape[0]
        assert t <= 16 * 500


def test_online_dataset_half_noise_disjoint(corpus):
    kw = dict(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=1000,
        snrs=[0],
    )
    front = OnlineDataset(**kw, half_noise="front")
    end = OnlineDataset(**kw, half_noise="end")
    # same speech, different noise halves
    f, e = front[0], end[0]
    np.testing.assert_array_equal(f[:, 1], e[:, 1])
    assert not np.allclose(f[:, 2], e[:, 2])


def test_online_dataset_pseudo_modes(corpus):
    pc = [np.ones(5000, np.float32) * 0.01]
    pn = [np.ones(5000, np.float32) * 0.02]
    ds = OnlineDataset(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=1000,
        pseudo_modes=[3],
        pseudo_clean=pc,
        pseudo_noise=pn,
        infinite=True,
    )
    wavs, case = ds[0]
    assert case == 3
    # case 3: speech is the (normalized) pseudo-clean constant signal
    assert np.std(wavs[:, 1]) < 1e-4


def test_get_subset_is_deterministic(corpus):
    ds = OnlineDataset(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=1000,
        infinite=True,
    )
    s1 = ds.get_subset(n_file=4)
    s2 = ds.get_subset(n_file=4)
    assert s1.id_mapping == s2.id_mapping and len(s1) == 4
    assert not s1.infinite


def test_noisy_clean_dataset_pairs(tmp_path):
    rng = np.random.default_rng(3)
    root = tmp_path / "paired"
    (root / "clean").mkdir(parents=True)
    (root / "noisy").mkdir()
    for i in range(4):
        t = int(rng.integers(6000, 12000))
        clean = rng.standard_normal(t) * 0.1
        write_wav(str(root / "clean" / f"clnsp_fileid_{i}.wav"), clean, 16000)
        write_wav(
            str(root / "noisy" / f"noisy1_snr5_fileid_{i}.wav"),
            clean + rng.standard_normal(t) * 0.05,
            16000,
        )
    ds = NoisyCleanDataset(roots=[str(root)], max_sec=0.5)
    assert len(ds) == 4
    item = ds[0]
    assert item.ndim == 2 and item.shape[1] == 2
    assert item.shape[0] <= 8000  # max_sec crop

    # crop uses the GLOBAL random module (as the reference's random.randint,
    # /root/reference/dataset.py:239-243) so a reseed — what Runner.evaluate
    # does — makes eval crops reproducible
    import random as _random

    _random.seed(0)
    a = ds[0]
    _random.seed(0)
    b = ds[0]
    np.testing.assert_array_equal(a, b)


def test_pad_collate_layout():
    samples = [np.ones((100, 3), np.float32), np.ones((150, 3), np.float32) * 2]
    lengths, wavs = pad_collate(samples)
    assert wavs.shape == (2, 3, 150)
    np.testing.assert_array_equal(lengths, [100, 150])
    assert wavs[0, 0, 100:].sum() == 0  # zero padding

    lengths, wavs = pad_collate(samples, pad_to=64)
    assert wavs.shape[-1] == 192  # rounded up to bucket multiple

    with_cases = [(samples[0], 1), (samples[1], 3)]
    lengths, wavs, cases = pad_collate(with_cases)
    np.testing.assert_array_equal(cases, [1, 3])


def test_bucketed_loader_static_shapes(corpus):
    ds = OnlineDataset(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=1500,
        infinite=False,
    )
    buckets = default_buckets(16000, 1500)
    loader = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2, buckets=buckets)
    shapes = set()
    count = 0
    for lengths, wavs in loader:
        assert wavs.shape[-1] in buckets
        shapes.add(wavs.shape[-1])
        count += len(lengths)
    assert count == len(ds)
    assert len(loader) == 3


def test_loader_reseed_reproducible_and_worker_count_invariant(corpus):
    """The reference's determinism contract: reseed the global RNG and the
    data stream reproduces (/root/reference/runner.py:522-527). With the
    threaded loader this holds via per-item seed streams — and the stream
    is additionally identical for any worker count."""
    import random as _random

    ds = OnlineDataset(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=1500,
        infinite=True,  # per-item noise/SNR draws
        snrs=[-5, 0, 5],
    )

    def epoch(num_workers, seed=7):
        _random.seed(seed)
        loader = DataLoader(ds, batch_size=3, shuffle=True,
                            num_workers=num_workers)
        return [np.asarray(w) for _, w in loader]

    a = epoch(4)
    b = epoch(4)
    c = epoch(1)
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(x, y)
        np.testing.assert_array_equal(x, z)
    # different global seed -> different draws
    d = epoch(4, seed=8)
    assert any(x.shape != y.shape or not np.array_equal(x, y)
               for x, y in zip(a, d))


def test_pseudo_dataset_smoke():
    ds = PseudoDataset(n=10, time=1000)
    lengths, wavs = ds.collate_fn([ds[0], ds[1]])
    assert wavs.shape == (2, 2, 1000)


def test_bucket_length():
    assert bucket_length(100, [64, 128, 256]) == 128
    assert bucket_length(1000, [64, 128, 256]) == 256


def test_device_prefetch_preserves_order_and_content():
    from speech_enhancement_by_s3prl_tpu.data.loader import device_prefetch

    batches = [(np.asarray([i]), np.full((2, 3, 10), i, np.float32))
               for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, (lengths, wavs) in enumerate(out):
        assert int(np.asarray(lengths)[0]) == i
        assert float(np.asarray(wavs)[0, 0, 0]) == i


def test_infinite_iterator_wraps(corpus):
    from speech_enhancement_by_s3prl_tpu.data.datasets import OnlineDataset
    from speech_enhancement_by_s3prl_tpu.data.loader import (
        DataLoader,
        infinite_iterator,
    )

    ds = OnlineDataset(
        speech={"filestrs": str(corpus / "speech")},
        noise={"filestrs": str(corpus / "noise")},
        max_time=500,
    )
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
    it = infinite_iterator(loader)
    n_batches = len(loader)
    seen = [next(it) for _ in range(n_batches * 2 + 1)]  # wraps twice
    assert len(seen) == n_batches * 2 + 1


def test_read_wav_corrupt_inputs_raise_valueerror(tmp_path):
    """Corrupt WAV bytes must surface as ValueError, never a raw
    ZeroDivisionError/KeyError/struct.error from parser internals."""
    import struct as _struct

    def wav_bytes(audio_format=1, channels=1, rate=16000, bits=16,
                  data=b"\x00\x00" * 8, fmt_trunc=None):
        fmt = _struct.pack("<HHIIHH", audio_format, channels, rate,
                           rate * channels * (bits // 8 or 1),
                           channels * (bits // 8 or 1), bits)
        if fmt_trunc is not None:
            fmt = fmt[:fmt_trunc]
        body = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        body += b"data" + _struct.pack("<I", len(data)) + data
        return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    cases = {
        "notriff.wav": b"OggS" + b"\x00" * 40,
        "zerochan.wav": wav_bytes(channels=0),
        "zerorate.wav": wav_bytes(rate=0),
        "badbits.wav": wav_bytes(bits=7),
        "zerobits.wav": wav_bytes(bits=0),
        "badfloat.wav": wav_bytes(audio_format=3, bits=16),
        "badfmt.wav": wav_bytes(audio_format=0x55),
        "shortfmt.wav": wav_bytes(fmt_trunc=10),
        "nodata.wav": b"RIFF" + _struct.pack("<I", 4) + b"WAVE",
    }
    for name, raw in cases.items():
        p = tmp_path / name
        p.write_bytes(raw)
        with pytest.raises(ValueError):
            read_wav(str(p))


def test_read_wav_ragged_data_chunk(tmp_path):
    """A data chunk that is not a multiple of the sample width decodes the
    whole frames present instead of raising."""
    import struct as _struct

    fmt = _struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = b"\x01\x00\x02\x00\x03"  # 2.5 int16 samples
    body = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data + b"\x00"
    raw = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    p = tmp_path / "ragged.wav"
    p.write_bytes(raw)
    out, sr = read_wav(str(p))
    assert sr == 16000 and out.shape == (1, 2)


def test_loader_prefetch_bound_limits_readahead():
    """Workers must not decode the whole epoch ahead of a slow consumer:
    completed-but-unconsumed batches are capped at `prefetch` (plus one
    in-flight item per worker), bounding host memory."""
    import threading
    import time

    fetched = []
    fetched_lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with fetched_lock:
                fetched.append(i)
            return np.zeros((100, 3), np.float32)

        def collate_fn(self, samples, pad_to=None):
            wavs = np.stack(samples).transpose(0, 2, 1)
            return np.full((len(samples),), 100, np.int64), wavs

    prefetch, workers, bs = 2, 2, 4
    loader = DataLoader(
        CountingDataset(), batch_size=bs, shuffle=False,
        num_workers=workers, prefetch=prefetch,
    )
    it = iter(loader)
    next(it)  # consume one batch, then stall while workers run ahead
    time.sleep(1.0)
    with fetched_lock:
        ahead = len(fetched)
    # consumed 1 batch; readahead is bounded by the cap + one batch being
    # assembled per worker (each worker blocks only after storing)
    assert ahead <= (1 + prefetch + workers) * bs, ahead
    # draining the iterator still yields every batch exactly once
    rest = list(it)
    assert len(rest) == len(loader) - 1
    with fetched_lock:
        assert sorted(fetched) == list(range(64))


def test_read_wav_24bit_and_float64(tmp_path):
    """24-bit PCM and IEEE float64 WAVs decode correctly (the reference's
    librosa path accepts these containers; our parser must too)."""
    import struct as _struct

    def wav_bytes(fmt_code, bits, payload):
        fmt = _struct.pack(
            "<HHIIHH", fmt_code, 1, 16000, 16000 * bits // 8, bits // 8, bits
        )
        body = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        body += b"data" + _struct.pack("<I", len(payload)) + payload
        return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # 24-bit PCM: values at +-half scale and zero
    vals = [1 << 22, -(1 << 22), 0]
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    p = tmp_path / "p24.wav"
    p.write_bytes(wav_bytes(1, 24, payload))
    out, sr = read_wav(str(p))
    assert sr == 16000
    np.testing.assert_allclose(out[0], [0.5, -0.5, 0.0], atol=1e-6)

    # IEEE float64
    f64 = np.array([0.25, -0.125, 1.0], np.float64)
    p = tmp_path / "f64.wav"
    p.write_bytes(wav_bytes(3, 64, f64.tobytes()))
    out, sr = read_wav(str(p))
    np.testing.assert_allclose(out[0], f64.astype(np.float32), atol=1e-7)


def test_noisy_clean_sampling_branches(tmp_path):
    """NoisyCleanDataset sample_ratio complement, sample_num repetition and
    get_subset (reference dataset.py:190-261 config surface)."""
    rng = np.random.default_rng(5)
    root = tmp_path / "paired2"
    (root / "clean").mkdir(parents=True)
    (root / "noisy").mkdir()
    for i in range(6):
        clean = rng.standard_normal(7000) * 0.1
        write_wav(str(root / "clean" / f"clnsp_fileid_{i}.wav"), clean, 16000)
        write_wav(str(root / "noisy" / f"noisy1_snr5_fileid_{i}.wav"),
                  clean, 16000)

    full = NoisyCleanDataset(roots=[str(root)], max_sec=0.5)
    picked = NoisyCleanDataset(roots=[str(root)], max_sec=0.5,
                               sample_ratio=0.5, select_sampled=True)
    rest = NoisyCleanDataset(roots=[str(root)], max_sec=0.5,
                             sample_ratio=0.5, select_sampled=False)
    assert len(picked) == 3 and len(rest) == 3
    # complement split: together they cover the full set exactly once
    assert sorted(picked.clean_pths + rest.clean_pths) == sorted(full.clean_pths)

    # sample_num larger than the corpus repeats files (reference repeat
    # semantics) and smaller truncates
    big = NoisyCleanDataset(roots=[str(root)], max_sec=0.5, sample_num=10)
    assert len(big) == 10
    small = NoisyCleanDataset(roots=[str(root)], max_sec=0.5, sample_num=2)
    assert len(small) == 2

    sub = full.get_subset(ratio=0.5)
    assert len(sub) == 3
    sub_seeded = full.get_subset(ratio=0.5, sample_seed=7)
    assert len(sub_seeded) == 3
    assert set(sub_seeded.clean_pths) <= set(full.clean_pths)
