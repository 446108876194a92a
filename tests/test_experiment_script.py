"""Fast pieces of scripts/experiment_active_adaptation.py: corpus
generators produce valid distinct-domain audio, and the run configs are
loadable by the CLI config machinery. (The full pipeline is exercised by
running the script; see docs/EXPERIMENTS.md.)"""
import os
import sys

import numpy as np

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
sys.path.insert(0, SCRIPTS)

import experiment_active_adaptation as ex


def _flatness(x, sr=16000):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) + 1e-12
    return float(np.exp(np.mean(np.log(spec))) / np.mean(spec))


def test_generators_shape_and_domain_separation():
    rng = np.random.default_rng(0)
    n = 16000
    sp, wh, pk, tn = (f(rng, n) for f in (ex._speech, ex._white, ex._pink,
                                          ex._tonal))
    for x in (sp, wh, pk, tn):
        assert x.shape == (n,) and x.dtype == np.float32
        assert np.isfinite(x).all() and np.abs(x).max() <= 0.75
    # spectral flatness separates the domains: white is flat, tonal sparse
    assert _flatness(wh) > 0.6
    assert _flatness(tn) < 0.4
    assert _flatness(sp) < 0.1
    assert _flatness(pk) < _flatness(wh)


def test_gen_corpus_layout(tmp_path):
    rng = np.random.default_rng(1)
    ex.gen_corpus(str(tmp_path), rng, n_speech_train=2, n_speech_test=1,
                  n_white=1, n_pink=1, n_tonal_train=1, n_tonal_test=1)
    counts = {
        "speech_train": 2, "speech_test": 1, "noise_pool": 3,
        "noise_source": 2, "noise_white": 1, "noise_pink": 1,
        "noise_tonal_train": 1, "noise_target": 1,
    }
    for sub, n in counts.items():
        assert len(os.listdir(tmp_path / sub)) == n, sub

    from speech_enhancement_by_s3prl_tpu.data.audio_io import read_audio

    wav, sr = read_audio(str(tmp_path / "speech_train" / "s0.wav"))
    assert sr == 16000 and wav.shape[0] == 1 and wav.shape[-1] > 16000


def test_downstream_config_is_cli_loadable(tmp_path):
    class A:
        batch_size = 2
        active_batch_size = 2
        query_num = 2
        learning_rate = 1e-3
        objective = "SISDR"
        hidden = 8
        max_time = 1000
        snrs = [0]

    cfg = ex.downstream_config(str(tmp_path), A, "ns", "nt", total_step=4,
                               pseudo_modes=[0, 1, 2, 3])
    assert cfg["OnlineDataset_train"]["pseudo_modes"] == [0, 1, 2, 3]
    assert cfg["runner"]["eval_metrics"] == ["stoi", "pesq_nb", "sisdr"]
    assert set(cfg) >= {"dataloader", "preprocessor", "runner", "objective",
                        "model", "OnlineDataset_train", "OnlineDataset_test"}
    # the sampler knobs the sync/async branches read are all present
    for key in ("active_query_num", "active_refresh_step",
                "active_buffer_weights", "sampler_refresh_step",
                "sampler_collect_step", "sampler_sample_num"):
        assert key in cfg["runner"], key
