"""NoisyCleanDataset end-to-end: paired-corpus training through the Runner
(the vcb.yaml `--trainset NoisyCleanDataset` path)."""
import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.data.audio_io import write_wav
from tests.test_e2e import make_args, make_config


@pytest.fixture(scope="module")
def paired_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("paired")
    rng = np.random.default_rng(0)
    for split in ["tr", "te"]:
        (root / split / "clean").mkdir(parents=True)
        (root / split / "noisy").mkdir()
        for i in range(5):
            t = int(rng.integers(6000, 14000))
            clean = rng.standard_normal(t) * 0.1
            noisy = clean + rng.standard_normal(t) * 0.05
            write_wav(str(root / split / "clean" / f"c_fileid_{i}.wav"), clean, 16000)
            write_wav(str(root / split / "noisy" / f"n_fileid_{i}.wav"), noisy, 16000)
    return root


def test_noisyclean_training(paired_corpus, tmp_path):
    from speech_enhancement_by_s3prl_tpu.models.heads import build_head
    from speech_enhancement_by_s3prl_tpu.models.upstream import DummyUpstream
    from speech_enhancement_by_s3prl_tpu.ops.features import (
        OnlinePreprocessor,
        get_feat_config,
    )
    from speech_enhancement_by_s3prl_tpu.runner.runner import Runner

    config = make_config(paired_corpus)  # reuse runner/model sections
    config["NoisyCleanDataset_train"] = {"roots": [str(paired_corpus / "tr")]}
    config["NoisyCleanDataset_test"] = {"roots": [str(paired_corpus / "te")]}
    args = make_args(str(tmp_path), trainset="NoisyCleanDataset")

    feat_list = [
        get_feat_config("linear", 0),
        get_feat_config("linear", 0),
        get_feat_config("linear", 0),
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    pre.channel_inp, pre.channel_tar = 0, 1
    model = build_head("LSTM", input_size=201, output_size=201,
                       **config["model"]["LSTM"])
    up = DummyUpstream(201)
    runner = Runner(args=args, config=config, preprocessor=pre, upstream=up,
                    upstream2=up, downstream=model, expdir=str(tmp_path))
    runner.set_model()
    runner.train()
    assert runner.global_step == 5

    loss, scores, *_ = runner.evaluate()
    assert np.isfinite(loss) and np.isfinite(scores).all()
