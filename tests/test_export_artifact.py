"""jax.export deployment artifacts: checkpoint -> portable StableHLO
(weights baked in, symbolic batch) -> artifact-only serving path matches
the live checkpoint path."""
import os
import sys

import numpy as np
import pytest

from tests.test_e2e import corpus, make_runner  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def exported(corpus, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    runner, config, args = make_runner(corpus, tmp)
    runner.save_model()

    sys.path.insert(0, REPO)
    from serve import build_enhancer, build_raw_enhancer

    from speech_enhancement_by_s3prl_tpu.utils.export_artifact import (
        export_enhance,
    )

    params, enhance_raw, buckets = build_raw_enhancer(str(tmp), 16000, -25.0)
    art_dir = str(tmp / "artifact")
    export_enhance(enhance_raw, params, buckets[:2], art_dir)
    live = build_enhancer(str(tmp), 16000, -25.0)
    return art_dir, live, buckets


def test_manifest_and_files(exported):
    import json

    art_dir, _, buckets = exported
    with open(os.path.join(art_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["buckets"] == sorted(buckets[:2])
    for t in manifest["buckets"]:
        assert os.path.getsize(os.path.join(art_dir, f"enhance_T{t}.jaxexp")) > 0


def test_artifact_enhancer_matches_live(exported):
    from serve import build_artifact_enhancer

    art_dir, live, _ = exported
    enhance = build_artifact_enhancer(art_dir, 16000)

    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(12000)).astype(np.float32)
    out_art = enhance(wav)
    out_live = live(wav)
    assert out_art.shape == wav.shape
    np.testing.assert_allclose(out_art, out_live, atol=1e-5)


def test_artifact_symbolic_batch(exported):
    """One artifact serves any micro-batch size (symbolic batch dim)."""
    from serve import build_artifact_enhancer

    art_dir, live, _ = exported
    enhance = build_artifact_enhancer(art_dir, 16000)
    rng = np.random.default_rng(1)
    wavs = [
        (0.1 * rng.standard_normal(n)).astype(np.float32)
        for n in (8000, 11000, 9000)
    ]
    outs = enhance.run_batch(wavs)
    for w, o in zip(wavs, outs):
        assert o.shape == w.shape
        np.testing.assert_allclose(o, live(w), atol=1e-5)
