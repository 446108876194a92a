"""Runner-level mesh training: --mesh 4x2 over the 8 virtual CPU devices."""
import numpy as np

from tests.test_e2e import corpus, make_runner  # noqa: F401


def test_runner_trains_on_mesh(corpus, tmp_path):
    runner, config, args = make_runner(corpus, tmp_path)
    runner.config["dataloader"]["batch_size"] = 4
    runner.args.mesh = "4x2"
    runner.set_model()
    assert runner.mesh is not None
    runner.train()
    assert runner.global_step == 5

    loss, scores, *_ = runner.evaluate()
    assert np.isfinite(loss)
