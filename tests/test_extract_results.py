"""Result-extraction script: scrape TensorBoard event dirs into CSV."""
import os
import subprocess
import sys

import pandas as pd


def test_extract_results_cli(tmp_path):
    from tensorboardX import SummaryWriter

    for noise_id, val in [(3, 0.7), (11, 0.9)]:
        d = tmp_path / f"exp_noise{noise_id}_run"
        w = SummaryWriter(str(d))
        w.add_scalar("test_stoi", val, 1)
        w.add_scalar("test_stoi", val + 0.05, 2)  # later value ignored (first)
        w.add_scalar("test_sisdr", 10.0 + noise_id, 1)
        w.close()

    out = tmp_path / "res.csv"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "extract_results.py"),
         str(tmp_path), "--tags", "test_stoi", "test_sisdr", "--out", str(out)],
        check=True, capture_output=True, text=True,
    )
    df = pd.read_csv(out, index_col=0)
    assert list(df.index) == [3, 11]
    assert abs(df.loc[3, "test_stoi"] - 0.7) < 1e-6
    assert abs(df.loc[11, "test_sisdr"] - 21.0) < 1e-6
