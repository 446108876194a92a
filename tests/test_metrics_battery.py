"""Regression pins for the conformance battery (scripts/metrics_conformance.py).

The deterministic battery's JAX metric values are frozen here (CPU
backend, Precision.HIGHEST kernels) so refactors of the STOI/PESQ
kernels cannot drift the scoreboard silently — the same role the pinned
PMSQE scale plays for the loss (docs/PARITY_NOTES.md). External-truth
deltas still require the pesq/pystoi wheels (absent in-image); run the
conformance script where they exist.
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from metrics_conformance import battery  # noqa: E402

from speech_enhancement_by_s3prl_tpu.metrics import estoi_eval, stoi_eval
from speech_enhancement_by_s3prl_tpu.metrics.pesq_jax import pesq_batch

# name -> (pesq_nb, stoi, estoi), frozen from the CPU reference run
# (PESQ re-pinned in round 3: published-table P.862 model, p862_tables.py)
PINNED = {
    "white_snr20": (1.8298, 0.51806, 0.09596),
    "white_snr10": (1.3591, 0.49390, 0.09740),
    "white_snr5": (1.2296, 0.47375, 0.09476),
    "white_snr0": (1.1823, 0.37419, 0.06934),
    "white_snr-5": (1.1738, 0.28926, 0.04990),
    "gain+6dB": (4.5486, 0.99998, 1.00000),
    "lowpass": (4.5438, 0.97776, 0.76085),
    "clip": (1.5103, 0.63414, -0.01135),
}


@pytest.mark.parametrize("idx,name", [(i, n) for i, (n, _, _) in
                                      enumerate(battery())])
def test_battery_values_pinned(idx, name):
    pairs = battery()
    _, clean, deg = pairs[idx]
    pesq_pin, stoi_pin, estoi_pin = PINNED[name]
    pesq = float(
        pesq_batch(jnp.asarray(clean)[None], jnp.asarray(deg)[None],
                   16000, mode="nb")[0]
    )
    assert abs(pesq - pesq_pin) < 5e-3, (name, pesq, pesq_pin)
    assert abs(stoi_eval(deg, clean) - stoi_pin) < 2e-3, name
    assert abs(estoi_eval(deg, clean) - estoi_pin) < 2e-3, name
