"""Evaluation metrics.

Per-utterance metric functions with the reference naming convention —
``{metric}_eval`` resolved by name (/root/reference/runner.py:78,
/root/reference/evaluation.py) — plus batched on-device versions.

TPU-first redesign: the reference fans each utterance out to a joblib CPU
pool per metric (/root/reference/runner.py:586-603). Here SI-SDR and
STOI/ESTOI are vmapped jitted device kernels scoring the whole padded batch
at once (trimming handled by length masks); only PESQ — an inherently
sequential ITU-T P.862 pipeline — runs host-side (metrics/pesq.py).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .stoi import stoi_coeff_batch


def si_sdr_batch(src: jnp.ndarray, tar: jnp.ndarray, lengths=None, eps: float = 1e-10):
    """Scale-invariant SDR per utterance, (B, T) -> (B,)
    (/root/reference/evaluation.py:5-10 math). Zero padding cancels in the
    inner products, so masking == trimming."""
    if lengths is not None:
        mask = (jnp.arange(src.shape[-1])[None, :] < lengths[:, None]).astype(
            src.dtype
        )
        src = src * mask
        tar = tar * mask
    alpha = (src * tar).sum(-1) / ((tar * tar).sum(-1) + eps)
    ay = alpha[:, None] * tar
    norm = ((ay - src) ** 2).sum(-1) + eps
    return 10.0 * jnp.log10((ay * ay).sum(-1) / norm + eps)


# -- per-utterance reference API (numpy in, float out) ----------------------

def sisdr_eval(src, tar, sr: int = 16000, eps: float = 1e-10) -> float:
    src = jnp.asarray(np.asarray(src))[None]
    tar = jnp.asarray(np.asarray(tar))[None]
    return float(si_sdr_batch(src, tar, eps=eps)[0])


def stoi_eval(src, tar, sr: int = 16000) -> float:
    """STOI of enhanced `src` against clean reference `tar`."""
    return float(
        stoi_coeff_batch(
            jnp.asarray(np.asarray(tar))[None],
            jnp.asarray(np.asarray(src))[None],
            sample_rate=sr,
            extended=False,
        )[0]
    )


def estoi_eval(src, tar, sr: int = 16000) -> float:
    return float(
        stoi_coeff_batch(
            jnp.asarray(np.asarray(tar))[None],
            jnp.asarray(np.asarray(src))[None],
            sample_rate=sr,
            extended=True,
        )[0]
    )


def pesq_nb_eval(src, tar, sr: int = 16000) -> float:
    """ITU-T P.862 narrowband MOS-LQO (/root/reference/evaluation.py:12-18)."""
    from .pesq import pesq_mos_lqo

    return pesq_mos_lqo(np.asarray(tar), np.asarray(src), sr, mode="nb")


def pesq_wb_eval(src, tar, sr: int = 16000) -> float:
    from .pesq import pesq_mos_lqo

    return pesq_mos_lqo(np.asarray(tar), np.asarray(src), sr, mode="wb")


METRIC_REGISTRY: Dict[str, Callable] = {
    "sisdr": sisdr_eval,
    "stoi": stoi_eval,
    "estoi": estoi_eval,
    "pesq_nb": pesq_nb_eval,
    "pesq_wb": pesq_wb_eval,
}

# metrics computable fully on-device for a whole batch (PESQ on device is
# the JAX P.862-model implementation — see metrics/pesq_jax.py for its
# fidelity statement)
DEVICE_BATCH_METRICS = ("sisdr", "stoi", "estoi", "pesq_nb", "pesq_wb")


def device_batch_metrics() -> tuple:
    """The metric names to score on device for this process.

    pesq_* drop to the HOST per-utterance path when the ITU-conformant
    ``pesq`` wheel is importable (then scores are certified, matching what
    the reference logs) or when SE_HOST_PESQ=1 forces it; otherwise they
    stay on device via the approximate JAX P.862 model (clearly labeled by
    metrics/pesq.py on first use)."""
    import os

    from .pesq import itu_pesq_fn

    if os.environ.get("SE_HOST_PESQ") == "1" or itu_pesq_fn() is not None:
        return ("sisdr", "stoi", "estoi")
    return DEVICE_BATCH_METRICS


def build_metrics(names: Sequence[str]) -> List[Callable]:
    """Explicit registry replacing ``eval(f'{m}_eval')``
    (/root/reference/runner.py:78)."""
    for n in names:
        assert n in METRIC_REGISTRY, f"unknown metric {n}"
    return [METRIC_REGISTRY[n] for n in names]


def batch_scores(
    names: Sequence[str],
    wav_predicted: jnp.ndarray,
    wav_tar: jnp.ndarray,
    lengths: jnp.ndarray,
    sample_rate: int = 16000,
) -> Dict[str, jnp.ndarray]:
    """On-device scores for every metric in `names` that has a batch kernel;
    returns {name: (B,) array}. Host-only metrics (pesq_*) are skipped here
    and scored by the runner on host.

    SE_METRIC_CHUNK=<n> (trace-time) scores the batch in sub-batches of n
    via lax.map: the metric kernels' big intermediates (the 10 kHz
    resampled stream, STOI frames/band envelopes, PESQ frame powers) are
    then allocated per chunk instead of for the full batch, cutting peak
    HBM so larger eval batches fit (docs/PERF.md eval table). Scores are
    identical — chunking only tiles the batch dimension."""
    import os

    chunk = int(os.environ.get("SE_METRIC_CHUNK", "0"))
    B = wav_predicted.shape[0]
    if chunk > 0 and B > chunk and B % chunk == 0:
        def score_chunk(args):
            pred, tar, ln = args
            return batch_scores_unchunked(
                names, pred, tar, ln, sample_rate
            )

        parts = jax.lax.map(
            score_chunk,
            (
                wav_predicted.reshape(B // chunk, chunk, -1),
                wav_tar.reshape(B // chunk, chunk, -1),
                lengths.reshape(B // chunk, chunk),
            ),
        )
        return {k: v.reshape(B) for k, v in parts.items()}
    return batch_scores_unchunked(
        names, wav_predicted, wav_tar, lengths, sample_rate
    )


def batch_scores_unchunked(
    names: Sequence[str],
    wav_predicted: jnp.ndarray,
    wav_tar: jnp.ndarray,
    lengths: jnp.ndarray,
    sample_rate: int = 16000,
) -> Dict[str, jnp.ndarray]:
    # when a metric FAMILY is fully requested, score it through its
    # shared-front-end kernel: stoi+estoi differ only in the segment
    # correlation, pesq_nb+pesq_wb only in receive gain + MOS mapping,
    # and XLA does not CSE the duplicated front-ends across separate
    # calls (the alignment lax.while in particular is never merged).
    # Scores are bitwise-identical to the per-metric calls.
    out = {}
    if "stoi" in names and "estoi" in names:
        from .stoi import stoi_estoi_batch

        out["stoi"], out["estoi"] = stoi_estoi_batch(
            wav_tar, wav_predicted, sample_rate, lengths=lengths
        )
    pesq_modes = tuple(
        n.split("_")[1] for n in ("pesq_nb", "pesq_wb") if n in names
    )
    if pesq_modes:
        from .pesq_jax import pesq_batch_modes

        scores = pesq_batch_modes(
            wav_tar, wav_predicted, sample_rate, pesq_modes, lengths=lengths
        )
        for m in pesq_modes:
            out[f"pesq_{m}"] = scores[m]
    for name in names:
        if name in out:
            continue
        if name == "sisdr":
            out[name] = si_sdr_batch(wav_predicted, wav_tar, lengths)
        elif name == "stoi":
            out[name] = stoi_coeff_batch(
                wav_tar, wav_predicted, sample_rate, extended=False, lengths=lengths
            )
        elif name == "estoi":
            out[name] = stoi_coeff_batch(
                wav_tar, wav_predicted, sample_rate, extended=True, lengths=lengths
            )
    return out
