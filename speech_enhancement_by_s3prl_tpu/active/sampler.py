"""Active-learning sampler.

The reference runs a child *process* that scores utterances by per-sample
gradient embeddings — one backward pass per utterance in a Python loop
(/root/reference/sampler.py:59-110) — cosine-matches them against the mean
gradient of a pseudo-target "query" batch, thresholds at 0, and fills four
per-case buffers consumed by the trainer (sampler.py:123-217).

TPU-native redesign:

- per-sample gradients come from ONE ``jax.vmap(jax.grad(...))`` call — the
  whole batch of gradient embeddings in a single compiled program (SURVEY.md
  section 7 item 8);
- layer filtering (``--active_layerid``, sampler.py:97-103) selects the
  ``lstm/l{id}_*`` parameter subtree before flattening;
- the asynchronous sampler is a host THREAD driving its own jitted scoring
  program (optionally on a second device via ``jax.device_put``) instead of
  a spawned process — no tensor pickling across process boundaries, buffers
  are plain host arrays;
- the SIGTERM-flush contract (sampler.py:132-143) becomes a ``stop()`` that
  drains buffers synchronously; the trainer-side 'collect' message protocol
  (runner.py:251-263) is a method call with a lock.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ACTIVE_BUFFER_NUM = 4


def _select_layer(params, layerid: Optional[int]):
    """Keep only lstm layer `layerid` params (both directions) when set."""
    if layerid is None:
        return params

    def walk(tree, path=()):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                sub = walk(v, p)
                if sub:
                    out[k] = sub
            else:
                joined = "/".join(p)
                if f"l{layerid}_" in joined:
                    out[k] = v
        return out

    selected = walk(params["params"] if "params" in params else params)
    return {"params": selected} if "params" in params else selected


def _split_layer(params, layerid: Optional[int]):
    """Partition params into (selected, rest) by the layer predicate.

    Differentiating wrt the SELECTED subtree only is mathematically
    identical to grad-then-filter for the embedded coordinates (the
    reference filters after the fact, /root/reference/sampler.py:97-103),
    but skips computing + materializing per-sample weight-grad outer
    products for every non-embedded layer — the bulk of the vmap(grad)
    program's FLOPs and memory when --active_layerid is set. Leaf order
    of `selected` matches _select_layer's, so embeddings from the split
    path are coordinate-compatible with grad-then-filter ones."""
    if layerid is None:
        return params, None

    def walk(tree, path=()):
        sel, rest = {}, {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                s, r = walk(v, p)
                if s:
                    sel[k] = s
                if r:
                    rest[k] = r
            elif f"l{layerid}_" in "/".join(p):
                sel[k] = v
            else:
                rest[k] = v
        return sel, rest

    wrapped = "params" in params
    sel, rest = walk(params["params"] if wrapped else params)
    if wrapped:
        sel, rest = {"params": sel}, {"params": rest}
    return sel, rest


def _merge_trees(a, b):
    """Inverse of _split_layer: recombine disjoint nested dicts."""
    if b is None:
        return a
    out = dict(b)
    for k, v in a.items():
        out[k] = _merge_trees(v, b[k]) if isinstance(v, dict) and k in b else v
    return out


def _flatten(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([l.reshape(l.shape[0], -1) for l in leaves], axis=-1)


def _capture_supported(model, layerid: Optional[int]) -> bool:
    """The capture scorer needs a bidirectional-LSTM head whose stack can
    be instrumented (models/lstm.py capture_layer): one layer for an
    explicit ``layerid``, or the whole head (every LSTM layer + the
    scaling Dense) for ``layerid=None`` — the reference's default
    whole-tree embedding."""
    from ..models.heads import LSTM, Residual

    if not (isinstance(model, (LSTM, Residual)) and bool(model.bidirectional)):
        return False
    return layerid is None or 0 <= layerid < model.num_layers


def make_scoring_fn(
    step_builder,
    active_layerid: Optional[int] = None,
    impl: Optional[str] = None,
) -> Callable:
    """Build ``scoring(params, wavs, lengths, mean=False, rng=None) ->
    (B|1, P)``.

    ``mean=False``: per-utterance gradient embeddings via vmap(grad).
    ``mean=True``: single gradient of the batch loss (the query-side path,
    /root/reference/runner.py:390, sampler.py:83-87).

    The loss runs in train mode — the reference scores with the live
    (train-mode) downstream (/root/reference/sampler.py:89-106), so
    dropout-bearing heads (Mockingjay) are scored with dropout active.
    ``rng`` seeds those dropout masks; omitted, a fixed key keeps the
    no-dropout flagship heads bit-deterministic.

    ``impl`` selects the per-sample engine (default from ``SE_SCORE_IMPL``,
    else 'vmap'):

    - ``'vmap'``: per-sample grads via ``jax.vmap(jax.grad(...))`` —
      bit-parity with grad-then-filter (the reference's per-utterance
      backward loop, /root/reference/sampler.py:89-106).
    - ``'capture'``: ONE batched backward; the per-sample layer grads are
      reconstructed from the captured gate cotangents as outer-product
      einsums (g_Wih = sum_t x_t (x) d_t etc. — models/lstm.py
      capture_layer). Mathematically the same embedding up to a POSITIVE
      per-sample scale (the objective's batch reduction weights), which
      cancels in the cosine matching the scores feed
      (/root/reference/sampler.py:113-116); match scores are preserved.
      Runs the recurrence fully batched, so it composes with the Pallas
      kernel (``SE_PALLAS_LSTM=1``) which ``vmap(grad)`` cannot use.
      Requires a bidirectional LSTM/Residual head; covers both a single
      ``active_layerid`` and the whole-tree default (``layerid=None``
      instruments every LSTM layer + the scaling Dense); silently falls
      back to 'vmap' for other heads. For
      dropout-bearing heads the mask stream differs (one batch-wide mask
      vs per-sample keys) — both are valid train-mode scorings.
    """
    sb = step_builder
    if impl is None:
        impl = os.environ.get("SE_SCORE_IMPL", "vmap")
    if impl not in ("vmap", "capture"):
        raise ValueError(f"unknown scoring impl {impl!r}")
    if impl == "capture" and not _capture_supported(sb.model, active_layerid):
        import warnings

        warnings.warn(
            f"SE_SCORE_IMPL=capture is not supported for "
            f"{type(sb.model).__name__} (needs a bidirectional LSTM/"
            f"Residual head; layerid={active_layerid!r}) — falling back "
            "to the vmap engine",
            stacklevel=2,
        )
        impl = "vmap"

    def batch_loss(params, wavs, lengths, rng):
        from ..runner.trainer import make_context

        ctx = make_context(sb.preprocessor, wavs, lengths, sb.channel_inp,
                           sb.channel_tar)
        loss, _ = sb.loss_fn(params, ctx, rngs={"dropout": rng})
        return loss

    def _checked_split(params):
        sel, rest = _split_layer(params, active_layerid)
        if active_layerid is not None and not jax.tree.leaves(sel):
            raise ValueError(
                f"--active_layerid {active_layerid}: no parameter path "
                f"contains 'l{active_layerid}_' — the configured "
                "downstream has no such LSTM layer"
            )
        return sel, rest

    @jax.jit
    def scoring_mean(params, wavs, lengths, rng):
        sel, rest = _checked_split(params)

        def loss_sel(s):
            return batch_loss(_merge_trees(s, rest), wavs, lengths, rng)

        g = jax.grad(loss_sel)(sel)
        flat = jnp.concatenate([l.reshape(-1) for l in jax.tree.leaves(g)])
        return flat[None, :]

    @jax.jit
    def scoring_per_sample(params, wavs, lengths, rng):
        sel, rest = _checked_split(params)

        def one(s, w, l, k):
            return batch_loss(_merge_trees(s, rest), w[None], l[None], k)

        keys = jax.random.split(rng, wavs.shape[0])
        g = jax.vmap(jax.grad(one), in_axes=(None, 0, 0, 0))(
            sel, wavs, lengths, keys
        )
        return _flatten(g)

    model_cap = (
        sb.model.clone(
            capture_layer="all" if active_layerid is None else active_layerid
        )
        if impl == "capture" else None
    )

    def _lstm_layer_grads(inter, delta, layer):
        """Per-sample grads of one bidirectional layer from its captured
        streams, shaped like the param leaves with a leading batch dim."""
        xs = inter[f"l{layer}_xs"][0]                      # (2, B, T, D)
        hs = inter[f"l{layer}_hs"][0]                      # (2, B, T, H)
        d = delta[f"l{layer}_xw"].astype(jnp.float32)      # (2, B, T, 4H)
        h_prev = jnp.concatenate(
            [jnp.zeros_like(hs[:, :, :1]), hs[:, :, :-1]], axis=2
        )
        # torch layout: w_ih (4H, D), w_hh (4H, H); per-sample grads are
        # Sum_t d_t (x) x_t / h_{t-1}, biases both Sum_t d_t (gates are
        # xw + b_ih + b_hh + h W_hh^T, all additive). Direction index 1
        # is the time-flipped (bwd) one.
        g_wih = jnp.einsum("dbtg,dbtn->dbgn", d, xs)
        g_whh = jnp.einsum("dbtg,dbtk->dbgk", d, h_prev)
        g_b = d.sum(axis=2)                                # (2, B, 4H)
        return {
            f"l{layer}_fwd": {"b_ih": g_b[0], "b_hh": g_b[0],
                              "w_hh": g_whh[0], "w_ih": g_wih[0]},
            f"l{layer}_bwd": {"b_ih": g_b[1], "b_hh": g_b[1],
                              "w_hh": g_whh[1], "w_ih": g_wih[1]},
        }

    @jax.jit
    def scoring_per_sample_capture(params, wavs, lengths, rng):
        from ..runner.trainer import make_context

        sel, _ = _checked_split(params)  # also fails loudly on bad layerid
        ctx = make_context(sb.preprocessor, wavs, lengths, sb.channel_inp,
                           sb.channel_tar)
        rngs = {"dropout": rng}
        down_inp = sb._down_inp(ctx, None, train=True, rngs=rngs)
        kwargs = {"deterministic": False, "rngs": rngs}

        # perturbation structure (zeros) without running the forward
        pert0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(
                lambda: model_cap.apply(
                    params, features=down_inp, linears=ctx["linear_inp"],
                    mutable=["perturbations", "intermediates"], **kwargs,
                )
            )[1]["perturbations"],
        )

        def loss_p(pert):
            (predicted, aux), mut = model_cap.apply(
                {**params, "perturbations": pert},
                features=down_inp, linears=ctx["linear_inp"],
                mutable=["intermediates"], **kwargs,
            )
            full_ctx = {**ctx, "predicted": predicted, **aux}
            loss, _ = sb.objective(**full_ctx)
            return loss, mut["intermediates"]

        (_, inter), delta = jax.value_and_grad(loss_p, has_aux=True)(pert0)

        layers = (
            range(sb.model.num_layers) if active_layerid is None
            else [active_layerid]
        )
        g_lstm = {}
        for l in layers:
            g_lstm.update(_lstm_layer_grads(inter["lstm"], delta["lstm"], l))
        tree = {"lstm": g_lstm}
        if active_layerid is None:
            # scaling Dense: flax kernel is (in, out); per-sample grads
            # from the sowed input and the output cotangent
            xs = inter["scaling_xs"][0]                    # (B, T, D)
            d = delta["scaling_xw"].astype(jnp.float32)    # (B, T, O)
            tree["scaling_layer"] = {
                "bias": d.sum(axis=1),
                "kernel": jnp.einsum("btd,bto->bdo", xs, d),
            }
        g_tree = {"params": tree} if "params" in params else tree
        # the assembled tree must mirror the differentiated subtree key
        # for key — catches silent drift if a head grows parameters the
        # capture assembly does not know about
        want = jax.tree.structure(sel)
        have = jax.tree.structure(g_tree)
        if want != have:
            raise ValueError(
                f"capture scorer assembled {have} but the selected "
                f"parameter subtree is {want} — capture instrumentation "
                "does not cover this head; use SE_SCORE_IMPL=vmap"
            )
        return _flatten(g_tree)

    per_sample = (
        scoring_per_sample_capture if impl == "capture" else scoring_per_sample
    )

    def scoring(params, wavs, lengths, mean: bool = False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        fn = scoring_mean if mean else per_sample
        return fn(params, jnp.asarray(wavs), jnp.asarray(lengths), rng)

    # AOT hooks: the UNJITTED per-sample program + the resolved engine, so
    # callers with static shapes (bench.py) can route it through the
    # Pallas executable cache (ops/pallas/exec_cache.compile_cached) —
    # Mosaic custom-calls are not covered by the persistent HLO cache
    scoring.raw_per_sample = per_sample.__wrapped__
    scoring.impl = impl
    return scoring


def matching(query_scores: jnp.ndarray, key_scores: jnp.ndarray, eps: float = 1e-12):
    """Cosine similarity of each key embedding against the mean query
    embedding (/root/reference/sampler.py:113-116)."""
    q = query_scores / (
        jnp.sqrt((query_scores**2).sum(-1, keepdims=True)) + eps
    )
    k = key_scores / (jnp.sqrt((key_scores**2).sum(-1, keepdims=True)) + eps)
    return k @ q.mean(axis=0)


def thresholding(match_scores) -> jnp.ndarray:
    return match_scores > 0


def hist_scoring(preprocessor, wavs: jnp.ndarray, mean: bool = False) -> jnp.ndarray:
    """Noise-spectrum histogram signature, the alternative scorer
    (/root/reference/sampler.py:219-235): binary above-mean occupancy of the
    scaled-noise magnitude spectrum, L2-normalized."""
    scaled_noise = wavs[:, -1]
    scale = jnp.abs(scaled_noise).max(axis=-1, keepdims=True)
    scaled_noise = scaled_noise / jnp.maximum(scale, 1e-12)
    complx = preprocessor.stft_complex(scaled_noise)
    power, _ = preprocessor.magphase(complx)
    linear = jnp.sqrt(power)  # magnitude (B, T', F)
    hist = (linear > linear.mean(axis=1, keepdims=True)).astype(jnp.float32)
    hist = hist.mean(axis=1)
    hist = hist / jnp.maximum(jnp.linalg.norm(hist, axis=-1, keepdims=True), 1e-12)
    return hist.mean(axis=0, keepdims=True) if mean else hist


def hist_thresholding(match_scores) -> jnp.ndarray:
    return match_scores > 0.8


class AsyncSampler:
    """Background scoring thread filling per-case sample buffers.

    Mirrors the child-process lifecycle of /root/reference/runner.py:223-263:
    ``start()`` begins the candidate scan, ``collect(n)`` atomically drains
    up to n samples per case, ``stop()`` terminates (flushing like the
    SIGTERM handler). The trainer periodically stops and restarts the
    sampler with fresh params (``sampler_refresh_step``).
    """

    def __init__(
        self,
        scoring_fn: Callable,
        params,
        dataset,
        loader_factory: Callable[[], Any],
        query_batch,
        sample_num: int,
        device=None,
    ):
        self.scoring = scoring_fn
        self.params = params
        self.loader_factory = loader_factory
        self.sample_num = sample_num
        self.device = device
        self._buffers: Dict[int, List[dict]] = {i: [] for i in range(ACTIVE_BUFFER_NUM)}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._query_batch = query_batch
        self.query_scores = None

    def _put(self, x):
        return jax.device_put(x, self.device) if self.device is not None else x

    def start(self):
        q_lengths, q_wavs, *_ = self._query_batch
        self.query_scores = self.scoring(
            self._put(self.params), self._put(q_wavs), self._put(q_lengths)
        )
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            loader = self.loader_factory()
            for batch in loader:
                if self._stop.is_set():
                    return
                lengths, wavs, cases = batch
                scores = self.scoring(
                    self._put(self.params), self._put(wavs), self._put(lengths)
                )
                match = np.asarray(matching(self.query_scores, scores))
                keep = np.nonzero(match > 0)[0]
                if len(keep) == 0:
                    continue
                with self._lock:
                    for idx in keep:
                        self._buffers[int(cases[idx])].append(
                            {
                                "wavs": wavs[idx, :, : int(lengths[idx])].T.copy(),
                                "match_score": float(match[idx]),
                            }
                        )

    def collect(self) -> Dict[int, List[dict]]:
        """Atomically drain up to sample_num entries per case
        (the 'collect' message protocol, /root/reference/sampler.py:203-215)."""
        out: Dict[int, List[dict]] = {}
        with self._lock:
            for k in list(self._buffers.keys()):
                out[k] = self._buffers[k][: self.sample_num]
                self._buffers[k] = []
        return out

    @property
    def alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
