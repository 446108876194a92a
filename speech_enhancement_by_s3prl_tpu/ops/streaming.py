"""Chunked enhancement for unbounded-length audio.

Static XLA shapes bound a single enhance call to the largest compiled
bucket. Two long-form strategies live here:

- ``enhance_streaming``: fixed windows with overlapped cosine crossfades
  — works with ANY model (bidirectional included), recomputes the
  overlap, and the crossfaded seams differ from a full-utterance pass.
- ``StatefulStreamer``: TRUE constant-latency streaming for
  unidirectional mask heads — the LSTM's (h, c) carries across chunks
  (models/lstm.py state threading), STFT framing/delta context and the
  iSTFT overlap-add tails carry on the host, so the streamed output is
  SAMPLE-EXACT against the offline full-utterance forward (pinned by
  tests/test_streaming_stateful.py) with a fixed latency of
  ``(2*delta_order + 1) frames + one chunk`` regardless of input length.

(The reference simply trims everything to 10 s —
/root/reference/dataset.py:117-123 — and has no long-form path.)
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def enhance_streaming(
    enhance_fn: Callable[[np.ndarray], np.ndarray],
    wav: np.ndarray,
    sample_rate: int = 16000,
    window_sec: float = 10.0,
    overlap_sec: float = 1.0,
) -> np.ndarray:
    """Apply a fixed-window enhancer to a long 1-D signal.

    enhance_fn: maps a window (exactly window samples, zero-padded at the
    tail) to its enhanced version of the same length.
    """
    window = int(window_sec * sample_rate)
    overlap = int(overlap_sec * sample_rate)
    assert 0 <= overlap < window
    hop = window - overlap
    n = len(wav)
    if n <= window:
        padded = np.zeros(window, np.float32)
        padded[:n] = wav
        return np.asarray(enhance_fn(padded))[:n]

    fade_in = 0.5 - 0.5 * np.cos(np.pi * np.arange(overlap) / overlap)
    out = np.zeros(n, np.float32)
    norm = np.zeros(n, np.float32)

    start = 0
    while start < n:
        chunk = np.zeros(window, np.float32)
        valid = min(window, n - start)
        chunk[:valid] = wav[start : start + valid]
        enhanced = np.asarray(enhance_fn(chunk))[:valid]

        weight = np.ones(valid, np.float32)
        if start > 0:
            m = min(overlap, valid)
            weight[:m] = fade_in[:m]
        if start + valid < n:
            m = min(overlap, valid)
            weight[valid - m :] = fade_in[::-1][:m][-m:]
        out[start : start + valid] += enhanced * weight
        norm[start : start + valid] += weight
        if start + window >= n:
            break
        start += hop

    return out / np.maximum(norm, 1e-8)


class StatefulStreamer:
    """Constant-latency streaming enhancement for unidirectional heads.

    Reproduces the offline pipeline sample-exactly, chunk by chunk:

    - the host maintains the torch.stft-convention reflect-padded sample
      stream and frames it without any per-chunk edge padding;
    - a jitted ANALYSIS step turns each F-frame chunk into log-mel rows
      + the power spectrum + the packed [re|im] phase;
    - the host keeps a rolling log-mel strip with ``2*delta`` rows of
      left context (replicating row 0 at the very start and the final
      row at flush — exactly the replicate padding the offline
      ``compute_deltas`` applies at utterance edges);
    - a jitted MODEL step computes the delta stack on the strip, runs
      the mask head continuing from the carried per-layer LSTM (h, c)
      (models/lstm.py ``initial_state``), rescales the packed phase to
      the masked magnitude, and returns windowed time-domain synthesis
      frames;
    - the host overlap-adds frames and the window-square envelope,
      emitting samples once no future frame can touch them.

    Latency is fixed at ``(2*delta) frames + one chunk`` regardless of
    stream length; memory is constant. Output level: the offline path's
    per-utterance dB renorm needs the whole utterance — streaming
    returns unrenormalized samples (callers wanting the offline contract
    renorm the concatenated result; the parity test does exactly that).

    Requires: unidirectional head with an LSTMStack (``LSTM`` /
    ``Residual``), ``cmvn=False`` downstream features (CMVN is a
    whole-utterance statistic), ``from_rawfeature`` mode.
    """

    def __init__(
        self,
        params,
        model,
        preprocessor,
        feat_cfg: Optional[dict] = None,
        frames_per_chunk: int = 48,
        linear_power: float = 2.0,
    ):
        import jax
        import jax.numpy as jnp

        from ..ops.features import compute_deltas, power_to_mel
        from ..ops.stft import _dft_kernels

        assert not model.bidirectional, (
            "stateful streaming needs a unidirectional head (the backward "
            "direction would need future audio); use enhance_streaming's "
            "crossfade windows for bidirectional models"
        )
        cfg = preprocessor.config
        st = cfg.stft
        self.n_fft, self.hop = st.n_fft, st.hop_length
        self.n_freq = st.n_freq
        self.F = int(frames_per_chunk)
        if feat_cfg is None:
            # the downstream feature slot of the six-feature bundle
            feat_cfg = preprocessor.feat_list[1]
        assert feat_cfg["feat_type"] == "mel", feat_cfg
        assert not feat_cfg.get("cmvn", False), (
            "CMVN is a whole-utterance statistic — streaming needs "
            "cmvn=False downstream features"
        )
        self.delta = int(feat_cfg.get("delta", 0))
        self.log = bool(feat_cfg.get("log", False))
        self.ctx = 2 * self.delta  # exact-delta context rows per side

        fwd, inv, window = _dft_kernels(self.n_fft, st.win_length)
        self._w2 = (window.astype(np.float64) ** 2).astype(np.float32)
        n_mels, sr, eps = cfg.n_mels, cfg.sample_rate, cfg.eps
        F, n_fft, hop, n_freq = self.F, self.n_fft, self.hop, self.n_freq
        seg_len = (F - 1) * hop + n_fft
        self.seg_len = seg_len
        delta, log = self.delta, self.log

        def analysis(seg):
            idx = (
                jnp.arange(F)[:, None] * hop + jnp.arange(n_fft)[None, :]
            )
            frames = seg[idx]                     # (F, n_fft)
            packed = frames @ jnp.asarray(fwd)    # (F, 2*n_freq)
            re, im = packed[:, :n_freq], packed[:, n_freq:]
            power = re * re + im * im
            mel = power_to_mel(power[None, None], n_mels, sr)[0, 0]
            feat = jnp.log(mel + eps) if log else mel
            return feat, power, packed

        def model_step(params, strip, power, packed, state):
            # delta stack on the strip, exact rows sliced out
            parts = [strip]
            for _ in range(delta):
                parts.append(compute_deltas(parts[-1][None])[0])
            feats = jnp.concatenate(parts, axis=-1)
            lo = 2 * delta
            feats = feats[lo : lo + F][None]      # (1, F, D)
            predicted, aux = model.apply(
                params, features=feats, linears=power[None],
                lstm_state=state,
            )
            predicted = predicted[0]
            mag = (
                predicted ** (1.0 / linear_power)
                if linear_power != 1.0 else predicted
            )
            re, im = packed[:, :n_freq], packed[:, n_freq:]
            zmag = jnp.sqrt(re * re + im * im)
            nz = zmag > 0.0
            invz = 1.0 / jnp.where(nz, zmag, 1.0)
            sre = mag * jnp.where(nz, re * invz, 1.0)
            sim = mag * jnp.where(nz, im * invz, 0.0)
            synth = (
                jnp.concatenate([sre, sim], axis=-1) @ jnp.asarray(inv)
            ) * jnp.asarray(window)               # (F, n_fft)
            return synth, aux["lstm_state"]

        self._analysis = jax.jit(analysis)
        self._model_step = jax.jit(model_step)
        self._params = params
        H = model.hidden_size
        self._zero_state = tuple(
            (jnp.zeros((1, H), jnp.float32), jnp.zeros((1, H), jnp.float32))
            for _ in range(model.num_layers)
        )
        self._n_mels = n_mels
        self.reset()

    def reset(self) -> None:
        """Rewind to the start-of-stream state (LSTM zeros, empty FIFOs);
        the compiled analysis/model steps are untouched."""
        self._state = self._zero_state
        # host stream state
        self._pending = np.zeros(0, np.float32)  # raw samples, pre-padding
        self._padded: Optional[np.ndarray] = None  # reflect-prefixed stream
        self._pad_consumed = 0   # padded samples dropped from _padded[0]
        self._n_raw = 0          # total raw samples pushed
        self._analyzed = 0       # frames analyzed so far
        self._consumed = 0       # frames consumed by the model so far
        self._feat_fifo = np.zeros((0, self._n_mels), np.float32)
        self._pw_fifo = np.zeros((0, self.n_freq), np.float32)
        self._pk_fifo = np.zeros((0, 2 * self.n_freq), np.float32)
        self._left_ctx: Optional[np.ndarray] = None  # ctx consumed rows
        # OLA accumulators aligned at padded coordinate _ola_base
        self._ola = np.zeros(0, np.float32)
        self._env = np.zeros(0, np.float32)
        self._ola_base = 0
        self._emitted = 0        # padded samples emitted so far

    def clone(self) -> "StatefulStreamer":
        """A fresh stream sharing this instance's params and COMPILED
        analysis/model steps — what a server wants per connection: the
        prototype pays the jit once, clones start instantly."""
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new.reset()
        return new

    # -- internals -------------------------------------------------------

    def _ensure_padded(self) -> bool:
        half = self.n_fft // 2
        if self._padded is None:
            if len(self._pending) <= half:
                return False
            prefix = self._pending[1 : half + 1][::-1]
            self._padded = np.concatenate([prefix, self._pending])
            self._pending = np.zeros(0, np.float32)
        return True

    def _analyze(self, n_frames: int):
        """Analysis of frames [_analyzed, _analyzed + n_frames): log-mel
        rows + power + packed phase appended to the FIFOs."""
        import jax.numpy as jnp

        hop, n_fft = self.hop, self.n_fft
        s = self._analyzed
        start = s * hop - self._pad_consumed
        need = (n_frames - 1) * hop + n_fft
        seg = np.asarray(self._padded[start : start + need], np.float32)
        if len(seg) < self.seg_len:
            seg = np.pad(seg, (0, self.seg_len - len(seg)))
        feat, power, packed = self._analysis(jnp.asarray(seg))
        self._feat_fifo = np.concatenate(
            [self._feat_fifo, np.asarray(feat)[:n_frames]]
        )
        self._pw_fifo = np.concatenate(
            [self._pw_fifo, np.asarray(power)[:n_frames]]
        )
        self._pk_fifo = np.concatenate(
            [self._pk_fifo, np.asarray(packed)[:n_frames]]
        )
        self._analyzed += n_frames
        # drop padded samples no future frame needs
        keep_from = self._analyzed * hop - self._pad_consumed
        if keep_from > 0:
            self._padded = self._padded[keep_from:]
            self._pad_consumed += keep_from

    def _consume(self, n_frames: int, at_end: bool):
        """Model step over the oldest n_frames FIFO rows (exact deltas:
        ctx left rows kept from consumed history, ctx right rows must be
        present in the FIFO unless the stream has ended — then the TRUE
        final row replicates, the offline end-padding convention)."""
        import jax.numpy as jnp

        F, ctx, hop, n_fft = self.F, self.ctx, self.hop, self.n_fft
        if self._left_ctx is None:
            # offline compute_deltas replicate-pads the utterance start
            self._left_ctx = np.repeat(self._feat_fifo[:1], ctx, axis=0)
        strip = np.concatenate(
            [self._left_ctx, self._feat_fifo[: n_frames + ctx]], axis=0
        )
        want = ctx + n_frames + ctx
        if strip.shape[0] < want:
            assert at_end, "right context missing before end of stream"
            strip = np.concatenate([
                strip,
                np.repeat(strip[-1:], want - strip.shape[0], axis=0),
            ])
        S_static = F + 2 * ctx
        if strip.shape[0] < S_static:  # final partial chunk
            strip = np.concatenate([
                strip,
                np.repeat(strip[-1:], S_static - strip.shape[0], axis=0),
            ])
        pw = self._pw_fifo[:n_frames]
        pk = self._pk_fifo[:n_frames]
        if n_frames < F:
            pw = np.pad(pw, ((0, F - n_frames), (0, 0)))
            pk = np.pad(pk, ((0, F - n_frames), (0, 0)))
        synth, new_state = self._model_step(
            self._params, jnp.asarray(strip), jnp.asarray(pw),
            jnp.asarray(pk), self._state,
        )
        self._state = new_state  # junk past the end only at flush
        synth = np.asarray(synth)[:n_frames]

        s = self._consumed
        first = s * hop
        last_end = (s + n_frames - 1) * hop + n_fft
        if len(self._ola) == 0:
            self._ola_base = first
        need_len = last_end - self._ola_base
        if need_len > len(self._ola):
            grow = need_len - len(self._ola)
            self._ola = np.concatenate(
                [self._ola, np.zeros(grow, np.float32)]
            )
            self._env = np.concatenate(
                [self._env, np.zeros(grow, np.float32)]
            )
        for j in range(n_frames):
            o = (s + j) * hop - self._ola_base
            self._ola[o : o + n_fft] += synth[j]
            self._env[o : o + n_fft] += self._w2
        self._consumed += n_frames
        keep = self._feat_fifo[n_frames:]
        self._left_ctx = np.concatenate([self._left_ctx, self._feat_fifo[:n_frames]])[-ctx:] if ctx else self._left_ctx[:0]
        self._feat_fifo = keep
        self._pw_fifo = self._pw_fifo[n_frames:]
        self._pk_fifo = self._pk_fifo[n_frames:]

    def _emit(self, upto_padded: int) -> np.ndarray:
        half = self.n_fft // 2
        lo = max(self._emitted, half)
        hi = upto_padded
        if hi <= lo:
            return np.zeros(0, np.float32)
        a = lo - self._ola_base
        b = hi - self._ola_base
        env = self._env[a:b]
        out = self._ola[a:b] / np.where(env > 1e-11, env, 1.0)
        self._emitted = hi
        self._ola = self._ola[b:]
        self._env = self._env[b:]
        self._ola_base = hi
        return out.astype(np.float32)

    def _frames_framable(self) -> int:
        avail = self._pad_consumed + len(self._padded)
        return max(0, (avail - self.n_fft) // self.hop + 1 - self._analyzed)

    # -- public API ------------------------------------------------------

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed samples; returns whatever enhanced audio became final."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._n_raw += len(samples)
        if self._padded is None:
            self._pending = np.concatenate([self._pending, samples])
            if not self._ensure_padded():
                return np.zeros(0, np.float32)
        else:
            self._padded = np.concatenate([self._padded, samples])
        out = []
        while self._frames_framable() >= self.F:
            self._analyze(self.F)
        while len(self._feat_fifo) >= self.F + self.ctx:
            self._consume(self.F, at_end=False)
            out.append(self._emit(self._consumed * self.hop))
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        """End of stream: reflect-pad the tail (offline convention),
        analyze + consume the remaining frames, return the final
        samples. Total emitted length across push()+flush() equals the
        offline ``(n // hop) * hop`` output."""
        half = self.n_fft // 2
        n = self._n_raw
        n_frames_total = n // self.hop + 1
        if self._padded is None:
            self._padded = np.pad(self._pending, (half, 0), mode="reflect")
            self._pending = np.zeros(0, np.float32)
        raw_end = half + n  # padded index just past the real samples
        lastf_end = (n_frames_total - 1) * self.hop + self.n_fft
        need_suffix = max(0, lastf_end - raw_end)
        if need_suffix:
            raw_start_in_buf = max(0, half - self._pad_consumed)
            raw_in_buf = self._padded[raw_start_in_buf:]
            refl = raw_in_buf[-2 : -2 - need_suffix : -1]
            if len(refl) < need_suffix:  # extremely short signals
                reps = np.pad(
                    raw_in_buf, (0, need_suffix), mode="wrap"
                )[len(raw_in_buf):]
                refl = np.concatenate([refl, reps[len(refl):]])
            self._padded = np.concatenate([self._padded, refl])
        out = []
        while self._analyzed < n_frames_total:
            self._analyze(min(self.F, n_frames_total - self._analyzed))
        while self._consumed < n_frames_total:
            take = min(self.F, n_frames_total - self._consumed)
            self._consume(take, at_end=True)
            out.append(self._emit(self._consumed * self.hop))
        # the offline istft covers (n_frames-1)*hop samples from the
        # padded offset half — emit the trailing covered span
        out.append(self._emit(half + (n_frames_total - 1) * self.hop))
        return np.concatenate(out) if out else np.zeros(0, np.float32)
