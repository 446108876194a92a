"""Decompose the flagship enhance pipeline's DSP floor on the real chip.

The round-3 time-major Pallas kernel cut the recurrence share of enhance
to ~1/3; the remaining ~2/3 is the "DSP floor" (feature bundle, head
projections, iSTFT decode, renorm). This script times each stage as its
own jitted program (on-device inputs, scalar-fetch sync, median of
iters) so optimization effort goes where the milliseconds are.

Stages:
  extract       make_context only (6-feature bundle incl. arctan2 phase)
  head          extract + flagship Residual head forward (incl. recurrence
                unless BENCH_HEAD=LinearResidual)
  full          entry() enhance = extract + head + decode_wav
  decode        decode_wav alone from precomputed (predicted, phase)
  decode_unit   prototype unit-phase decode: istft fed [re|im]/|z| scaled
                by sqrt(predicted) — no arctan2/cos/sin anywhere
  stft          raw forward STFT of both channels

Run: BENCH_BATCH=768 SE_PALLAS_LSTM=1 SE_PALLAS_HS_BF16=1 \
       python scripts/bench_dsp_stages.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SE_LSTM_XW_BF16", "1")

import numpy as np  # noqa: E402


def main():
    import jax

    if os.environ.get("BENCH_CPU", "0") == "1":  # tiny-shape sanity runs
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.utils.config import setup_compile_cache

    if os.environ.get("BENCH_CPU", "0") != "1":
        setup_compile_cache("/root/.jax_cache")

    import __graft_entry__ as graft
    from speech_enhancement_by_s3prl_tpu.ops.stft import (
        StftParams,
        _dft_kernels,
        _ola_envelope,
        _overlap_add,
        stft,
    )
    from speech_enhancement_by_s3prl_tpu.runner.trainer import make_context
    from speech_enhancement_by_s3prl_tpu.ops.audio import (
        length_masks,
        masked_normalize_decibel,
    )

    builder = graft._build()
    enhance, (params, _, _) = graft.entry()

    sr = 16000
    utt = int(os.environ.get("BENCH_UTT_SEC", "10"))
    T = sr * utt
    B = int(os.environ.get("BENCH_BATCH", "768"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    wavs = jax.jit(
        lambda k: jax.random.normal(k, (B, 3, T), jnp.float32) * 0.05
    )(jax.random.PRNGKey(0))
    lengths = jnp.full((B,), T, jnp.int32)
    pre = builder.preprocessor
    sp: StftParams = pre.config.stft
    n_frames = sp.n_frames(T)
    F = sp.n_freq

    # precomputed decode inputs, on device
    key = jax.random.PRNGKey(1)
    predicted = jax.jit(
        lambda k: jax.random.normal(k, (B, n_frames, F), jnp.float32) ** 2
    )(key)
    phase = jax.jit(
        lambda k: jax.random.uniform(k, (B, n_frames, F), jnp.float32,
                                     -np.pi, np.pi)
    )(key)
    complx_inp = jax.jit(lambda w: stft(w[:, 0], sp))(wavs)

    def timeit(name, fn, *args):
        out = fn(*args)  # compile + warmup
        float(jnp.asarray(out).ravel()[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.asarray(out).ravel()[0])
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        rtf = B * utt / (ms / 1e3)
        print(json.dumps({"stage": name, "ms": round(ms, 2),
                          "rtf": round(rtf, 1)}), flush=True)
        return ms

    @jax.jit
    def f_extract(w, l):
        ctx = make_context(pre, w, l, 0, 1)
        return ctx["feats_for_downstream"].sum() + ctx["phase_inp"].sum()

    @jax.jit
    def f_head(p, w, l):
        ctx = make_context(pre, w, l, 0, 1)
        predicted, _ = builder.model.apply(
            p, features=ctx["feats_for_downstream"], linears=ctx["linear_inp"]
        )
        return predicted.sum()

    f_full = jax.jit(enhance)

    @jax.jit
    def f_decode(pred, ph, l):
        return builder.decode_wav(pred, ph, l, T, -25.0)

    @jax.jit
    def f_decode_unit(pred, cx, l):
        # prototype: magnitude-rescaled complex reconstruction. Same math
        # as istft(pred, arctan2-phase) with mag = sqrt(pred):
        #   re_out = mag * re/|z|, im_out = mag * im/|z|
        re, im = cx[..., :F], cx[..., F:]
        mag_in = jnp.sqrt(re * re + im * im)
        scale = jnp.sqrt(pred) / jnp.maximum(mag_in, 1e-12)
        packed = jnp.concatenate([re * scale, im * scale], axis=-1)
        _, inv, window = _dft_kernels(sp.n_fft, sp.win_length)
        frames = (
            jnp.einsum("btf,fn->btn", packed, jnp.asarray(inv),
                       preferred_element_type=jnp.float32)
            * jnp.asarray(window)
        )
        wav = _overlap_add(frames, sp.hop_length)
        start = sp.n_fft // 2
        length = (n_frames - 1) * sp.hop_length
        wav = wav[:, start:start + length]
        env = _ola_envelope(sp.n_fft, sp.win_length, sp.hop_length,
                            n_frames)[start:start + length]
        wav = wav / jnp.where(env > 1e-11, env, 1.0)
        pad = T - wav.shape[-1]
        if pad > 0:
            wav = jnp.pad(wav, ((0, 0), (0, pad)))
        masks = length_masks(l, T)
        return masked_normalize_decibel(wav, -25.0, masks)

    from speech_enhancement_by_s3prl_tpu.ops.pallas.decode_kernel import (
        decode_ola_pallas,
    )

    @jax.jit
    def f_decode_pallas(pred, cx, l):
        raw = decode_ola_pallas(pred, cx, sp.n_fft, sp.win_length,
                                sp.hop_length)
        start = sp.n_fft // 2
        length = (n_frames - 1) * sp.hop_length
        wav = raw[:, start:start + length]
        env = _ola_envelope(sp.n_fft, sp.win_length, sp.hop_length,
                            n_frames)[start:start + length]
        wav = wav / jnp.where(env > 1e-11, env, 1.0)
        pad = T - wav.shape[-1]
        if pad > 0:
            wav = jnp.pad(wav, ((0, 0), (0, pad)))
        from speech_enhancement_by_s3prl_tpu.ops.audio import (
            length_masks as lm,
            masked_normalize_decibel as mnd,
        )
        return mnd(wav, -25.0, lm(l, T))

    from speech_enhancement_by_s3prl_tpu.ops.pallas.stft_kernel import (
        stft_pallas,
    )

    @jax.jit
    def f_stft_pallas(w):
        return stft_pallas(w[:, :2], sp.n_fft, sp.win_length,
                           sp.hop_length).sum()

    @jax.jit
    def f_stft(w):
        return stft(w[:, :2], sp).sum()

    # hop-blocked matmul STFT: the scatter-free OLA trick in reverse.
    # Frames start at hop multiples, so splitting the window-folded DFT
    # kernel into K = ceil(n_fft/hop) hop-sized row blocks turns the
    # strided conv into K dense (B*T', hop) @ (hop, 2F) matmuls over
    # plain shifted views — no gather, no conv lowering, pure MXU.
    K = -(-sp.n_fft // sp.hop_length)
    fwd_np, _, _ = _dft_kernels(sp.n_fft, sp.win_length)
    fwd_pad = np.zeros((K * sp.hop_length, 2 * F), np.float32)
    fwd_pad[: sp.n_fft] = fwd_np

    @jax.jit
    def f_stft_hopmm(w):
        x = w[:, :2].reshape(-1, T)
        x = jnp.pad(x, ((0, 0), (sp.n_fft // 2, sp.n_fft // 2)),
                    mode="reflect")
        need = (n_frames - 1 + K) * sp.hop_length
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
        hops = x.reshape(x.shape[0], -1, sp.hop_length)
        out = 0.0
        for j in range(K):
            blk = jnp.asarray(fwd_pad[j * sp.hop_length:(j + 1) * sp.hop_length])
            out = out + jnp.einsum(
                "bth,hf->btf", hops[:, j:j + n_frames], blk,
                preferred_element_type=jnp.float32)
        return out.sum()

    @jax.jit
    def f_stft_bf16(w):
        x = w[:, :2].reshape(-1, T)
        x = jnp.pad(x, ((0, 0), (sp.n_fft // 2, sp.n_fft // 2)),
                    mode="reflect")
        fwd2, _, _ = _dft_kernels(sp.n_fft, sp.win_length)
        out = jax.lax.conv_general_dilated(
            x[:, None, :].astype(jnp.bfloat16),
            jnp.asarray(fwd2.T[:, None, :], jnp.bfloat16),
            window_strides=(sp.hop_length,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )
        return out.sum()

    @jax.jit
    def f_istft_mm_bf16(pred, ph):
        mag = jnp.sqrt(pred)
        re = mag * jnp.cos(ph)
        im = mag * jnp.sin(ph)
        packed = jnp.concatenate([re, im], axis=-1).astype(jnp.bfloat16)
        _, inv, window = _dft_kernels(sp.n_fft, sp.win_length)
        frames = (
            jnp.einsum("btf,fn->btn", packed,
                       jnp.asarray(inv * window[None, :], jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        )
        return frames.sum()

    @jax.jit
    def f_istft_mm(pred, ph):
        mag = jnp.sqrt(pred)
        re = mag * jnp.cos(ph)
        im = mag * jnp.sin(ph)
        packed = jnp.concatenate([re, im], axis=-1)
        _, inv, window = _dft_kernels(sp.n_fft, sp.win_length)
        frames = (
            jnp.einsum("btf,fn->btn", packed, jnp.asarray(inv),
                       preferred_element_type=jnp.float32)
            * jnp.asarray(window)
        )
        return frames.sum()

    @jax.jit
    def f_ola(fr):
        return _overlap_add(fr, sp.hop_length).sum()

    def _ola2(frames, hop):
        # pad-stack-sum OLA: one fused output pass, no at[].add buffer
        # copies (the at[].add loop re-copies the wav buffer per block)
        b, nf, n_fft = frames.shape
        k = -(-n_fft // hop)
        pad = k * hop - n_fft
        if pad:
            frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
        slots = frames.reshape(b, nf, k, hop)
        out_slots = nf + k - 1
        total = sum(
            jnp.pad(slots[:, :, j], ((0, 0), (j, k - 1 - j), (0, 0)))
            for j in range(k)
        )
        return total.reshape(b, out_slots * hop)[
            :, : n_fft + (nf - 1) * hop]

    @jax.jit
    def f_ola2(fr):
        return _ola2(fr, sp.hop_length).sum()

    @jax.jit
    def f_decode2(pred, ph, l):
        # decode with pad-stack-sum OLA + window folded into the inverse
        # DFT kernel
        mag = jnp.sqrt(pred)
        re = mag * jnp.cos(ph)
        im = mag * jnp.sin(ph)
        packed = jnp.concatenate([re, im], axis=-1)
        _, inv, window = _dft_kernels(sp.n_fft, sp.win_length)
        inv_w = jnp.asarray(inv * window[None, :])
        frames = jnp.einsum("btf,fn->btn", packed, inv_w,
                            preferred_element_type=jnp.float32)
        wav = _ola2(frames, sp.hop_length)
        start = sp.n_fft // 2
        length = (n_frames - 1) * sp.hop_length
        wav = wav[:, start:start + length]
        env = _ola_envelope(sp.n_fft, sp.win_length, sp.hop_length,
                            n_frames)[start:start + length]
        wav = wav / jnp.where(env > 1e-11, env, 1.0)
        pad = T - wav.shape[-1]
        if pad > 0:
            wav = jnp.pad(wav, ((0, 0), (0, pad)))
        from speech_enhancement_by_s3prl_tpu.ops.audio import (
            length_masks as lm,
            masked_normalize_decibel as mnd,
        )
        return mnd(wav, -25.0, lm(l, T))

    frames_in = jax.jit(
        lambda k: jax.random.normal(k, (B, n_frames, sp.n_fft), jnp.float32)
    )(key)

    # stripped decode-kernel diagnostics: same block geometry/DMA as
    # decode_pallas but (a) matmuls only, (b) rescale only — isolates
    # whether the kernel's cost is data movement or body compute
    import functools as _ft

    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as _pltpu
    from speech_enhancement_by_s3prl_tpu.ops.pallas import decode_kernel as _dk

    def _strip_kernel(pred_ref, zre_ref, zim_ref, wre_ref, wim_ref, out_ref,
                      carry, *, mode, hop, k_blocks):
        pred = pred_ref[...]
        zre, zim = zre_ref[...], zim_ref[...]
        bb, tb, nf = pred.shape
        if mode == "matmul":
            re2 = zre.astype(jnp.bfloat16).reshape(bb * tb, nf)
            im2 = zim.astype(jnp.bfloat16).reshape(bb * tb, nf)
            acc = None
            for j in range(k_blocks):
                part = jax.lax.dot_general(
                    re2, wre_ref[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    im2, wim_ref[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            out_ref[...] = acc.reshape(bb, tb, hop)
        else:  # rescale only
            mag = jnp.sqrt(pred)
            zmag = jnp.sqrt(zre * zre + zim * zim)
            pos = zmag > 0.0
            inv_z = 1.0 / jnp.where(pos, zmag, 1.0)
            re = mag * jnp.where(pos, zre * inv_z, 1.0)
            im = mag * jnp.where(pos, zim * inv_z, 0.0)
            out_ref[...] = (re + im)[:, :, :hop]

    def _stripped(mode):
        Fq = F
        Kb = -(-sp.n_fft // sp.hop_length)
        wre_np, wim_np = _dk._inv_windowed_split(sp.n_fft, sp.win_length,
                                                 sp.hop_length)
        Tb = 128
        n_tb = -(-(n_frames + Kb - 1) // Tb)
        Tpad = n_tb * Tb

        @jax.jit
        def run(pred, cx):
            pr = jnp.pad(pred, ((0, 0), (0, Tpad - n_frames), (0, 0)))
            zr = jnp.pad(cx[..., :Fq], ((0, 0), (0, Tpad - n_frames), (0, 0)))
            zi = jnp.pad(cx[..., Fq:], ((0, 0), (0, Tpad - n_frames), (0, 0)))
            out = _pl.pallas_call(
                _ft.partial(_strip_kernel, mode=mode, hop=sp.hop_length,
                            k_blocks=Kb),
                grid=(B // 8, n_tb),
                in_specs=[
                    _pl.BlockSpec((8, Tb, Fq), lambda b, t: (b, t, 0),
                                  memory_space=_pltpu.VMEM),
                    _pl.BlockSpec((8, Tb, Fq), lambda b, t: (b, t, 0),
                                  memory_space=_pltpu.VMEM),
                    _pl.BlockSpec((8, Tb, Fq), lambda b, t: (b, t, 0),
                                  memory_space=_pltpu.VMEM),
                    _pl.BlockSpec((Kb, Fq, sp.hop_length),
                                  lambda b, t: (0, 0, 0),
                                  memory_space=_pltpu.VMEM),
                    _pl.BlockSpec((Kb, Fq, sp.hop_length),
                                  lambda b, t: (0, 0, 0),
                                  memory_space=_pltpu.VMEM),
                ],
                out_specs=_pl.BlockSpec((8, Tb, sp.hop_length),
                                        lambda b, t: (b, t, 0),
                                        memory_space=_pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, Tpad, sp.hop_length),
                                               jnp.float32),
                scratch_shapes=[
                    _pltpu.VMEM((8, Kb - 1, sp.hop_length), jnp.float32)],
                compiler_params=_pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
            )(pr, zr, zi,
              jnp.asarray(wre_np, jnp.bfloat16),
              jnp.asarray(wim_np, jnp.bfloat16))
            return out.sum()

        return run

    stages = {
        "stft": lambda: timeit("stft", f_stft, wavs),
        "stft_hopmm": lambda: timeit("stft_hopmm", f_stft_hopmm, wavs),
        "extract": lambda: timeit("extract", f_extract, wavs, lengths),
        "head": lambda: timeit("head", f_head, params, wavs, lengths),
        "decode": lambda: timeit("decode", f_decode, predicted, phase,
                                 lengths),
        "decode_unit": lambda: timeit("decode_unit", f_decode_unit,
                                      predicted, complx_inp, lengths),
        "istft_mm": lambda: timeit("istft_mm", f_istft_mm, predicted, phase),
        "stft_bf16": lambda: timeit("stft_bf16", f_stft_bf16, wavs),
        "stft_pallas": lambda: timeit("stft_pallas", f_stft_pallas, wavs),
        "istft_mm_bf16": lambda: timeit("istft_mm_bf16", f_istft_mm_bf16,
                                        predicted, phase),
        "ola": lambda: timeit("ola", f_ola, frames_in),
        "ola2": lambda: timeit("ola2", f_ola2, frames_in),
        "decode_pallas": lambda: timeit("decode_pallas", f_decode_pallas,
                                        predicted, complx_inp, lengths),
        "strip_matmul": lambda: timeit("strip_matmul", _stripped("matmul"),
                                       predicted, complx_inp),
        "strip_rescale": lambda: timeit("strip_rescale", _stripped("rescale"),
                                        predicted, complx_inp),
        "decode2": lambda: timeit("decode2", f_decode2, predicted, phase,
                                  lengths),
        "full": lambda: timeit("full", f_full, params, wavs, lengths),
    }
    want = os.environ.get("BENCH_STAGES", ",".join(stages)).split(",")
    for name in want:
        if name == "full":
            # free the precomputed decode inputs first — at B=768 the full
            # enhance program needs nearly all of HBM
            for buf in (predicted, phase, complx_inp, frames_in):
                buf.delete()
        stages[name]()


if __name__ == "__main__":
    main()
