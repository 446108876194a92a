"""TERA/Mockingjay-style transformer encoder, TPU-native.

The reference consumes a pretrained S3PRL ``TRANSFORMER`` upstream: a
BERT-style post-LN encoder over spectrogram frames — 6 layers x hidden 768
x 12 heads x FFN 3072, gelu (/root/reference/config/pretrain_sample.yaml:2-22;
contract in SURVEY.md section 2.9). This module rebuilds that architecture
in flax with:

- one fused QKV projection per layer (single MXU matmul instead of three);
- optional bfloat16 compute with float32 accumulation/LayerNorm;
- fixed sinusoidal position encodings added to the projected input;
- frame stacking for ``downsample_rate`` > 1;
- ``jax.checkpoint``-friendly layer structure (pure functions of params).

Parameter names mirror the torch checkpoint layout so the importer in
``torch_import.py`` can map S3PRL ``states-*.ckpt`` weights 1:1.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass
class TransformerConfig:
    """Architecture hyperparameters, with the reference's YAML vocabulary
    (/root/reference/config/pretrain_sample.yaml:2-22)."""

    input_dim: int = 160
    downsample_rate: int = 1
    hidden_size: int = 768
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    share_layer: bool = False
    max_input_length: int = 0

    @classmethod
    def from_dict(cls, cfg: Dict[str, Any]) -> "TransformerConfig":
        """Accepts either a full pretrain config (with a 'transformer'
        section) or the section itself; unknown keys ignored, string
        numerics coerced (the YAMLs quote layer_norm_eps)."""
        if "transformer" in cfg:
            cfg = cfg["transformer"]
        fields = {f.name for f in dataclasses.fields(cls)}
        clean = {}
        for k, v in cfg.items():
            if k not in fields:
                continue
            if isinstance(v, str):
                try:
                    v = float(v) if ("." in v or "e" in v.lower()) else int(v)
                except ValueError:
                    pass
            clean[k] = v
        return cls(**clean)


ACT2FN = {
    # exact (erf) gelu for parity with torch F.gelu used by the S3PRL stack
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "relu": nn.relu,
    "swish": nn.swish,
}


def sinusoidal_position_encoding(max_len: int, hidden: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, hidden, 2, dtype=np.float64) * -(math.log(10000.0) / hidden))
    table = np.zeros((max_len, hidden), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)[:, : hidden // 2]  # odd-dim safe
    return table


def normal_init(stddev):
    return nn.initializers.normal(stddev=stddev)


def hash_dropout(x, rate, key):
    """Dropout whose mask is a salted integer hash of the element index,
    computed INSIDE the consuming fusion — no random-bits tensor in HBM.

    flax ``nn.Dropout`` on the (B, N, T, T) attention probs materializes
    a same-shape u32 bits tensor, pays a layout-transposition copy of it,
    and a pred compare — measured 118 ms of a 571 ms Mockingjay train
    step on v5e (docs/PERF.md trace table). Here the uniform variate is
    an xxhash-style avalanche of the flat element index salted by two
    u32s drawn from ``key``: XLA fuses the iota + integer ops into the
    surrounding elementwise work, so the mask never exists in memory.
    Same Bernoulli(1-rate) process, a different (equally valid) stream —
    the same contract as `chunked_dropout_attention`'s per-chunk stream.
    Deterministic in ``key``.
    """
    if rate <= 0.0:
        return x
    salt = jax.random.bits(key, (2,), jnp.uint32)
    # salt rides as an f32 bitcast so the custom VJP can return an
    # ordinary zero cotangent for it
    return _hash_dropout_vjp(
        x, jax.lax.bitcast_convert_type(salt, jnp.float32), rate
    )


def _hash_mask_apply(x, salt_f, rate):
    keep = 1.0 - rate
    salt = jax.lax.bitcast_convert_type(salt_f, jnp.uint32)
    # flat index within x[0] (< 2^32 always) mixed with the leading-axis
    # index separately, so tensors past 2^32 total elements never wrap
    inner_n = 1
    for d in x.shape[1:]:
        inner_n *= int(d)
    inner = jnp.arange(inner_n, dtype=jnp.uint32).reshape((1,) + x.shape[1:])
    lead = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 0)
    h = inner * jnp.uint32(2654435761) ^ lead * jnp.uint32(40503) ^ salt[0]
    h ^= h >> 16
    h *= jnp.uint32(2246822519)
    h ^= h >> 13
    h ^= salt[1]
    h *= jnp.uint32(3266489917)
    h ^= h >> 16
    thresh = jnp.uint32(min(int(keep * 4294967296.0), 4294967295))
    return jnp.where(h < thresh, x / keep, jnp.zeros_like(x))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_dropout_vjp(x, salt_f, rate):
    return _hash_mask_apply(x, salt_f, rate)


def _hash_dropout_fwd(x, salt_f, rate):
    # residual = the 8-byte salt ONLY: the backward re-derives the mask
    # from it, so no (B, N, T, T) predicate tensor is ever stored (plain
    # autodiff through where() keeps one — 770 MB at the Mockingjay
    # bench shape, enough to tip B=64 over the HBM ceiling)
    return _hash_mask_apply(x, salt_f, rate), salt_f


def _hash_dropout_bwd(rate, salt_f, g):
    return _hash_mask_apply(g, salt_f, rate), jnp.zeros_like(salt_f)


_hash_dropout_vjp.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)


def hidden_dropout(mod: nn.Module, x, rate: float, deterministic: bool):
    """Hidden-state dropout with a swappable mask implementation.

    The encoder has 13 hidden dropout sites per step (input + 2 per layer
    x 6) on (B, T, H) activations. flax ``nn.Dropout`` draws a same-shape
    u32 bits tensor for each and keeps the keep-mask as an autodiff
    residual; ``SE_HIDDEN_DROPOUT_IMPL=hash`` swaps in the fused
    integer-hash mask (hash_dropout above) whose backward re-derives the
    mask from an 8-byte salt — no bits or predicate tensors in HBM. Same
    Bernoulli(1-rate) process, a different (equally valid) stream, so it
    is opt-in: default runs keep flax masks for reference-reproducible
    streams (the same contract as SE_DROPOUT_IMPL for attention probs).
    """
    if deterministic or rate <= 0.0:
        return x
    if os.environ.get("SE_HIDDEN_DROPOUT_IMPL", "flax") == "hash":
        return hash_dropout(x, rate, mod.make_rng("dropout"))
    return nn.Dropout(rate)(x, deterministic=False)


def chunked_dropout_attention(q, k, v, bias, scale, rate, rng, chunk, dt):
    """Attention WITH probability dropout, without the (B, N, T, T) HBM
    tensor: queries are processed in time chunks under ``jax.checkpoint``,
    so only one chunk's (B, N, chunk, T) logits/probs exist at a time and
    the backward recomputes them per chunk instead of storing them.

    This is what lets training with live attention dropout (the
    reference's default, /root/reference config attention_probs_dropout
    0.1) scale batch like the inference path does: the naive explicit
    path OOMs at B>=96 x T=1001 f32 because fwd+bwd hold the full probs
    tensor (docs/PERF.md, Mockingjay table).

    q, k, v: (B, T, N, D); bias: None or query-broadcast (q-dim 1).
    The dropout mask stream differs from flax ``nn.Dropout``'s single
    full-shape draw (one fold_in per chunk) — a different but equally
    valid sample of the same Bernoulli process.
    """
    B, T, N, D = q.shape
    pad = (-T) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (T + pad) // chunk
    qc = jnp.moveaxis(q.reshape(B, nc, chunk, N, D), 1, 0)
    keep = 1.0 - rate

    # SE_ATTN_LOGITS=dt stores each chunk's logits tensor in the compute
    # dtype instead of f32 — at (B, N, chunk, T) it is the single biggest
    # HBM stream of the dropout-live step (the device trace measured the
    # 6 forward chunk loops at 211 ms of a 472 ms step), and bf16 halves
    # it. Softmax still reduces in f32 inside the consuming fusion (the
    # flash-kernel convention); only the stored tensor is rounded.
    logits_dt = (
        dt if os.environ.get("SE_ATTN_LOGITS", "f32") == "dt"
        else jnp.float32
    )

    def one(args):
        i, qi = args
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qi, k, preferred_element_type=logits_dt
        ) * scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if os.environ.get("SE_DROPOUT_IMPL", "hash") != "flax":
            # fused hash mask (salted per chunk): no bits tensor at all
            probs = hash_dropout(
                probs.astype(dt), rate, jax.random.fold_in(rng, i)
            )
        else:
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, i), keep, probs.shape
            )
            probs = jnp.where(mask, probs / keep, 0.0).astype(dt)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        )

    out = jax.lax.map(jax.checkpoint(one), (jnp.arange(nc), qc))
    return jnp.moveaxis(out, 0, 1).reshape(B, T + pad, N, D)[:, :T]


class SelfAttention(nn.Module):
    config: TransformerConfig
    compute_dtype: Any = jnp.float32
    # sequence parallelism: when set, __call__ runs inside a shard_map
    # whose time axis is sharded over this mesh axis — Q stays local to
    # the chunk, K/V are all-gathered over the axis so every position
    # still attends to the full sequence (parallel/sequence.py)
    seq_axis: Any = None

    @nn.compact
    def __call__(self, hidden, attn_mask=None, deterministic=True):
        c = self.config
        head_dim = c.hidden_size // c.num_attention_heads
        dt = self.compute_dtype

        # fused QKV — one MXU matmul
        qkv = nn.Dense(
            3 * c.hidden_size,
            kernel_init=normal_init(c.initializer_range),
            name="qkv",
            dtype=dt,
        )(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.seq_axis is not None:
            # one all-gather per layer rides ICI; K/V are O(T*H) which at
            # this model's <=1001 frames is tiny next to the FFN matmuls
            k = jax.lax.all_gather(k, self.seq_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.seq_axis, axis=1, tiled=True)

        def heads(x):
            b, t, _ = x.shape
            return x.reshape(b, t, c.num_attention_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / math.sqrt(head_dim)
        # fused attention (jax.nn.dot_product_attention): same math, but
        # XLA lowers it without materializing the (B, N, T, T) probability
        # tensor round-trip the naive path pays — the attention dropout
        # path needs explicit probs, so training with attention dropout
        # falls back. SE_ATTN_IMPL=naive forces the explicit path.
        drops_attn = (
            not deterministic and c.attention_probs_dropout_prob > 0.0
        )
        naive = os.environ.get("SE_ATTN_IMPL", "fused") == "naive"
        # query-chunked dropout path: only usable when the bias (if any)
        # broadcasts over the query axis — true at every call site (the
        # encoder passes None). With the (default) hash masks this is the
        # measured dropout-live champion (1,309x vs 1,013x for the
        # full-probs path at the bf16 B=64 Mockingjay workload, chunk
        # 256 — docs/PERF.md) and it deletes every (B, N, T, T) tensor;
        # it stays opt-in at the CLI so default runs keep the flax mask
        # stream, and the bench/production configs turn it on.
        drop_chunk = int(os.environ.get("SE_ATTN_DROPOUT_CHUNK", "0"))
        chunkable = attn_mask is None or attn_mask.shape[-2] == 1
        # SE_ATTN_IMPL=flash: the in-house Pallas flash kernel
        # (ops/pallas/attention_kernel.py) — the whole logits/probs
        # pipeline stays in VMEM, with the salted-hash dropout mask
        # computed in-kernel and re-derived in its backward. The round-4
        # device trace showed the chunked path's HBM-materialized logits
        # costing 63% of the dropout-live Mockingjay step; this deletes
        # that stream entirely. Usable whenever the bias broadcasts over
        # queries (true at every call site); mask stream differs from
        # flax/chunked (same Bernoulli contract as hash_dropout).
        # (The round-3 rejection note covered the STOCK jax flash kernel
        # — no dropout, block_q>T failures; this kernel pads and masks
        # internally and exists because dropout-live attention IS the
        # measured bottleneck.)
        use_flash = (
            os.environ.get("SE_ATTN_IMPL") == "flash"
            and chunkable
            and self.seq_axis is None
        )
        # under a mesh step trace (parallel/mesh.py installs the shard
        # context) the kernel must run per device through shard_map —
        # GSPMD would replicate the opaque custom call. Only a pure
        # batch sharding over one axis qualifies (tensor parallelism
        # shards the head dim; the fused path handles that).
        flash_mesh = None
        if use_flash:
            from ..ops.pallas.lstm_kernel import current_shard_context

            sc = current_shard_context()
            if sc is not None:
                mesh, axes = sc
                if (
                    len(axes) == 1
                    and mesh.shape.get("model", 1) == 1
                    and q.shape[0] % mesh.shape[axes[0]] == 0
                ):
                    flash_mesh = (mesh, axes[0])
                else:
                    use_flash = False  # fused/chunked handle this mesh
        if use_flash:
            from ..ops.pallas.attention_kernel import (
                flash_attention,
                flash_attention_sharded,
            )

            kbias = (
                None if attn_mask is None
                else attn_mask.reshape(attn_mask.shape[0], -1)
                .astype(jnp.float32)
            )
            kw = dict(
                rate=(c.attention_probs_dropout_prob if drops_attn else 0.0),
                rng=self.make_rng("dropout") if drops_attn else None,
                kbias=kbias,
                block_q=int(os.environ.get("SE_ATTN_FLASH_BLOCK", "256")),
                interpret=jax.default_backend() == "cpu",
            )
            if flash_mesh is not None:
                ctx = flash_attention_sharded(
                    flash_mesh[0], flash_mesh[1], q, k, v, scale, **kw
                )
            else:
                ctx = flash_attention(q, k, v, scale, **kw)
        elif not drops_attn and not naive:
            ctx = jax.nn.dot_product_attention(
                q, k, v, bias=attn_mask, scale=scale
            )
        elif drops_attn and not naive and drop_chunk > 0 and chunkable:
            ctx = chunked_dropout_attention(
                q, k, v, attn_mask, scale,
                c.attention_probs_dropout_prob,
                self.make_rng("dropout"), drop_chunk, dt,
            )
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if attn_mask is not None:
                logits = logits + attn_mask
            probs = jax.nn.softmax(logits, axis=-1).astype(dt)
            if drops_attn and os.environ.get("SE_DROPOUT_IMPL") == "hash":
                # fused hash mask: no (B, N, T, T) bits tensor in HBM.
                # Opt-in on THIS (full-probs) path: the mask cost it
                # removes is real (~118 ms/step at the bf16 B=64
                # Mockingjay shape), but removing those tensors also
                # reshuffles XLA's remat of the f32 softmax temporaries
                # and tipped that very shape over the HBM ceiling —
                # the chunked path is where hash dropout pays off.
                probs = hash_dropout(
                    probs, c.attention_probs_dropout_prob,
                    self.make_rng("dropout"),
                )
            else:
                probs = nn.Dropout(c.attention_probs_dropout_prob)(
                    probs, deterministic=deterministic
                )
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
            )
        b, t = ctx.shape[:2]
        ctx = ctx.reshape(b, t, c.hidden_size)
        out = nn.Dense(
            c.hidden_size,
            kernel_init=normal_init(c.initializer_range),
            name="output",
            dtype=dt,
        )(ctx)
        out = hidden_dropout(self, out, c.hidden_dropout_prob, deterministic)
        return out


class TransformerLayer(nn.Module):
    config: TransformerConfig
    compute_dtype: Any = jnp.float32
    seq_axis: Any = None

    @nn.compact
    def __call__(self, hidden, attn_mask=None, deterministic=True):
        c = self.config
        dt = self.compute_dtype
        attn_out = SelfAttention(c, dt, self.seq_axis, name="attention")(
            hidden, attn_mask, deterministic
        )
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln")(
            (hidden + attn_out).astype(jnp.float32)
        )
        inter = nn.Dense(
            c.intermediate_size,
            kernel_init=normal_init(c.initializer_range),
            name="intermediate",
            dtype=dt,
        )(hidden)
        inter = ACT2FN[c.hidden_act](inter)
        out = nn.Dense(
            c.hidden_size,
            kernel_init=normal_init(c.initializer_range),
            name="output",
            dtype=dt,
        )(inter)
        out = hidden_dropout(self, out, c.hidden_dropout_prob, deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(
            (hidden + out).astype(jnp.float32)
        )
        return hidden


class TransformerEncoder(nn.Module):
    """Input projection + position encoding + N post-LN layers.

    __call__(spec (B, T, input_dim)) -> (B, T//dr, hidden) hidden states,
    or all layers when ``output_all_layers`` (for weighted-sum/select_layer
    upstream options, SURVEY.md section 2.9 item 2).
    """

    config: TransformerConfig
    compute_dtype: Any = jnp.float32
    max_positions: int = 5001
    remat: bool = False  # rematerialize layers (memory <-> FLOPs trade)
    # sequence parallelism (parallel/sequence.py): the module then runs
    # inside shard_map on a time CHUNK — positions are offset by the
    # device's axis index and attention gathers K/V over the axis
    seq_axis: Any = None

    @nn.compact
    def __call__(self, spec, deterministic=True, output_all_layers=False):
        c = self.config
        dr = max(1, c.downsample_rate)
        b, t, d = spec.shape
        if dr > 1:
            t2 = t // dr
            spec = spec[:, : t2 * dr].reshape(b, t2, d * dr)
        assert spec.shape[-1] == c.input_dim * dr or True

        hidden = nn.Dense(
            c.hidden_size,
            kernel_init=normal_init(c.initializer_range),
            name="spec_transform",
        )(spec)
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.max_positions, c.hidden_size)
        )
        t_local = hidden.shape[1]
        if self.seq_axis is not None:
            offset = jax.lax.axis_index(self.seq_axis) * t_local
            hidden = hidden + jax.lax.dynamic_slice_in_dim(
                pe, offset, t_local, axis=0
            )[None]
        else:
            hidden = hidden + pe[None, :t_local]
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="input_ln")(hidden)
        hidden = hidden_dropout(self, hidden, c.hidden_dropout_prob, deterministic)

        layer_cls = (
            nn.remat(TransformerLayer, static_argnums=(3,))
            if self.remat
            else TransformerLayer
        )
        all_layers = []
        if c.share_layer:
            layer = layer_cls(
                c, self.compute_dtype, self.seq_axis, name="layer_shared"
            )
            for _ in range(c.num_hidden_layers):
                hidden = layer(hidden, None, deterministic)
                all_layers.append(hidden)
        else:
            for i in range(c.num_hidden_layers):
                hidden = layer_cls(
                    c, self.compute_dtype, self.seq_axis, name=f"layer_{i}"
                )(hidden, None, deterministic)
                all_layers.append(hidden)

        if output_all_layers:
            return jnp.stack(all_layers, axis=0)
        return hidden


class TransformerSpecPredictionHead(nn.Module):
    """hidden -> spectrogram projection: dense + act + LayerNorm + output
    (SURVEY.md section 2.9 item 3; consumed at /root/reference/model.py:120
    as ``predicted, _ = spechead(features)``)."""

    config: TransformerConfig
    output_size: int = 201

    @nn.compact
    def __call__(self, hidden):
        c = self.config
        x = nn.Dense(
            c.hidden_size,
            kernel_init=normal_init(c.initializer_range),
            name="dense",
        )(hidden)
        x = ACT2FN[c.hidden_act](x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln")(x)
        predicted = nn.Dense(
            self.output_size,
            kernel_init=normal_init(c.initializer_range),
            name="output",
        )(x)
        return predicted, x
