"""utils/costs.py: jaxpr cost walker — the numbers bench.py's MFU
columns are built on, so every property is pinned against hand counts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.utils.costs import program_cost


def test_plain_matmul_flops_exact():
    x = jnp.zeros((8, 16))
    w = jnp.zeros((16, 32))
    c = program_cost(lambda x, w: x @ w, x, w)
    assert c["dot_flops"] == 2 * 8 * 16 * 32
    assert c["flops"] == c["dot_flops"]  # no elementwise ops
    assert c["unbounded_loops"] == 0 and c["opaque_calls"] == 0


def test_batched_dot_general_flops():
    x = jnp.zeros((4, 8, 16))
    w = jnp.zeros((4, 16, 32))
    c = program_cost(lambda x, w: jnp.einsum("bmk,bkn->bmn", x, w), x, w)
    assert c["dot_flops"] == 2 * 4 * 8 * 16 * 32


def test_scan_multiplies_by_trip_count():
    # the property XLA's HLO cost analysis gets wrong (counts the body once)
    w = jnp.zeros((16, 16))
    xs = jnp.zeros((100, 8, 16))

    def f(w, xs):
        def step(c, xt):
            return jnp.tanh(c @ w + xt), None
        c, _ = jax.lax.scan(step, jnp.zeros((8, 16)), xs)
        return c

    c = program_cost(f, w, xs)
    assert c["dot_flops"] == 100 * 2 * 8 * 16 * 16
    # tanh + add elementwise: 2 * 100 * 8 * 16 on top
    assert c["flops"] == c["dot_flops"] + 100 * 2 * 8 * 16


def test_grad_counts_backward_flops():
    x = jnp.zeros((8, 16))
    w = jnp.zeros((16, 32))

    def loss(w, x):
        return jnp.sum(x @ w)

    base = program_cost(lambda w, x: jnp.sum(x @ w), w, x)["dot_flops"]
    # grad runs the primal forward plus one same-size matmul for dL/dw
    # (x is not differentiated, so no third matmul)
    g = program_cost(jax.grad(loss), w, x)
    assert g["dot_flops"] == 2 * base
    vg = program_cost(jax.value_and_grad(loss), w, x)
    assert vg["dot_flops"] == 2 * base  # the value rides the same forward


def test_loop_invariant_weight_bytes_counted_once():
    w = jnp.zeros((16, 16))  # 1 KiB f32
    xs = jnp.zeros((1000, 8, 16))

    def f(w, xs):
        def step(c, xt):
            return c @ w + xt, None
        c, _ = jax.lax.scan(step, jnp.zeros((8, 16)), xs)
        return c

    c = program_cost(f, w, xs)
    row = 8 * 16 * 4           # one (8,16) f32 block
    w_bytes = 16 * 16 * 4
    # program I/O: xs + w + final carry, once each
    io = 1000 * row + w_bytes + row
    # dot traffic per step: carry operand + output; w is a LOOP CONSTANT,
    # counted ONCE, not 1000x — the property under test
    dot = 1000 * row + w_bytes + 1000 * row
    assert c["hbm_bytes_model"] == io + dot


def test_cond_takes_max_branch():
    x = jnp.zeros((8, 8))

    def f(x):
        return jax.lax.cond(
            x.sum() > 0,
            lambda x: x @ x,          # 2*8^3 = 1024 flops
            lambda x: x + 1.0,        # 64 flops
            x,
        )

    c = program_cost(f, x)
    assert c["dot_flops"] == 2 * 8 * 8 * 8


def test_while_flags_unbounded():
    def f(x):
        return jax.lax.while_loop(lambda v: v.sum() < 10, lambda v: v + 1, x)

    c = program_cost(f, jnp.zeros((4,)))
    assert c["unbounded_loops"] == 1


def test_remat_counts_recompute():
    w = jnp.zeros((16, 16))
    x = jnp.zeros((8, 16))

    def body(w, x):
        return jnp.tanh(x @ w)

    def loss(w, x):
        return jnp.sum(jax.checkpoint(body)(w, x))

    plain = program_cost(jax.grad(lambda w, x: jnp.sum(body(w, x))), w, x)
    rem = program_cost(jax.grad(loss), w, x)
    # remat re-runs the forward inside the backward: strictly more flops
    assert rem["flops"] > plain["flops"]


def test_flagship_enhance_flops_match_hand_count():
    """The actual bench subject: flops of the flagship forward are within
    10% of the closed-form LSTM+head count (the delta is STFT/mel/feature
    matmuls the hand count skips)."""
    import __graft_entry__ as graft

    builder = graft._build(use_pallas=False)
    import jax.random as jr

    B, T = 2, 16000
    wavs = jnp.zeros((B, 3, T), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    state = builder.init_state(jr.PRNGKey(0), wavs, lengths)
    enhance = graft.make_enhance(builder)
    c = program_cost(enhance, state.params, wavs, lengths)

    hop = builder.preprocessor._win_args["hop_length"]
    M = T // hop + 1
    H, I = 256, builder.preprocessor.feat_dims()[1]
    # 3-layer BLSTM: per direction, xw (in->4H) + hh (H->4H) per frame
    lstm = 0
    for layer_in in (I, 2 * H, 2 * H):
        lstm += 2 * (layer_in * 4 * H + H * 4 * H)  # MACs per frame, 2 dirs
    head_out = 2 * H * 201
    hand = 2.0 * B * M * (lstm + head_out)
    assert c["dot_flops"] > hand * 0.95
    assert c["dot_flops"] < hand * 1.15
    assert c["opaque_calls"] == 0


def test_pallas_lstm_program_costed_matches_scan_twin():
    """pallas_call is walked, not skipped: the Pallas-LSTM enhance program
    reports no opaque calls and its matmul count agrees with the scan
    twin's (same math; the kernel may pad, hence the tolerance)."""
    pytest.importorskip("jax.experimental.pallas")
    import __graft_entry__ as graft

    B, T = 2, 16000
    wavs = jnp.zeros((B, 3, T), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    costs = {}
    for use_pallas in (False, True):
        builder = graft._build(use_pallas=use_pallas)
        state = builder.init_state(jax.random.PRNGKey(0), wavs, lengths)
        enhance = graft.make_enhance(builder)
        costs[use_pallas] = program_cost(enhance, state.params, wavs, lengths)

    assert costs[True]["opaque_calls"] == 0
    ratio = costs[True]["dot_flops"] / costs[False]["dot_flops"]
    assert 0.9 < ratio < 1.3


def _toy_blocked_matmul(x, y):
    from jax.experimental import pallas as pl

    def kern(x_ref, y_ref, o_ref):
        o_ref[...] = jnp.dot(
            x_ref[...], y_ref[...], preferred_element_type=jnp.float32
        )

    return pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((32, 64), lambda i: (i, 0)),
            pl.BlockSpec((64, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(x, y)


def test_pallas_toy_kernel_flops_and_block_traffic_exact():
    """FLOPs = kernel body x grid steps; bytes = the block pipeline with
    Mosaic's consecutive-revisit elision: y's index map is grid-invariant
    so its block moves ONCE, x/o move once per grid step."""
    pytest.importorskip("jax.experimental.pallas")
    x = jnp.zeros((128, 64))
    y = jnp.zeros((64, 128))
    c = program_cost(_toy_blocked_matmul, x, y)
    assert c["opaque_calls"] == 0
    assert c["dot_flops"] == 2 * 128 * 64 * 128
    io = (128 * 64 + 64 * 128 + 128 * 128) * 4
    blocks = 4 * (32 * 64 * 4) + 1 * (64 * 128 * 4) + 4 * (32 * 128 * 4)
    assert c["hbm_bytes_model"] == io + blocks


def test_flash_attention_costed_exactly():
    """The flash kernel's dot count equals the closed form for both
    directions (qk+pv forward; +5 same-size dots in the backward), so the
    mockingjay MFU row is a real number, not a lower bound."""
    pytest.importorskip("jax.experimental.pallas")
    from speech_enhancement_by_s3prl_tpu.ops.pallas.attention_kernel import (
        flash_attention,
    )

    B, T, N, D = 2, 300, 12, 64
    q = jnp.zeros((B, T, N, D), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    def att(q):
        return flash_attention(q, q, q, scale=0.125, rate=0.1, rng=rng).sum()

    # v2 layout-native geometry (ops/pallas/attention_kernel.py
    # _geometry): keys padded to Tk=128-multiple, queries swept in nj
    # blocks of bq — the query side covers nj*bq rows
    tk = 128 * -(-T // 128)
    bq = max(128, min(256, tk))
    nj = -(-tk // bq)
    per_dot = 2.0 * B * N * (nj * bq) * tk * D

    fwd = program_cost(att, q)
    assert fwd["opaque_calls"] == 0
    assert fwd["dot_flops"] == 2 * per_dot  # qk + pv

    bwd = program_cost(jax.grad(att), q)
    assert bwd["opaque_calls"] == 0
    assert bwd["dot_flops"] == 7 * per_dot  # fwd rerun (2) + bwd (5)
