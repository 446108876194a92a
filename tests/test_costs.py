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


def test_pallas_program_flags_opaque(monkeypatch):
    pl = pytest.importorskip("jax.experimental.pallas")
    import __graft_entry__ as graft

    builder = graft._build(use_pallas=True)
    B, T = 2, 16000
    wavs = jnp.zeros((B, 3, T), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    state = builder.init_state(jax.random.PRNGKey(0), wavs, lengths)
    enhance = graft.make_enhance(builder)
    c = program_cost(enhance, state.params, wavs, lengths)
    assert c["opaque_calls"] >= 1
