"""Analytic program cost model: FLOPs and an HBM-traffic model from jaxprs.

Why not XLA's own ``cost_analysis``: the HLO cost analysis visits a while
loop's body ONCE — it has no trip-count inference — so any scan-shaped
program (this framework's LSTM recurrence, chunked metric kernels) is
undercounted by the trip count (measured: a 100-step scan of an 8x16x16
matmul reported 4,353 flops instead of 409,600). At the *jaxpr* level the
trip count is still first-class (``scan`` carries ``length``), so walking
the jaxpr gives exact matmul/conv FLOP counts for exactly the programs XLA
gets wrong, including through ``grad`` (the backward is explicit in the
jaxpr) and ``remat`` (the re-computation appears as a second call).

Two numbers per program:

- ``flops``: 2*M*N*K per dot_general (batch dims folded in), the analogous
  count for convolutions, one flop per output element for elementwise /
  reduction primitives, scaled by the product of enclosing scan lengths.
  Matmuls dominate every mode of this framework; the elementwise tail is
  carried so the number is a complete program count, not a matmul subtotal.
- ``hbm_bytes_model``: a *traffic model*, not a counter — program inputs
  and outputs once, plus every dot/conv operand and result at its
  execution multiplicity, with loop-invariance accounting: an operand
  that enters a scan as a loop constant (the recurrent weight matrix) is
  counted once per outer execution, not once per step, matching what a
  fused loop that parks it in VMEM actually streams. Elementwise traffic
  is deliberately excluded (XLA fuses it into the matmuls); treat the
  number as the floor an ideally-fused execution still moves.

``while_loop`` has no static trip count: its body is counted once and the
program is flagged (``unbounded_loops``) so a caller can distrust the
totals. ``cond`` takes the more expensive branch.

``pallas_call`` is costed, not skipped: the equation carries the kernel
jaxpr and the grid mapping, so FLOPs are the kernel body walked once per
grid step, and HBM bytes come from the block pipeline itself — each
operand/result block moves block_bytes per grid step, EXCEPT that Mosaic
elides the copy when a block's index is unchanged from the previous grid
step (the "revisiting" optimization), which this model reproduces by
taint-analyzing each index map for which grid dimensions it depends on
(flash attention's full-row K/V blocks index as (b, n, 0, 0) over a
(B, N, J) grid: fetched B*N times, not B*N*J). Kernel-internal dot
operand traffic is VMEM, not HBM, and is excluded. Only calls the walker
cannot see through (no kernel jaxpr, dynamic grid bounds) still set
``opaque_calls`` — cost a scan-equivalent twin of those programs instead
(bench.py does this for the Pallas-LSTM modes).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import numpy as np

try:  # jax >= 0.9 moved the public core API to jax.extend
    from jax.extend import core as jcore
    jcore.Literal
except (ImportError, AttributeError):  # pragma: no cover - older jax
    from jax import core as jcore

# one flop per output element
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "exp", "exp2", "log", "log1p", "expm1", "tanh", "logistic", "erf",
    "sqrt", "rsqrt", "cbrt", "pow", "integer_pow", "rem",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "floor", "ceil", "round", "clamp", "nextafter",
    "gt", "lt", "ge", "le", "eq", "ne", "select_n",
    "and", "or", "xor", "not", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "square",
}
# one flop per *input* element
_REDUCTIONS = {
    "reduce_sum", "reduce_max", "reduce_min", "reduce_prod", "reduce_and",
    "reduce_or", "argmax", "argmin", "cumsum", "cumprod", "cummax", "cummin",
    "cumlogsumexp",
}


@dataclasses.dataclass
class _Totals:
    flops: float = 0.0
    dot_flops: float = 0.0
    bytes: float = 0.0
    unbounded_loops: int = 0
    opaque_calls: int = 0

    def add(self, other: "_Totals") -> None:
        self.flops += other.flops
        self.dot_flops += other.dot_flops
        self.bytes += other.bytes
        self.unbounded_loops += other.unbounded_loops
        self.opaque_calls += other.opaque_calls


def _nbytes(aval) -> float:
    try:
        return float(math.prod(aval.shape)) * np.dtype(aval.dtype).itemsize
    except Exception:
        return 0.0


def _nelem(aval) -> float:
    try:
        return float(math.prod(aval.shape))
    except Exception:
        return 0.0


def _atom_mult(atom, var_mult: Dict[Any, float], default: float) -> float:
    if isinstance(atom, jcore.Literal):
        return 1.0
    return var_mult.get(atom, default)


def _dot_cost(eqn, mult, var_mult, tot: _Totals) -> None:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    k = math.prod(lhs.shape[i] for i in lc) or 1
    b = math.prod(lhs.shape[i] for i in lb) or 1
    m = math.prod(
        lhs.shape[i] for i in range(len(lhs.shape)) if i not in lc and i not in lb
    ) or 1
    n = math.prod(
        rhs.shape[i] for i in range(len(rhs.shape)) if i not in rc and i not in rb
    ) or 1
    f = 2.0 * b * m * n * k * mult
    tot.flops += f
    tot.dot_flops += f
    for a in eqn.invars:
        tot.bytes += _nbytes(a.aval) * _atom_mult(a, var_mult, mult)
    tot.bytes += _nbytes(eqn.outvars[0].aval) * mult


def _conv_cost(eqn, mult, var_mult, tot: _Totals) -> None:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dnums = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1) * eqn.params.get(
        "batch_group_count", 1
    )
    # MACs per output element = kernel elements feeding it
    n_out_feat = rhs.shape[dnums.rhs_spec[0]]
    macs_per_out = math.prod(rhs.shape) / max(n_out_feat, 1) / max(groups, 1)
    f = 2.0 * _nelem(out) * macs_per_out * mult
    tot.flops += f
    tot.dot_flops += f
    for a in eqn.invars:
        tot.bytes += _nbytes(a.aval) * _atom_mult(a, var_mult, mult)
    tot.bytes += _nbytes(out) * mult


def _index_map_grid_deps(bm, n_grid: int):
    """Which grid dimensions a block mapping's index map depends on, by
    forward taint through its jaxpr (identity maps have no equations —
    outvars ARE invars). None = analysis unavailable, be conservative."""
    imj = getattr(bm, "index_map_jaxpr", None)
    if imj is None:
        return None
    jx = imj.jaxpr if hasattr(imj, "jaxpr") else imj
    taint: Dict[Any, frozenset] = {
        v: frozenset([i]) for i, v in enumerate(jx.invars) if i < n_grid
    }
    for eqn in jx.eqns:
        t = frozenset()
        for a in eqn.invars:
            if not isinstance(a, jcore.Literal):
                t |= taint.get(a, frozenset())
        for ov in eqn.outvars:
            taint[ov] = t
    deps = frozenset()
    for ov in jx.outvars:
        if not isinstance(ov, jcore.Literal):
            deps |= taint.get(ov, frozenset())
    return deps


def _block_fetches(bm, sizes) -> float:
    """HBM copies for one block mapping over a full grid sweep. The grid
    runs lexicographically (last dim fastest); Mosaic skips the copy when
    the block index equals the previous step's, so a map independent of a
    contiguous innermost suffix of grid dims is fetched total/run times,
    where run = product of that suffix's sizes."""
    total = math.prod(sizes) if sizes else 1.0
    deps = _index_map_grid_deps(bm, len(sizes))
    if deps is None:
        return total or 1.0
    run = 1.0
    for d in range(len(sizes) - 1, -1, -1):
        if d in deps:
            break
        run *= sizes[d]
    return max(total / max(run, 1.0), 1.0)


def _pallas_cost(eqn, mult: float, tot: _Totals) -> bool:
    """Cost a pallas_call from its kernel jaxpr + grid mapping; False if
    the call is genuinely opaque (caller then flags it)."""
    gm = eqn.params.get("grid_mapping")
    inner = eqn.params.get("jaxpr")
    if gm is None or inner is None:
        return False
    if getattr(gm, "num_dynamic_grid_bounds", 0):
        return False
    try:
        sizes = [float(int(g)) for g in (getattr(gm, "grid", ()) or ())]
    except (TypeError, ValueError):
        return False
    steps = math.prod(sizes) if sizes else 1.0
    # FLOPs: the kernel body per grid step. Its dot/elementwise *bytes*
    # are VMEM traffic, not HBM — keep flops/flags, drop sub.bytes.
    sub = _Totals()
    _walk(inner, mult * max(steps, 1.0), {}, sub)
    tot.flops += sub.flops
    tot.dot_flops += sub.dot_flops
    tot.unbounded_loops += sub.unbounded_loops
    tot.opaque_calls += sub.opaque_calls
    # HBM bytes: the block pipeline — block_bytes per grid step per
    # operand/result, minus Mosaic's consecutive-revisit elision.
    for bm in getattr(gm, "block_mappings", ()):
        aval = getattr(bm, "block_aval", None)
        aval = getattr(aval, "inner_aval", aval)
        tot.bytes += _nbytes(aval) * _block_fetches(bm, sizes) * mult
    return True


def _walk(jaxpr, mult: float, var_mult: Dict[Any, float], tot: _Totals) -> None:
    """Accumulate costs of ``jaxpr`` executed ``mult`` times; ``var_mult``
    maps vars to the multiplicity their *bytes* count at (loop-invariant
    operands keep the enclosing scope's multiplicity)."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name

        if name == "dot_general":
            _dot_cost(eqn, mult, var_mult, tot)
        elif name == "conv_general_dilated":
            _conv_cost(eqn, mult, var_mult, tot)
        elif name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            length = float(eqn.params["length"])
            nc = eqn.params["num_consts"]
            inner_mult = mult * length
            ivm: Dict[Any, float] = {}
            for iv, ov in zip(inner.invars[:nc], eqn.invars[:nc]):
                ivm[iv] = _atom_mult(ov, var_mult, mult)  # loop constants
            _walk(inner, inner_mult, ivm, tot)
        elif name == "while":
            tot.unbounded_loops += 1
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, {}, tot)
        elif name == "cond":
            best = None
            for br in eqn.params["branches"]:
                t = _Totals()
                _walk(br.jaxpr, mult, {}, t)
                if best is None or t.flops > best.flops:
                    best = t
            if best is not None:
                tot.add(best)
        elif name in ("pjit", "closed_call", "core_call", "xla_call"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            inner = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            ivm = {
                iv: _atom_mult(ov, var_mult, mult)
                for iv, ov in zip(inner.invars, eqn.invars)
            }
            _walk(inner, mult, ivm, tot)
        elif name in ("custom_jvp_call", "custom_vjp_call",
                      "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr"):
            inner = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
            if inner is not None:
                inner = inner.jaxpr if hasattr(inner, "jaxpr") else inner
                ivm = {
                    iv: _atom_mult(ov, var_mult, mult)
                    for iv, ov in zip(inner.invars, eqn.invars)
                }
                _walk(inner, mult, ivm, tot)
        elif name in ("remat", "remat2", "checkpoint"):
            inner = eqn.params["jaxpr"]
            inner = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            ivm = {
                iv: _atom_mult(ov, var_mult, mult)
                for iv, ov in zip(inner.invars, eqn.invars)
            }
            _walk(inner, mult, ivm, tot)
        elif name == "pallas_call":
            if not _pallas_cost(eqn, mult, tot):
                tot.opaque_calls += 1
        elif name in ("custom_call", "mosaic_call"):
            tot.opaque_calls += 1
        elif name in _ELEMENTWISE:
            tot.flops += sum(_nelem(o.aval) for o in eqn.outvars) * mult
        elif name in _REDUCTIONS:
            tot.flops += sum(_nelem(i.aval) for i in eqn.invars
                             if not isinstance(i, jcore.Literal)) * mult
        # everything else (reshape/transpose/slice/gather/convert/rng/...)
        # is data movement or negligible: zero flops, bytes folded into the
        # fused-matmul traffic model by construction

        # invariance propagation: an output derived only from
        # lower-multiplicity inputs keeps that multiplicity
        in_mults = [
            _atom_mult(a, var_mult, mult)
            for a in eqn.invars
            if not isinstance(a, jcore.Literal)
        ]
        if in_mults and max(in_mults) < mult:
            for ov in eqn.outvars:
                var_mult[ov] = max(in_mults)


def program_cost(fn, *args, **kwargs) -> Dict[str, float]:
    """Cost totals for ``fn(*args, **kwargs)``: traces to a jaxpr (no
    device execution, no compile) and walks it.

    Returns ``flops`` (total), ``dot_flops`` (matmul/conv subtotal),
    ``hbm_bytes_model`` (see module docstring), plus ``unbounded_loops``
    and ``opaque_calls`` honesty flags."""
    closed = jax.make_jaxpr(lambda *a, **kw: fn(*a, **kw))(*args, **kwargs)
    tot = _Totals()
    _walk(closed.jaxpr, 1.0, {v: 1.0 for v in closed.jaxpr.invars}, tot)
    io_bytes = sum(_nbytes(v.aval) for v in closed.jaxpr.invars)
    io_bytes += sum(
        _nbytes(v.aval) for v in closed.jaxpr.outvars
        if not isinstance(v, jcore.Literal)
    )
    return {
        "flops": tot.flops,
        "dot_flops": tot.dot_flops,
        "hbm_bytes_model": tot.bytes + io_bytes,
        "unbounded_loops": tot.unbounded_loops,
        "opaque_calls": tot.opaque_calls,
    }
