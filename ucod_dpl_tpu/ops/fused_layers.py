"""Fused transformer-layer fragments (Pallas TPU).

``layernorm_qkv``: LayerNorm + the three q/k/v projections in one kernel —
the hidden state is read from HBM once and normalised in-register instead of
LN writing a 33MB intermediate that three separate matmuls re-read
(0.53ms -> 0.42ms per layer at bs16@518px; scripts/bench_lnqkv.py).

The MLP half was measured AT its bandwidth/compute roofline under plain XLA
(fc1+gelu+fc2 fuse already), so no kernel exists for it — see
ROADMAP/profiling notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucod_dpl_tpu.ops.attention import (
    _ceil_to,
    _interpret,
    _needs_host_padding,
    use_pallas,
)
from ucod_dpl_tpu.ops.quant import _EPS  # single source of truth for the scale floor

_BQ = 704  # rows per program: best measured at ViT-B 518px shapes


def _lnqkv_kernel(
    x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, bias_ref, q_ref, k_ref, v_ref,
    *, eps: float,
):
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]).astype(
        x_ref.dtype
    )
    for idx, (w_ref, o_ref) in enumerate(
        ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref))
    ):
        o = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[0] = (o + bias_ref[idx]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _pallas_layernorm_qkv(x, ln_scale, ln_bias, wq, wk, wv, bqkv, eps: float):
    b, l, d = x.shape
    bq = min(_BQ, _ceil_to(l, 128))
    lp = _ceil_to(l, bq)
    padded = lp != l and _needs_host_padding()
    if padded:  # the (CPU-hosted) interpreter lacks Mosaic's boundary masking
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out_len = lp if padded else l

    grid = (b, lp // bq)
    vec = pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((d, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_lnqkv_kernel, eps=eps),
        grid=grid,
        in_specs=[
            blk, vec, vec, mat, mat, mat,
            pl.BlockSpec((3, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[blk] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, out_len, d), x.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, ln_scale, ln_bias, wq, wk, wv, bqkv)
    if padded:
        outs = [o[:, :l, :] for o in outs]
    return tuple(outs)


_BQ_FC1 = 512  # measured sweet spot (4.7MB resident weight + 3MB out tile)


def _lnfc1_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, o_ref, *, eps: float):
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]).astype(
        x_ref.dtype
    )
    h1 = (
        jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[0]
    ).astype(o_ref.dtype)
    o_ref[0] = jax.nn.gelu(h1, approximate=True)


@functools.partial(jax.jit, static_argnames=("eps",))
def _pallas_layernorm_fc1_gelu(x, ln_scale, ln_bias, w1, b1, eps: float):
    b, l, d = x.shape
    df = w1.shape[-1]
    bq = min(_BQ_FC1, _ceil_to(l, 128))
    lp = _ceil_to(l, bq)
    padded = lp != l and _needs_host_padding()
    if padded:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out_len = lp if padded else l

    grid = (b, lp // bq)
    out = pl.pallas_call(
        functools.partial(_lnfc1_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, df), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_len, df), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, ln_scale, ln_bias, w1, b1)
    return out[:, :l, :] if padded else out


def layernorm_fc1_gelu(x, norm_params, fc1_params, eps: float):
    """(B, L, D) -> gelu(fc1(layernorm(x))): the MLP half up to the hidden
    expansion.  LayerNorm's reduction breaks XLA's fusion chain before fc1,
    so fusing them (resident fc1 weight, in-register stats) reads x once
    (0.55 -> 0.49ms/layer).  The full MLP-half kernel (incl. fc2) was
    measured SLOWER than XLA (VMEM pressure kills pipelining) — only this
    half is fused."""
    d = x.shape[-1]
    df = fc1_params["w"].shape[-1]
    if use_pallas() and d % 128 == 0 and df % 128 == 0:
        return _pallas_layernorm_fc1_gelu(
            x,
            norm_params["scale"].astype(jnp.float32).reshape(1, d),
            norm_params["bias"].astype(jnp.float32).reshape(1, d),
            fc1_params["w"].astype(x.dtype),
            fc1_params["b"].astype(jnp.float32).reshape(1, df),
            float(eps),
        )
    from ucod_dpl_tpu.models.dino import _dense, _layernorm

    h = _layernorm(x, norm_params, eps)
    h = _dense(h, fc1_params, x.dtype)
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(h, approximate=True)
    return jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)


def _lnqkv_w8a8_kernel(
    x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, ws_ref, bias_ref,
    q_ref, k_ref, v_ref, *, eps: float,
):
    """LayerNorm + per-token int8 quantization + three W8A8 projections,
    all in one VMEM residency: the normalised activations are quantized
    in-register (never written to HBM) and the q/k/v dots run in the MXU's
    2x-rate int8 mode (int8 x int8 -> int32, verified native on v5e)."""
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]
    # per-token symmetric int8 (mirrors ops/quant.py::quantize_act)
    s_x = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, _EPS)
    h_q = jnp.clip(jnp.round(h / s_x), -127.0, 127.0).astype(jnp.int8)
    for idx, (w_ref, o_ref) in enumerate(
        ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref))
    ):
        acc = jnp.dot(h_q, w_ref[...], preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (s_x * ws_ref[idx]) + bias_ref[idx]
        o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _pallas_layernorm_qkv_w8a8(x, ln_scale, ln_bias, wq, wk, wv, wsc, bqkv, eps):
    b, l, d = x.shape
    bq = min(_BQ, _ceil_to(l, 128))
    lp = _ceil_to(l, bq)
    padded = lp != l and _needs_host_padding()
    if padded:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out_len = lp if padded else l

    grid = (b, lp // bq)
    vec = pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((d, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    tri = pl.BlockSpec((3, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_lnqkv_w8a8_kernel, eps=eps),
        grid=grid,
        in_specs=[blk, vec, vec, mat, mat, mat, tri, tri],
        out_specs=[blk] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, out_len, d), x.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, ln_scale, ln_bias, wq, wk, wv, wsc, bqkv)
    if padded:
        outs = [o[:, :l, :] for o in outs]
    return tuple(outs)


_BQ_FC1_Q8 = 256  # (bq,3072) f32 intermediates: 256 keeps the tile ~10MB
_SCALE_LANES = 8  # lane width of the per-token-scale output (see kernel note)


def _lnfc1gelu_w8a8_kernel(
    x_ref, s_ref, b_ref, w1_ref, ws_ref, b1_ref, oq_ref, os_ref, *, eps: float
):
    """LayerNorm + per-token int8 quant + int8 fc1 + gelu + per-token int8
    RE-quantization of the gelu output — the fc2 input leaves this kernel
    already int8, so the (L, 4D) hidden expansion never round-trips HBM in
    float at all on the W8A8 path."""
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]
    s_x = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, _EPS)
    h_q = jnp.clip(jnp.round(h / s_x), -127.0, 127.0).astype(jnp.int8)
    acc = jnp.dot(h_q, w1_ref[...], preferred_element_type=jnp.int32)
    h1 = acc.astype(jnp.float32) * (s_x * ws_ref[0]) + b1_ref[0]
    g = jax.nn.gelu(h1, approximate=True)
    s1 = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True) / 127.0, _EPS)
    oq_ref[0] = jnp.clip(jnp.round(g / s1), -127.0, 127.0).astype(jnp.int8)
    # The per-token scale leaves the kernel broadcast over a small lane dim:
    # a (bq,) / (1, bq) output block puts bq in the LANE position where
    # Mosaic requires %128==0 or ==array-dim — illegal for B>1 (the exact
    # lowering failure BENCH_r04 recorded).  (bq, _SCALE_LANES) keeps bq in
    # the sublane slot (%8==0) and the lane dim equal to the array dim.
    os_ref[0] = jnp.broadcast_to(s1, (s1.shape[0], _SCALE_LANES))


@functools.partial(jax.jit, static_argnames=("eps",))
def _pallas_lnfc1gelu_w8a8(x, ln_scale, ln_bias, w1_q, w1_s, b1, eps: float):
    b, l, d = x.shape
    df = w1_q.shape[-1]
    bq = min(_BQ_FC1_Q8, _ceil_to(l, 128))
    lp = _ceil_to(l, bq)
    padded = lp != l and _needs_host_padding()
    if padded:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out_len = lp if padded else l

    grid = (b, lp // bq)
    vec = pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    h1_q, s1 = pl.pallas_call(
        functools.partial(_lnfc1gelu_w8a8_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            vec,
            vec,
            pl.BlockSpec((d, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, df), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bq, _SCALE_LANES),
                lambda bb, i: (bb, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, out_len, df), jnp.int8),
            jax.ShapeDtypeStruct((b, out_len, _SCALE_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, ln_scale, ln_bias, w1_q, w1_s, b1)
    return h1_q[:, :l, :], s1[:, :l, :1]


def layernorm_fc1_gelu_w8a8(x, norm_params, q8_fc1, eps: float):
    """(B, L, D) -> int8-quantized ``gelu(fc1_w8a8(layernorm(x)))`` plus its
    per-token scales, ready for a :func:`~ucod_dpl_tpu.ops.quant.
    dense_w8a8_pre` fc2.

    The MLP half of the W8A8 path: without this it pays an unfused LN, a
    separate activation-quant pass AND a full (L, 4D) float round-trip of
    the gelu output before fc2's quantization.  gelu is tanh-approximate in
    BOTH the kernel and the fallback (the ~1e-3 approximation error is far
    below the int8 quantization noise it feeds into).
    """
    d = x.shape[-1]
    df = q8_fc1["w_q"].shape[-1]
    if use_pallas() and d % 128 == 0 and df % 128 == 0:
        return _pallas_lnfc1gelu_w8a8(
            x,
            norm_params["scale"].astype(jnp.float32).reshape(1, d),
            norm_params["bias"].astype(jnp.float32).reshape(1, d),
            q8_fc1["w_q"],
            q8_fc1["w_s"].astype(jnp.float32).reshape(1, df),
            q8_fc1["b"].astype(jnp.float32).reshape(1, df),
            float(eps),
        )
    from ucod_dpl_tpu.models.dino import _layernorm
    from ucod_dpl_tpu.ops.quant import dense_w8a8_pre, quantize_act

    h = _layernorm(x, norm_params, eps)
    h_q, h_s = quantize_act(h)
    g = jax.nn.gelu(
        dense_w8a8_pre(h_q, h_s, q8_fc1, jnp.float32), approximate=True
    )
    return quantize_act(g)


_BQ_MLP_Q8 = 128  # whole-MLP tile: 2x int8 weights (4.5MB) + (bq,4D) f32
#                   intermediates — 128 rows keeps the residency well under
#                   the 16MB scoped-vmem limit


def _lnmlp_w8a8_kernel(
    x_ref, s_ref, b_ref, w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref, b2_ref,
    o_ref, *, eps: float,
):
    """The ENTIRE int8 MLP half in one kernel: LN + per-token quant + int8
    fc1 + gelu + per-token requant + int8 fc2.  The (bq, 4D) hidden
    expansion lives only in VMEM — neither the f32 gelu activations nor
    their int8 codes ever touch HBM."""
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]
    s_x = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, _EPS)
    h_q = jnp.clip(jnp.round(h / s_x), -127.0, 127.0).astype(jnp.int8)
    acc1 = jnp.dot(h_q, w1_ref[...], preferred_element_type=jnp.int32)
    h1 = acc1.astype(jnp.float32) * (s_x * w1s_ref[0]) + b1_ref[0]
    g = jax.nn.gelu(h1, approximate=True)
    s1 = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True) / 127.0, _EPS)
    g_q = jnp.clip(jnp.round(g / s1), -127.0, 127.0).astype(jnp.int8)
    acc2 = jnp.dot(g_q, w2_ref[...], preferred_element_type=jnp.int32)
    o = acc2.astype(jnp.float32) * (s1 * w2s_ref[0]) + b2_ref[0]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _pallas_lnmlp_w8a8(x, ln_scale, ln_bias, w1_q, w1_s, b1, w2_q, w2_s, b2, eps):
    b, l, d = x.shape
    df = w1_q.shape[-1]
    bq = min(_BQ_MLP_Q8, _ceil_to(l, 128))
    lp = _ceil_to(l, bq)
    padded = lp != l and _needs_host_padding()
    if padded:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out_len = lp if padded else l

    grid = (b, lp // bq)
    vec_d = pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lnmlp_w8a8_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            vec_d, vec_d,
            pl.BlockSpec((d, df), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            vec_f, vec_f,
            pl.BlockSpec((df, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            vec_d, vec_d,
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_len, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, ln_scale, ln_bias, w1_q, w1_s, b1, w2_q, w2_s, b2)
    return out[:, :l, :] if padded else out


def layernorm_mlp_w8a8(x, norm_params, q8_fc1, q8_fc2, eps: float):
    """(B, L, D) -> the full int8 MLP half ``fc2_w8a8(requant(gelu(
    fc1_w8a8(quant(layernorm(x))))))`` in one Pallas kernel — the (L, 4D)
    hidden expansion never leaves VMEM in any dtype.  Same arithmetic as
    :func:`layernorm_fc1_gelu_w8a8` + ``dense_w8a8_pre`` (that split is the
    fallback), so parity bounds carry over unchanged."""
    d = x.shape[-1]
    df = q8_fc1["w_q"].shape[-1]
    if use_pallas() and d % 128 == 0 and df % 128 == 0:
        return _pallas_lnmlp_w8a8(
            x,
            norm_params["scale"].astype(jnp.float32).reshape(1, d),
            norm_params["bias"].astype(jnp.float32).reshape(1, d),
            q8_fc1["w_q"],
            q8_fc1["w_s"].astype(jnp.float32).reshape(1, df),
            q8_fc1["b"].astype(jnp.float32).reshape(1, df),
            q8_fc2["w_q"],
            q8_fc2["w_s"].astype(jnp.float32).reshape(1, d),
            q8_fc2["b"].astype(jnp.float32).reshape(1, d),
            float(eps),
        )
    from ucod_dpl_tpu.ops.quant import dense_w8a8_pre

    h1_q, s1 = layernorm_fc1_gelu_w8a8(x, norm_params, q8_fc1, eps)
    return dense_w8a8_pre(h1_q, s1, q8_fc2, x.dtype)


def layernorm_qkv_w8a8(x, norm_params, q8_q, q8_k, q8_v, eps: float):
    """(B, L, D) hidden state -> int8-W8A8 (q, k, v) of its LayerNorm.

    The int8 sibling of :func:`layernorm_qkv` — without it the opt-in int8
    serving path paid the unfused composition (LN writes a full f32
    intermediate that three matmuls re-read, plus a separate quantization
    pass), giving back most of the 2x-MXU win.  Param dicts use the
    ops/quant.py layout: ``{"w_q": int8 (d, d), "w_s": f32 (d,), "b": f32}``.
    Falls back to the shared-quant XLA composition off-TPU.
    """
    d = x.shape[-1]
    if use_pallas() and d % 128 == 0:
        wsc = jnp.stack([q8_q["w_s"], q8_k["w_s"], q8_v["w_s"]]).astype(jnp.float32)
        bqkv = jnp.stack([q8_q["b"], q8_k["b"], q8_v["b"]]).astype(jnp.float32)
        return _pallas_layernorm_qkv_w8a8(
            x,
            norm_params["scale"].astype(jnp.float32).reshape(1, d),
            norm_params["bias"].astype(jnp.float32).reshape(1, d),
            q8_q["w_q"], q8_k["w_q"], q8_v["w_q"], wsc, bqkv,
            float(eps),
        )
    from ucod_dpl_tpu.models.dino import _layernorm
    from ucod_dpl_tpu.ops.quant import dense_w8a8_pre, quantize_act

    h = _layernorm(x, norm_params, eps)
    h_q, h_s = quantize_act(h)
    return (
        dense_w8a8_pre(h_q, h_s, q8_q, x.dtype),
        dense_w8a8_pre(h_q, h_s, q8_k, x.dtype),
        dense_w8a8_pre(h_q, h_s, q8_v, x.dtype),
    )


def layernorm_qkv(x, norm_params, q_params, k_params, v_params, eps: float):
    """(B, L, D) hidden state -> (q, k, v) projections of its LayerNorm.

    Pallas-fused on TPU; falls back to the plain composition elsewhere.
    Param dicts use the dino layout: norm {scale, bias}, linear {w, b}.
    """
    d = x.shape[-1]
    if use_pallas() and d % 128 == 0:
        bqkv = jnp.stack(
            [q_params["b"], k_params["b"], v_params["b"]]
        ).astype(jnp.float32)
        return _pallas_layernorm_qkv(
            x,
            norm_params["scale"].astype(jnp.float32).reshape(1, d),
            norm_params["bias"].astype(jnp.float32).reshape(1, d),
            q_params["w"].astype(x.dtype),
            k_params["w"].astype(x.dtype),
            v_params["w"].astype(x.dtype),
            bqkv,
            float(eps),
        )
    from ucod_dpl_tpu.models.dino import _dense, _layernorm

    h = _layernorm(x, norm_params, eps)
    return (
        _dense(h, q_params, x.dtype),
        _dense(h, k_params, x.dtype),
        _dense(h, v_params, x.dtype),
    )


def _quantdense_w8a8_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref):
    """Per-token int8 quantization + one W8A8 matmul in a single VMEM
    residency — the activation is quantized in-register, so the float input
    is read from HBM exactly once and the int8 codes never round-trip."""
    xf = x_ref[0].astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, _EPS)
    x_q = jnp.clip(jnp.round(xf / s_x), -127.0, 127.0).astype(jnp.int8)
    acc = jnp.dot(x_q, w_ref[...], preferred_element_type=jnp.int32)
    o = acc.astype(jnp.float32) * (s_x * ws_ref[0]) + b_ref[0]
    o_ref[0] = o.astype(o_ref.dtype)


@jax.jit
def _pallas_quant_dense_w8a8(x, w_q, w_s, b):
    b_, l, d = x.shape
    dout = w_q.shape[-1]
    bq = min(_BQ, _ceil_to(l, 128))
    lp = _ceil_to(l, bq)
    padded = lp != l and _needs_host_padding()
    if padded:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])
    out_len = lp if padded else l

    grid = (b_, lp // bq)
    out = pl.pallas_call(
        _quantdense_w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, dout), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_, out_len, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, w_q, w_s, b)
    return out[:, :l, :] if padded else out


# measured crossover for the fused quant+dense kernel (same-process
# interleaved A/B, scripts/microbench/bench_int8_outproj.py, v5e @518px):
# bs32 (43.8K tokens) fused wins +0.4%; bs64 (87.7K) fused LOSES 2.2% —
# above ~64K tokens XLA's batched unfused matmul amortises better than the
# kernel's per-block weight residency.  Serving defaults (max_batch 16/32)
# sit comfortably below.
_QUANT_DENSE_MAX_TOKENS = 65536


def dense_quant_w8a8(x, qp, out_dtype):
    """Fused quantize-and-matmul for a single W8A8 linear on a float input
    — the attention OUT projection on the int8 path (its input arrives in
    bf16 from the flash kernel; ``ops/quant.dense_w8a8`` would write the
    int8 codes through HBM between the VPU quantize and the MXU dot).
    Bit-identical quantization to ``quantize_act`` (same _EPS floor, same
    rounding); falls back to the unfused composition off-TPU, when the
    output dtype differs from ``x.dtype`` (one out_shape), or above the
    measured token-count crossover (see _QUANT_DENSE_MAX_TOKENS)."""
    from ucod_dpl_tpu.ops.quant import dense_w8a8

    d = x.shape[-1]
    dout = qp["w_q"].shape[-1]
    n_tokens = 1
    for s in x.shape[:-1]:
        n_tokens *= s
    if (
        use_pallas()
        and d % 128 == 0
        and dout % 128 == 0
        and out_dtype == x.dtype
        and n_tokens <= _QUANT_DENSE_MAX_TOKENS
    ):
        return _pallas_quant_dense_w8a8(
            x,
            qp["w_q"],
            qp["w_s"].astype(jnp.float32).reshape(1, dout),
            qp["b"].astype(jnp.float32).reshape(1, dout),
        )
    return dense_w8a8(x, qp, out_dtype)
