"""Sequence-parallel (ring) attention over a mesh axis.

Scales the backbone over the TOKEN dimension — the axis that actually grows
with image resolution (518px -> 1370 tokens, 756px -> 2917, 1036px -> 5477;
the reference caps at what one GPU's memory takes, ``base_dataset.py:124-144``
extracts whole images single-device).  Each device holds an L/n token slice of
q/k/v; k/v slices rotate around the ring via ``lax.ppermute`` (nearest-
neighbour ICI traffic, no all-gather), and every hop folds one (L/n, L/n)
score block into a running online-softmax accumulator — the flash-attention
merge, so the full (L, L) score matrix never exists on any chip and activation
memory per chip drops by n.

Everything else in a ViT block (LayerNorm, q/k/v/out projections, MLP) is
token-local, so GSPMD shards it over the same axis from one sharding
constraint on the residual stream; ring attention is the only part that needs
an explicit collective.  Config surface: ``tpu_cfg.mesh = {"data": N,
"seq": M}`` (see ``data/feature_extractor.py``).

Composes with tensor parallelism (2D-sharded attention): attention is
head-local, so ``ring_attention(h_axis="model")`` shards the head dim over a
second mesh axis inside the SAME shard_map — tokens ring over ``seq`` within
each head group, heads split over ``model``, zero communication beyond the 1D
ring.  Config surface: ``tpu_cfg.mesh = {"data": N, "model": M, "seq": S}``.

Padding: ViT token counts are 1 + grid**2 (2917 at 756px is prime), so the
token dim rarely divides a ring.  ``ring_attention`` therefore takes a
``valid`` mask; padded KEY positions contribute exactly zero probability
(their exp terms are multiplied by the mask, not just offset by a large
negative), and padded QUERY rows produce finite garbage that the caller
slices off.

Differentiable: ``ring_attention`` carries a custom VJP whose backward is
its own ring (flash-attention backward over rotating chunks).  The forward
saves only the per-query logsumexp — probabilities are recomputed per chunk
from ``exp(scores - lse)``, so the backward's memory is the same L/n slice
economics as the forward (a ``lax.scan``-autodiff'd ring would store every
(L/n, L/n) probability block and reconstitute the full score matrix across
the ring).  dk/dv accumulators ride the ring WITH their k/v chunk and are
home after n hops; dq accumulates locally.  This is what lets LoRA
fine-tuning at 756px+ shard its activation memory over the ``seq`` axis
instead of shrinking the batch (the reference's only lever,
``base_dataset.py:124-144`` extracts whole images single-device).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, D) -> (B*H, L, hd), batch-major then head (matches
    ops/attention.py::multi_head_attention's layout)."""
    b, l, d = x.shape
    hd = d // num_heads
    return x.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3).reshape(b * num_heads, l, hd)


def _merge_heads(x: jnp.ndarray, b: int, num_heads: int) -> jnp.ndarray:
    bh, l, hd = x.shape
    return x.reshape(b, num_heads, l, hd).transpose(0, 2, 1, 3).reshape(b, l, num_heads * hd)


# Finite stand-in for -inf: keeps the m/alpha recurrence NaN-free when a whole
# incoming chunk is masked (exp(-1e30 - m) underflows to 0; exp(m - m) hits
# exp(0) only when o and s are still exactly zero, where alpha=1 is harmless).
_NEG = -1e30


def _ring_body(qh, k_c, v_c, mask_c, m, s, o, *, scale: float, num_heads: int):
    """One online-softmax merge of the resident k/v chunk into (m, s, o).

    qh: (B*H, Lq, hd) f32; k_c/v_c: (B*H, Lk, hd) f32; mask_c: (B, Lk) bool.
    """
    bh = qh.shape[0]
    b = bh // num_heads
    lk = k_c.shape[1]
    mask_bh = jnp.broadcast_to(mask_c[:, None, :], (b, num_heads, lk)).reshape(bh, lk)

    scores = (
        jnp.einsum("bqd,bkd->bqk", qh, k_c, preferred_element_type=jnp.float32)
        * scale
    )
    scores = jnp.where(mask_bh[:, None, :], scores, _NEG)
    m_c = jnp.max(scores, axis=-1)
    m_new = jnp.maximum(m, m_c)
    # exp is taken on the MASKED scores and multiplied by the mask again:
    # when the whole chunk is masked, scores - m_new == 0 and exp gives 1 —
    # the multiply is what pins those lanes to exactly zero.
    p = jnp.exp(scores - m_new[..., None]) * mask_bh[:, None, :].astype(jnp.float32)
    alpha = jnp.exp(m - m_new)
    o = o * alpha[..., None] + jnp.einsum(
        "bqk,bkd->bqd", p, v_c, preferred_element_type=jnp.float32
    )
    s = s * alpha + jnp.sum(p, axis=-1)
    return m_new, s, o


def _varying(x, vary_axes):
    # a shard_map loop carry must be typed as device-varying over every
    # manual axis the inputs vary over (ring axis, plus the batch axis when
    # the batch is sharded); plain zeros/full constants are not
    try:
        return jax.lax.pcast(x, vary_axes, to="varying")
    except AttributeError:  # older jax: no vma tracking, nothing to do
        return x


def _local_ring(
    ql, kl, vl, maskl, *, num_heads: int, scale: float, axis: str, n_steps: int,
    vary_axes: tuple, want_lse: bool = False,
):
    """shard_map body: local q against the full ring of k/v chunks.

    ``want_lse``: also return the per-query logsumexp ``m + log(s)`` shaped
    (B, H, Lq) — the only residual the backward ring needs (probabilities
    are recomputed per chunk from ``exp(scores - lse)``, flash-style).
    """
    b, lq, d = ql.shape
    hd = d // num_heads
    qh = _split_heads(ql, num_heads).astype(jnp.float32)
    k0 = _split_heads(kl, num_heads).astype(jnp.float32)
    v0 = _split_heads(vl, num_heads).astype(jnp.float32)

    bh = b * num_heads
    perm = [(i, (i + 1) % n_steps) for i in range(n_steps)]

    def body(_, carry):
        k_c, v_c, mask_c, m, s, o = carry
        m, s, o = _ring_body(
            qh, k_c, v_c, mask_c, m, s, o, scale=scale, num_heads=num_heads
        )
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        mask_c = jax.lax.ppermute(mask_c, axis, perm)
        return k_c, v_c, mask_c, m, s, o

    init = (
        k0,
        v0,
        maskl,
        _varying(jnp.full((bh, lq), _NEG, jnp.float32), vary_axes),
        _varying(jnp.zeros((bh, lq), jnp.float32), vary_axes),
        _varying(jnp.zeros((bh, lq, hd), jnp.float32), vary_axes),
    )
    *_, m, s, o = jax.lax.fori_loop(0, n_steps, body, init)
    # every query row sees ALL keys over the ring and at least one global key
    # is real (CLS), so s > 0 everywhere — including padded query rows, whose
    # finite junk the caller slices away
    out = _merge_heads((o / s[..., None]).astype(ql.dtype), b, num_heads)
    if want_lse:
        return out, (m + jnp.log(s)).reshape(b, num_heads, lq)
    return out


def _local_ring_bwd(
    ql, kl, vl, maskl, ol, lsel, dol, *, num_heads: int, scale: float,
    axis: str, n_steps: int, vary_axes: tuple,
):
    """Backward ring: flash-attention backward over rotating k/v chunks.

    Per hop, probabilities for the resident chunk are recomputed from the
    saved logsumexp (``p = exp(scores - lse) * mask`` — already normalised,
    since ``lse = m + log(s)``), then the standard flash backward:

        dv_chunk += p^T @ do
        dp        = do @ v_chunk^T
        ds        = p * (dp - delta) * scale      (delta = sum(do * o))
        dq       += ds @ k_chunk
        dk_chunk += ds^T @ q

    dk/dv accumulators ride the ring WITH their chunk (same ppermute), so
    after n hops each is back on its home device with contributions from
    every device's queries; dq accumulates locally.  Memory is the same
    L/n-slice economics as the forward — no (L, L) block outlives a hop.

    Padding is self-correcting: masked keys give p == 0 -> zero dk/dv/dq
    contributions; padded QUERY rows only contribute through ``do``, which
    is zero there (the caller slices padded outputs off, so their cotangent
    arrives as zeros).
    """
    b, lq, d = ql.shape
    qh = _split_heads(ql, num_heads).astype(jnp.float32)
    k0 = _split_heads(kl, num_heads).astype(jnp.float32)
    v0 = _split_heads(vl, num_heads).astype(jnp.float32)
    oh = _split_heads(ol, num_heads).astype(jnp.float32)
    doh = _split_heads(dol, num_heads).astype(jnp.float32)
    bh = b * num_heads
    lse_h = lsel.reshape(bh, lq)  # (B, H, Lq) -> b-major-then-head, like qh
    delta = jnp.sum(doh * oh, axis=-1)  # (bh, lq)

    perm = [(i, (i + 1) % n_steps) for i in range(n_steps)]

    def body(_, carry):
        k_c, v_c, mask_c, dk_c, dv_c, dq = carry
        lk = k_c.shape[1]
        mask_bh = jnp.broadcast_to(
            mask_c[:, None, :], (b, num_heads, lk)
        ).reshape(bh, lk)
        scores = (
            jnp.einsum("bqd,bkd->bqk", qh, k_c, preferred_element_type=jnp.float32)
            * scale
        )
        scores = jnp.where(mask_bh[:, None, :], scores, _NEG)
        p = jnp.exp(scores - lse_h[..., None]) * mask_bh[:, None, :].astype(
            jnp.float32
        )
        dv_c = dv_c + jnp.einsum(
            "bqk,bqd->bkd", p, doh, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum(
            "bqd,bkd->bqk", doh, v_c, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum(
            "bqk,bkd->bqd", ds, k_c, preferred_element_type=jnp.float32
        )
        dk_c = dk_c + jnp.einsum(
            "bqk,bqd->bkd", ds, qh, preferred_element_type=jnp.float32
        )
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        mask_c = jax.lax.ppermute(mask_c, axis, perm)
        dk_c = jax.lax.ppermute(dk_c, axis, perm)
        dv_c = jax.lax.ppermute(dv_c, axis, perm)
        return k_c, v_c, mask_c, dk_c, dv_c, dq

    init = (
        k0,
        v0,
        maskl,
        # fresh constants (zeros_like of a device-varying input is already
        # varying, and pcast rejects varying -> varying)
        _varying(jnp.zeros(k0.shape, jnp.float32), vary_axes),
        _varying(jnp.zeros(v0.shape, jnp.float32), vary_axes),
        _varying(jnp.zeros(qh.shape, jnp.float32), vary_axes),
    )
    *_, dk, dv, dq = jax.lax.fori_loop(0, n_steps, body, init)
    return (
        _merge_heads(dq, b, num_heads).astype(ql.dtype),
        _merge_heads(dk, b, num_heads).astype(kl.dtype),
        _merge_heads(dv, b, num_heads).astype(vl.dtype),
    )


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "seq",
    valid: Optional[jnp.ndarray] = None,
    h_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention: (B, L, D) with L sharded over ``axis``.

    ``valid``: optional (B, L) bool; False marks padding tokens whose keys
    must contribute nothing.  L must divide by the axis size (pad first).
    Accumulation is f32 regardless of input dtype (the flash contract).

    ``h_axis``: optional second mesh axis for 2D-SHARDED attention (SP x TP):
    the head dim (last dim of q/k/v, column-split by the tensor-parallel
    projections) shards over ``h_axis`` while tokens ring over ``axis``.
    Attention is head-local, so the composition is orthogonal — each
    (seq, model) shard runs the same online-softmax merge on its own head
    slice and token chunk, and the ppermute ring rotates k/v within each
    head group (the ``axis`` sub-mesh).  Zero extra communication beyond
    the 1D ring; requires num_heads divisible by the ``h_axis`` size.
    """
    n = mesh.shape[axis]
    b, l, _ = q.shape
    if valid is None:
        valid = jnp.ones((b, l), bool)
    if h_axis is not None and mesh.shape[h_axis] == 1:
        h_axis = None
    if h_axis is not None:
        if h_axis == axis:
            raise ValueError(
                f"h_axis={h_axis!r} must differ from the ring axis {axis!r}"
            )
        if num_heads % mesh.shape[h_axis]:
            raise ValueError(
                f"{num_heads} heads not divisible by mesh axis "
                f"{h_axis}={mesh.shape[h_axis]}"
            )
    if n == 1:
        # degenerate ring (possibly head-sharded): the plain masked merge is
        # correct under GSPMD — head sharding propagates through the local
        # einsums without collectives since attention is head-local.
        # same math without the ring: one masked merge over the whole L
        qh = _split_heads(q, num_heads).astype(jnp.float32)
        m = jnp.full(qh.shape[:2], _NEG, jnp.float32)
        s = jnp.zeros(qh.shape[:2], jnp.float32)
        o = jnp.zeros_like(qh)
        m, s, o = _ring_body(
            qh,
            _split_heads(k, num_heads).astype(jnp.float32),
            _split_heads(v, num_heads).astype(jnp.float32),
            valid,
            m, s, o,
            scale=scale,
            num_heads=num_heads,
        )
        return _merge_heads((o / s[..., None]).astype(q.dtype), b, num_heads)
    if l % n:
        raise ValueError(f"token dim {l} not divisible by mesh axis {axis}={n}; pad first")

    # shard the batch over `data` too when it divides: an in_spec that omits
    # `data` declares the operands replicated over it, and GSPMD would
    # all-gather the batch so every data-group redundantly attends over the
    # GLOBAL batch.  (Non-divisible batches — bs=1 eval on a wide mesh —
    # keep the replicated fallback: redundant but correct.)
    b_axis = (
        "data"
        if "data" in mesh.axis_names
        and mesh.shape["data"] > 1
        and b % mesh.shape["data"] == 0
        and h_axis != "data"  # an axis can shard heads OR batch, not both
        else None
    )
    statics = (num_heads, float(scale), mesh, axis, b_axis, n, h_axis)
    return _ring_attention_sharded(statics, q, k, v, valid)


def _ring_kwargs(statics):
    num_heads, scale, mesh, axis, b_axis, n, h_axis = statics
    vary = [axis] if b_axis is None else [b_axis, axis]
    if h_axis is not None:
        # under 2D sharding the body sees only its LOCAL head slice; every
        # loop carry varies over the head axis too (different heads per shard)
        num_heads //= mesh.shape[h_axis]
        vary.append(h_axis)
    return dict(
        num_heads=num_heads, scale=scale, axis=axis, n_steps=n,
        vary_axes=tuple(vary),
    )


def _ring_specs(statics):
    _, _, mesh, axis, b_axis, _, h_axis = statics
    # h_axis shards the head (last) dim of q/k/v/o and the head dim of the
    # lse; the mask has no head dim and replicates over h_axis
    return (
        mesh,
        P(b_axis, axis, h_axis),
        P(b_axis, axis),
        P(b_axis, h_axis, axis),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_attention_sharded(statics, q, k, v, valid):
    """The n>1 sharded ring with a hand-rolled VJP.  Autodiff of the primal
    would need the fori_loop rewritten as a scan whose saved residuals are
    every hop's (L/n, L/n) probability block — the full score matrix spread
    over the ring.  The custom backward recomputes them from the logsumexp
    instead (see ``_local_ring_bwd``)."""
    mesh, spec3, spec_mask, _ = _ring_specs(statics)
    fn = jax.shard_map(
        functools.partial(_local_ring, **_ring_kwargs(statics)),
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec_mask),
        out_specs=spec3,
    )
    return fn(q, k, v, valid)


def _ring_attention_fwd(statics, q, k, v, valid):
    mesh, spec3, spec_mask, spec_lse = _ring_specs(statics)
    fn = jax.shard_map(
        functools.partial(_local_ring, want_lse=True, **_ring_kwargs(statics)),
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec_mask),
        out_specs=(spec3, spec_lse),
    )
    out, lse = fn(q, k, v, valid)
    return out, (q, k, v, valid, out, lse)


def _ring_attention_bwd(statics, res, do):
    q, k, v, valid, out, lse = res
    mesh, spec3, spec_mask, spec_lse = _ring_specs(statics)
    fn = jax.shard_map(
        functools.partial(_local_ring_bwd, **_ring_kwargs(statics)),
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec_mask, spec3, spec_lse, spec3),
        out_specs=(spec3, spec3, spec3),
    )
    dq, dk, dv = fn(q, k, v, valid, out, lse, do)
    # the mask is boolean: its cotangent type is float0 (no gradient)
    return dq, dk, dv, np.zeros(valid.shape, jax.dtypes.float0)


_ring_attention_sharded.defvjp(_ring_attention_fwd, _ring_attention_bwd)
