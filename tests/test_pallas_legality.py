"""Static Mosaic block-legality sweep over every Pallas kernel.

Closes the interpret-green/chip-broken hole from round 4 (BENCH_r04: the
fused int8 LN+fc1+gelu kernel lowered fine in interpret mode but Mosaic
rejected its (1, bq) per-token-scale block at any batch > 1 on real TPU).

Under ``UCOD_ASSUME_MOSAIC=1`` the kernels trace exactly as they do on a
real TPU (Pallas path, NO host-side padding, interpret=False); we
``jax.eval_shape`` that trace — nothing executes — while recording every
``pl.pallas_call``'s BlockSpecs against the arrays they block, then check
the exact last-two-dims rule Mosaic enforces at lowering time
(ops/pallas_legality.py).

Shape matrix = everything the production paths can produce: bs 1/2/16/32,
518px (L=1370) / 756px (L=2917) / an exact-multiple length (L=1280),
f32 and bf16, forward AND flash-backward (LoRA training), both attention
layouts, the four fused LN kernels and the fused quant+dense kernel.
"""

import jax
import jax.numpy as jnp
import pytest

from ucod_dpl_tpu.ops import attention as attn
from ucod_dpl_tpu.ops import fused_layers as fl
from ucod_dpl_tpu.ops.pallas_legality import (
    PallasCallRecord,
    block_issues,
    record_pallas_calls,
)

D = 768
DF = 3072

BATCHES = (1, 2, 16, 32)
# 518px/14 -> 37^2+1; 756px/14 -> 54^2+1; 1280 = exact multiple of the blocks
SEQ_LENS = (1370, 2917, 1280)
DTYPES = (jnp.float32, jnp.bfloat16)


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _params(dtype):
    norm = {"scale": sds((D,), jnp.float32), "bias": sds((D,), jnp.float32)}
    lin_d = {"w": sds((D, D), dtype), "b": sds((D,), jnp.float32)}
    fc1 = {"w": sds((D, DF), dtype), "b": sds((DF,), jnp.float32)}
    q8_d = {"w_q": sds((D, D), jnp.int8), "w_s": sds((D,), jnp.float32),
            "b": sds((D,), jnp.float32)}
    q8_f = {"w_q": sds((D, DF), jnp.int8), "w_s": sds((DF,), jnp.float32),
            "b": sds((DF,), jnp.float32)}
    return norm, lin_d, fc1, q8_d, q8_f


def _traced_cases(b, l, dtype):
    """(name, fn, args) for every kernel entry point at one shape point."""
    norm, lin_d, fc1, q8_d, q8_f = _params(dtype)
    x = sds((b, l, D), dtype)
    scale = 64.0**-0.5

    def attn_fwd(q, k, v):
        return attn.multi_head_attention(q, k, v, 12, scale=scale)

    def attn_grad(q, k, v):
        return jax.grad(
            lambda qq: jnp.sum(
                attn.multi_head_attention(qq, k, v, 12, scale=scale)
            ).astype(jnp.float32)
        )(q)

    def attn_perhead(q, k, v):
        # odd head count routes to the per-head (BH, L, hd) kernel layout
        return attn.multi_head_attention(q, k, v, 3, scale=256.0**-0.5)

    # params are eval_shape ARGUMENTS (not closures): the wrappers stack /
    # reshape them eagerly, which needs tracers, not ShapeDtypeStructs
    return [
        ("layernorm_qkv",
         lambda xx, n, qp, kp, vp: fl.layernorm_qkv(xx, n, qp, kp, vp, 1e-6),
         (x, norm, lin_d, lin_d, lin_d)),
        ("layernorm_fc1_gelu",
         lambda xx, n, f: fl.layernorm_fc1_gelu(xx, n, f, 1e-6),
         (x, norm, fc1)),
        ("layernorm_qkv_w8a8",
         lambda xx, n, qp, kp, vp: fl.layernorm_qkv_w8a8(
             xx, n, qp, kp, vp, 1e-6),
         (x, norm, q8_d, q8_d, q8_d)),
        ("layernorm_fc1_gelu_w8a8",
         lambda xx, n, f: fl.layernorm_fc1_gelu_w8a8(xx, n, f, 1e-6),
         (x, norm, q8_f)),
        ("dense_quant_w8a8",
         lambda xx, qd: fl.dense_quant_w8a8(xx, qd, dtype),
         (x, q8_d)),
        ("layernorm_mlp_w8a8",
         lambda xx, n, f1, f2: fl.layernorm_mlp_w8a8(xx, n, f1, f2, 1e-6),
         (x, norm, q8_f, {"w_q": sds((DF, D), jnp.int8),
                          "w_s": sds((D,), jnp.float32),
                          "b": sds((D,), jnp.float32)})),
        ("attention_packed_fwd", attn_fwd, (x, x, x)),
        ("attention_packed_grad", attn_grad, (x, x, x)),
        ("attention_perhead", attn_perhead, (x, x, x)),
    ]


@pytest.fixture(autouse=True)
def _assume_mosaic(monkeypatch):
    monkeypatch.delenv("UCOD_PALLAS_INTERPRET", raising=False)
    monkeypatch.delenv("UCOD_DISABLE_PALLAS", raising=False)
    monkeypatch.setenv("UCOD_ASSUME_MOSAIC", "1")
    # env flags are read at trace time: drop any trace cached under other
    # flag values so the spy sees a fresh trace for every case
    jax.clear_caches()
    yield
    jax.clear_caches()


@pytest.mark.parametrize("l", SEQ_LENS)
@pytest.mark.parametrize("dtype", DTYPES, ids=("f32", "bf16"))
def test_mosaic_block_legality(l, dtype):
    for b in BATCHES:
        for name, fn, args in _traced_cases(b, l, dtype):
            records = []
            # a jit-cache hit from an earlier case would skip pallas_call
            # re-tracing and leave the spy blind — force a fresh trace
            jax.clear_caches()
            with record_pallas_calls(records):
                jax.eval_shape(fn, *args)
            issues = [i for r in records for i in r.issues()]
            assert not issues, (
                f"{name} @ bs={b} L={l} {jnp.dtype(dtype).name}:\n  "
                + "\n  ".join(issues)
            )
            # non-vacuous: the TPU path must actually have hit Pallas
            # (attention_packed_grad may legitimately take the XLA backward
            # at long sequences, but its forward still records;
            # dense_quant_w8a8 legitimately falls back above its measured
            # token-count crossover)
            if name == "dense_quant_w8a8" and b * l > fl._QUANT_DENSE_MAX_TOKENS:
                assert not records, f"{name} @ bs={b} L={l}: crossover ignored"
            else:
                assert records, f"{name} @ bs={b} L={l}: no pallas_call traced"


def test_rule_catches_the_r04_regression():
    """The exact spec shipped broken in round 4 must be flagged: a (1, 256)
    block on a (32, 1370) array puts 1 in the sublane slot (not %8, not
    equal to 32) — Mosaic's lowering error, reproduced statically."""
    assert block_issues((1, 256), (32, 1370))
    # and the repaired layout passes: bq in the sublane slot, lane == array
    assert not block_issues((1, 256, 8), (32, 1370, 8))


def test_record_pairs_specs_with_arrays():
    """End-to-end spy sanity on a real kernel trace: records carry the
    kernel name and one pair per operand/output."""
    records = []
    norm, lin_d, _, _, _ = _params(jnp.bfloat16)
    with record_pallas_calls(records):
        jax.eval_shape(
            lambda x, n, qp, kp, vp: fl.layernorm_qkv(x, n, qp, kp, vp, 1e-6),
            sds((2, 1370, D), jnp.bfloat16), norm, lin_d, lin_d, lin_d,
        )
    assert len(records) == 1
    rec = records[0]
    assert isinstance(rec, PallasCallRecord)
    assert rec.kernel == "_lnqkv_kernel"
    assert len(rec.pairs) == 7 + 3  # 7 inputs + 3 outputs
    assert rec.pairs[0][2] == (2, 1370, D)
