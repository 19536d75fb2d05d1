"""One-command on-hardware numerics self-check.

Runs the battery of checks that caught the round-4 silent-NaN bug, so any
kernel/numerics regression on REAL TPU hardware is one command to detect
(CPU/interpret tests cannot see composition-level issues like garbage in
XLA tile padding):

  1. composed backbone forward (Pallas kernels) is finite and agrees with
     the XLA fallback within bf16 accumulation tolerance;
  2. the standalone packed attention kernel matches XLA;
  3. the live fg_logits_live path (key-fold) is finite;
  4. one stage-1 train step on random data yields a finite loss;
  5. host<->device transfer sanity (finite after round-trip);
  6. the flash-attention VJP (round 5): grads through the differentiated
     composed backbone are finite and agree with the XLA-VJP escape hatch —
     the backward kernels see on-device operands with garbage tile padding,
     which no CPU/interpret test can produce;
  7. the native host image pipeline (round 6): the C++ decode/resize/
     normalise library builds+loads on THIS host and its batch output is
     bit-identical to the PIL chain (a host where it silently failed to
     build would fall back to PIL, slower but correct — this check makes
     that visible);
  8. the 756px (2917-token) attention path ON CHIP (round 7): the forward
     q-block law picks a budget-maximal block and the kernel matches XLA
     at that length; the backward VMEM law returns None (flash bwd cannot
     fit) so the VJP takes the XLA fallback — executed, finite, and
     matching the naive-attention gradient.  Previously these decisions
     were validated only by microbench runs referenced in comments
     (ops/attention.py:191-203, 473-497).  TPU-only (skipped elsewhere:
     interpret-mode at 2917 tokens is minutes-slow and exercises no
     hardware law);
  9. the int8 W8A8 serving path (round 7, ops/quant.py): the quantized
     live composition executes on this backend's int8 matmul lowering,
     stays finite, and its logits correlate with the full-precision
     path — the MXU's int8 mode is a different hardware unit
     configuration than anything the bf16 checks exercise;
  10. the fused int8 Pallas kernels AT PRODUCTION BATCH (round 8/round-4
     regression): ``layernorm_qkv_w8a8`` and ``layernorm_fc1_gelu_w8a8``
     execute at bs=32 (the bench's serving batch) — the round-4 fused-fc1
     kernel was interpret-green but Mosaic-illegal at ANY batch > 1
     (BENCH_r04), and check 9's bs=2 composition was recorded before the
     kernel landed, so nothing on chip had ever run it.  Both kernels must
     lower, execute, stay finite, and match the unfused XLA quant
     composition bit-for-bit on the int8 codes / tightly on the scales.

Exit code 0 = all checks pass.  ~3-4 min on a fresh process (compiles);
seconds when the compile cache is warm.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import threading

    # same bounded backend discovery as bench.py: a wedged tunnel (stale
    # remote claim after a mid-compile kill) hangs jax.devices() forever
    ready = threading.Event()

    def watchdog():
        if not ready.wait(600.0):
            print(
                "tpu_selfcheck: backend discovery exceeded 600s — the TPU "
                "tunnel appears wedged; aborting",
                file=sys.stderr,
            )
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("UCOD_FORCE_CPU"):  # smoke runs: the axon plugin
        # ignores JAX_PLATFORMS, force via config before discovery
        jax.config.update("jax_platforms", "cpu")

    jax.devices()
    ready.set()

    from ucod_dpl_tpu.engine.runner import _enable_compilation_cache

    _enable_compilation_cache()  # repeat runs skip the (remote) compile

    from ucod_dpl_tpu.models.dba import fg_logits_live, init_rev_decoder
    from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
    from ucod_dpl_tpu.ops import attention as A

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    print(f"backend={backend} compute_dtype={dtype.__name__}")
    cfg = DinoConfig.dinov2_base()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 518, 518, 3)).astype(np.float32)
    )
    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
        if not ok:
            failures.append(name)

    # 1. composed forward: pallas vs XLA
    if os.environ.get("UCOD_DISABLE_PALLAS"):
        # comparing XLA to XLA would be a vacuous PASS claiming the pallas
        # path matches — refuse rather than mislead
        check(
            "composed forward finite + matches XLA", False,
            "UCOD_DISABLE_PALLAS is set — unset it; this check compares the "
            "pallas path against the XLA fallback",
        )
    else:
        t0 = time.perf_counter()
        a = np.asarray(
            jax.jit(lambda p, x: dino_forward(p, x, cfg, compute_dtype=dtype)["key_features"])(
                backbone, px
            )
        ).astype(np.float32)
        os.environ["UCOD_DISABLE_PALLAS"] = "1"
        try:
            b = np.asarray(
                jax.jit(lambda p, x: dino_forward(p, x, cfg, compute_dtype=dtype)["key_features"])(
                    backbone, px
                )
            ).astype(np.float32)
        finally:
            os.environ.pop("UCOD_DISABLE_PALLAS", None)
        finite = np.isfinite(a).all()
        rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)) if finite else float("inf")
        check(
            "composed forward finite + matches XLA",
            bool(finite) and rel < 0.05,
            f"rel_diff={rel:.4f} ({time.perf_counter()-t0:.0f}s)",
        )

    # 2. standalone packed kernel vs XLA
    rng = np.random.default_rng(1)
    L, nh, hd = 1370, 12, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, L, nh * hd)).astype(np.float32), dtype=dtype)
        for _ in range(3)
    )
    def split(t):
        return t.reshape(2, L, nh, hd).transpose(0, 2, 1, 3).reshape(2 * nh, L, hd)
    out = np.asarray(A.multi_head_attention(q, k, v, nh, scale=0.125)).astype(np.float32)
    ref = np.asarray(A._xla_attention(split(q), split(k), split(v), 0.125)).astype(np.float32)
    ref = ref.reshape(2, nh, L, hd).transpose(0, 2, 1, 3).reshape(2, L, nh * hd)
    d = float(np.max(np.abs(out - ref)))
    check("packed attention kernel vs XLA", np.isfinite(out).all() and d < 0.02, f"maxdiff={d:.4f}")

    # 3. live key-fold path
    fg, _, _ = jax.jit(
        lambda bb, dec, x: fg_logits_live(bb, dec, x, cfg, compute_dtype=dtype, size=68)
    )(backbone, decoder, px)
    fg = np.asarray(fg)
    check("fg_logits_live finite", bool(np.isfinite(fg).all()), f"max|fg|={np.abs(fg).max():.2f}")

    # 4. one train step
    try:
        import optax

        from ucod_dpl_tpu.config import CfgNode
        from ucod_dpl_tpu.engine.train_step import TrainState, make_train_step
        from ucod_dpl_tpu.models.discriminator import init_discriminator

        tcfg = CfgNode(
            {
                "model_cfg": {"feature_size": 68, "ema_weight": 0.99, "dim": 768},
                "train_cfg": {"max_epoch": 25, "start_finetune": -5, "merge_method": "dis"},
            }
        )
        opt = optax.adamw(2e-4)
        dis_p, dis_s = init_discriminator(jax.random.PRNGKey(3))
        state = TrainState(
            decoder=decoder,
            decoder_ema=init_rev_decoder(jax.random.PRNGKey(4), 768),
            dis_params=dis_p,
            dis_stats=dis_s,
            opt_state=opt.init(decoder),
            dis_opt_state=None,
            ema_step=jnp.float32(0),
        )
        step = jax.jit(make_train_step(tcfg, opt))
        feats = jnp.asarray(rng.standard_normal((2, 37, 37, 768)).astype(np.float32))
        pl = jnp.asarray((rng.random((2, 68, 68, 1)) > 0.5).astype(np.float32))
        _, aux = step(state, feats, pl, jnp.float32(0.0), jnp.float32(1.0))
        loss = float(aux["loss"])
        check("train step finite loss", np.isfinite(loss), f"loss={loss:.4f}")
    except Exception as e:  # noqa: BLE001
        check("train step finite loss", False, f"raised: {type(e).__name__}: {e}")

    # 5. transfer round-trip
    y = jax.jit(lambda t: t * 1.000001)(jnp.asarray(rng.standard_normal((16, 37, 37, 768)), dtype=dtype))
    arr = np.asarray(y).astype(np.float32)
    check("D2H round-trip finite", bool(np.isfinite(arr).all()), f"{arr.nbytes/1e6:.0f}MB")

    # 6. flash-attention VJP through the composed backbone (2 layers keep
    # the compile short; the kernels and garbage-tail exposure are the same)
    try:
        import dataclasses

        from ucod_dpl_tpu.ops.attention import differentiable_mode

        gcfg = dataclasses.replace(cfg, num_layers=2)
        gparams = init_dino(jax.random.PRNGKey(5), gcfg)

        def loss(p, x):
            out = dino_forward(p, x, gcfg, compute_dtype=dtype)
            return jnp.sum(out["key_features"].astype(jnp.float32) ** 2)

        with differentiable_mode():
            g_flash = jax.jit(jax.grad(loss))(gparams, px)
        os.environ["UCOD_ATTN_XLA_VJP"] = "1"
        try:
            with differentiable_mode():
                g_xla = jax.jit(jax.grad(loss))(gparams, px)
        finally:
            os.environ.pop("UCOD_ATTN_XLA_VJP", None)
        ff = [np.asarray(t, np.float32) for t in jax.tree.leaves(g_flash)]
        fx = [np.asarray(t, np.float32) for t in jax.tree.leaves(g_xla)]
        finite = all(np.isfinite(t).all() for t in ff)
        # GLOBAL-vector comparison: per-leaf norm-relative diffs explode on
        # near-cancelling reductions (the key-projection BIAS grad is a pure
        # row-sum of dK whose terms cancel to ~1e-3 of their magnitudes —
        # measured 1.33 "relative" diff on a leaf both of whose norms are
        # 4e-2, while k/w from the SAME dK agrees at <1e-2); the global
        # metric weighs leaves by magnitude and stays cancellation-robust.
        a = np.concatenate([t.ravel() for t in ff])
        bb = np.concatenate([t.ravel() for t in fx])
        rel = float(np.linalg.norm(a - bb) / (np.linalg.norm(bb) + 1e-9))
        check(
            "flash-attention VJP finite + matches XLA VJP",
            finite and rel < 0.1,
            f"global grad norm-rel-diff={rel:.4f}",
        )
    except Exception as e:  # noqa: BLE001
        check("flash-attention VJP finite + matches XLA VJP", False,
              f"raised: {type(e).__name__}: {e}")

    # 7. native host image pipeline (host-side; no device involved)
    try:
        import tempfile

        from PIL import Image

        from ucod_dpl_tpu.data import transforms as T
        from ucod_dpl_tpu.utils import native

        if native.get_imagepipe_lib() is None:
            check(
                "native image pipeline builds + bit-exact vs PIL", False,
                "library unavailable on this host (PIL fallback active — "
                "correct but slower; check g++/libjpeg/libpng)",
            )
        else:
            with tempfile.TemporaryDirectory() as td:
                prng = np.random.default_rng(6)
                paths = []
                for i in range(4):
                    p = os.path.join(td, f"{i}.jpg" if i % 2 else f"{i}.png")
                    Image.fromarray(
                        prng.integers(0, 256, (90 + i, 110, 3), dtype=np.uint8)
                    ).save(p)
                    paths.append(p)
                nat = native.load_norm_batch_native(
                    paths, (64, 64), T.IMAGENET_MEAN, T.IMAGENET_STD
                )
                ref = np.stack([T._pil_load_image(p, (64, 64)) for p in paths])
                ok = nat is not None and np.array_equal(nat, ref)
                check(
                    "native image pipeline builds + bit-exact vs PIL", ok,
                    "batch output bit-identical" if ok else "MISMATCH vs PIL chain",
                )
    except Exception as e:  # noqa: BLE001
        check("native image pipeline builds + bit-exact vs PIL", False,
              f"raised: {type(e).__name__}: {e}")

    # 8. 756px attention laws on chip (forward q-block + backward fallback)
    if backend != "tpu":
        print("SKIP  756px attention laws (TPU-only: no hardware VMEM law off-chip)")
    else:
        try:
            L756 = (756 // cfg.patch_size) ** 2 + 1  # 2917 tokens
            lp = ((L756 + 127) // 128) * 128  # 2944 after kernel padding
            blk = A._pick_q_block(lp)
            budget = A._score_budget_bytes()
            fits = lp % blk == 0 and blk % 16 == 0 and lp * blk * 4 <= budget
            larger = [
                lp // n
                for n in range(1, lp // blk)
                if lp % n == 0 and (lp // n) % 16 == 0 and lp // n > blk
            ]
            maximal = all(lp * b2 * 4 > budget for b2 in larger)
            q8, k8, v8 = (
                jnp.asarray(
                    rng.standard_normal((1, L756, nh * hd)).astype(np.float32),
                    dtype=dtype,
                )
                for _ in range(3)
            )
            t0 = time.perf_counter()
            out8 = np.asarray(
                jax.jit(lambda a, b_, c: A.multi_head_attention(a, b_, c, nh, scale=0.125))(
                    q8, k8, v8
                )
            ).astype(np.float32)

            def split8(t):
                return t.reshape(1, L756, nh, hd).transpose(0, 2, 1, 3).reshape(nh, L756, hd)

            ref8 = np.asarray(
                jax.jit(A._xla_attention)(split8(q8), split8(k8), split8(v8), 0.125)
            ).astype(np.float32)
            ref8 = ref8.reshape(1, nh, L756, hd).transpose(0, 2, 1, 3).reshape(1, L756, nh * hd)
            fwd_diff = float(np.max(np.abs(out8 - ref8)))

            # backward: the VMEM law must refuse a WHOLE-KV flash block at
            # this length (both operand widths) — which routes the VJP to
            # the KV-blocked long-L backward (round 11: stats forward +
            # _bwd2d kernels on saved f32 denominators) — and the gradient
            # must execute on chip, stay finite, and match naive attention
            no_wholekv_bwd = (
                A._bwd_block_q(lp, 2) is None and A._bwd_block_q(lp, 4) is None
            )
            from ucod_dpl_tpu.ops.attention import differentiable_mode

            def loss_packed(t):
                o = A.multi_head_attention(t, k8, v8, nh, scale=0.125)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            with differentiable_mode():
                g_packed = np.asarray(
                    jax.jit(jax.grad(loss_packed))(q8), np.float32
                )

            def loss_naive(t):
                th = t.reshape(1, L756, nh, hd).transpose(0, 2, 1, 3)
                kh = k8.reshape(1, L756, nh, hd).transpose(0, 2, 1, 3)
                vh = v8.reshape(1, L756, nh, hd).transpose(0, 2, 1, 3)
                s = jnp.einsum(
                    "bhqd,bhkd->bhqk",
                    th.astype(jnp.float32),
                    kh.astype(jnp.float32),
                ) * 0.125
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("bhqk,bhkd->bhqd", p, vh.astype(jnp.float32))
                return jnp.sum(o**2)

            g_naive = np.asarray(jax.jit(jax.grad(loss_naive))(q8), np.float32)
            grel = float(
                np.linalg.norm(g_packed - g_naive)
                / (np.linalg.norm(g_naive) + 1e-9)
            )
            ok8 = (
                fits
                and maximal
                and np.isfinite(out8).all()
                and fwd_diff < 0.02
                and no_wholekv_bwd
                and np.isfinite(g_packed).all()
                and grel < 0.1
            )
            check(
                "756px attention laws (fwd q-block + long-L flash bwd)",
                bool(ok8),
                f"block={blk}/{lp} budget={budget >> 20}MB fwd_maxdiff="
                f"{fwd_diff:.4f} "
                f"bwd={'longl-flash' if no_wholekv_bwd else 'wholekv?'} "
                f"grad_rel={grel:.4f} ({time.perf_counter()-t0:.0f}s)",
            )
        except Exception as e:  # noqa: BLE001
            check(
                "756px attention laws (fwd q-block + long-L flash bwd)", False,
                f"raised: {type(e).__name__}: {e}",
            )

    # 9. int8 W8A8 serving path: quantized live composition vs check 3's
    # full-precision logits (``fg`` above) — exercises the int8 matmul
    # lowering this backend actually ships
    try:
        from ucod_dpl_tpu.ops.quant import quantize_dino_linears

        qparams = jax.jit(quantize_dino_linears)(backbone)
        fg8, _, _ = jax.jit(
            lambda bb, qp, dec, x: fg_logits_live(
                bb, dec, x, cfg, compute_dtype=dtype, size=68, quant=qp
            )
        )(backbone, qparams, decoder, px)
        fg8 = np.asarray(fg8, np.float32)
        corr = float(np.corrcoef(fg8.ravel(), fg.ravel().astype(np.float32))[0, 1])
        check(
            "int8 W8A8 live path finite + tracks full precision",
            bool(np.isfinite(fg8).all()) and corr > 0.98,
            f"corr={corr:.4f} max|fg8|={np.abs(fg8).max():.2f}",
        )
    except Exception as e:  # noqa: BLE001
        check("int8 W8A8 live path finite + tracks full precision", False,
              f"raised: {type(e).__name__}: {e}")

    # 10. fused int8 kernels at PRODUCTION batch: the round-4 fused-fc1
    # kernel lowered only at bs=1 (Mosaic-illegal (1, bq) scale block);
    # interpret tests could not see it and check 9's bs=2 predates the
    # kernel.  Run both fused kernels at the bench's serving batch and pin
    # them against the unfused XLA quant composition.
    try:
        from ucod_dpl_tpu.ops.fused_layers import (
            dense_quant_w8a8,
            layernorm_fc1_gelu_w8a8,
            layernorm_qkv_w8a8,
        )
        from ucod_dpl_tpu.ops.quant import dense_w8a8, quantize_linear

        bsq, Lq, dq, dfq = 32, 1370, 768, 3072
        xq = jnp.asarray(
            rng.standard_normal((bsq, Lq, dq)).astype(np.float32), dtype=dtype
        )
        norm_p = {
            "scale": jnp.asarray(1.0 + 0.1 * rng.standard_normal(dq), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.standard_normal(dq), jnp.float32),
        }

        def rand_q8(din, dout, seed):
            r = np.random.default_rng(seed)
            return quantize_linear(
                {
                    "w": jnp.asarray(
                        r.standard_normal((din, dout)).astype(np.float32) * 0.05
                    ),
                    "b": jnp.asarray(r.standard_normal(dout).astype(np.float32) * 0.01),
                }
            )

        q8q, q8k, q8v = (rand_q8(dq, dq, s) for s in (10, 11, 12))
        q8f = rand_q8(dq, dfq, 13)

        t0 = time.perf_counter()
        qkv = jax.jit(
            lambda x, n, a, b_, c: layernorm_qkv_w8a8(x, n, a, b_, c, 1e-6)
        )(xq, norm_p, q8q, q8k, q8v)
        g_q, g_s = jax.jit(
            lambda x, n, f: layernorm_fc1_gelu_w8a8(x, n, f, 1e-6)
        )(xq, norm_p, q8f)
        qd = jax.jit(lambda x, p: dense_quant_w8a8(x, p, x.dtype))(xq, q8q)
        qkv = [np.asarray(t, np.float32) for t in qkv]
        g_q = np.asarray(g_q)
        g_s = np.asarray(g_s, np.float32)
        qd = np.asarray(qd, np.float32)

        os.environ["UCOD_DISABLE_PALLAS"] = "1"
        try:
            qkv_ref = jax.jit(
                lambda x, n, a, b_, c: layernorm_qkv_w8a8(x, n, a, b_, c, 1e-6)
            )(xq, norm_p, q8q, q8k, q8v)
            gr_q, gr_s = jax.jit(
                lambda x, n, f: layernorm_fc1_gelu_w8a8(x, n, f, 1e-6)
            )(xq, norm_p, q8f)
            qd_ref = jax.jit(lambda x, p: dense_w8a8(x, p, x.dtype))(xq, q8q)
        finally:
            os.environ.pop("UCOD_DISABLE_PALLAS", None)
        qkv_ref = [np.asarray(t, np.float32) for t in qkv_ref]
        gr_q = np.asarray(gr_q)
        gr_s = np.asarray(gr_s, np.float32)
        qd_ref = np.asarray(qd_ref, np.float32)

        qkv_rel = max(
            float(np.max(np.abs(a - b_)) / (np.max(np.abs(b_)) + 1e-9))
            for a, b_ in zip(qkv, qkv_ref)
        )
        # int8 codes: allow one quantum of rounding skew between pallas-f32
        # and XLA-f32 LN/gelu arithmetic; scales track per-token magnitudes
        code_d = int(np.max(np.abs(g_q.astype(np.int32) - gr_q.astype(np.int32))))
        s_rel = float(np.max(np.abs(g_s - gr_s)) / (np.max(np.abs(gr_s)) + 1e-9))
        # fused quant+dense has NO arithmetic difference from dense_w8a8
        # (same quantize, same dot, same rescale order) — tight bound
        qd_rel = float(np.max(np.abs(qd - qd_ref)) / (np.max(np.abs(qd_ref)) + 1e-9))
        ok10 = (
            all(np.isfinite(a).all() for a in qkv)
            and np.isfinite(g_s).all()
            and np.isfinite(qd).all()
            and qkv_rel < 0.02
            and code_d <= 1
            and s_rel < 0.02
            and qd_rel < 1e-3
        )
        check(
            "fused int8 kernels at bs=32 (lowering + parity)",
            bool(ok10),
            f"qkv_rel={qkv_rel:.4f} code_maxdiff={code_d} scale_rel={s_rel:.4f}"
            f" quantdense_rel={qd_rel:.5f} ({time.perf_counter()-t0:.0f}s)",
        )
    except Exception as e:  # noqa: BLE001
        check("fused int8 kernels at bs=32 (lowering + parity)", False,
              f"raised: {type(e).__name__}: {e}")

    print("SELF-CHECK:", "OK" if not failures else f"FAILED ({failures})")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
