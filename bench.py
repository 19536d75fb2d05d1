"""Benchmark: end-to-end eval throughput (images/sec/chip) at 518px.

Measures the LIVE-INFERENCE composition — DINOv2-base ViT forward (Pallas
flash attention, bf16) with the decoder's decoupling key-folded into the
last key projection (``models/dba.py::fg_logits_live``), decoder body,
mask upsample + threshold. This is exactly what serving and the LookTwice
crop pass execute per image. Composition note for cross-round comparison:
rounds 1-3 timed the unfolded variant (full 768-dim key map -> separate
decoupling), which is what the one-time feature-CACHE build still runs —
the round-4 key-fold is worth ~1% of the 491 -> 516 gain (the rest, the
shift-invariant softmax kernel, applies to both compositions; see
scripts/microbench/README.md).

Prints ONE JSON line.  Core keys (the driver contract):
  {"metric", "value", "unit", "vs_baseline"}
Self-certifying extras:
  device_kind / peak_bf16_tflops — the chip the number was measured on;
  flops_per_img / mfu — analytic backbone FLOPs for the measured
    composition and achieved fraction of the chip's bf16 peak (the honest
    absolute; ``vs_baseline`` keeps the caveated assumed-A100 ratio);
  metrics — the non-headline hot paths (SURVEY §3.5), skippable with
    UCOD_BENCH_FAST=1: the one-time 756px feature-cache build (img/s),
    the stage-1 train step (ms/step), the LoRA joint train step
    (ms/step), and the opt-in int8 W8A8 serving eval (img/s).

Wedge resilience: the measurement runs in a CHILD process.  Backend
discovery over the axon tunnel can hang indefinitely on a stale remote
claim (observed after a client was killed mid-remote-compile) — the child
bounds discovery with a watchdog and exits 3; the parent kills, backs off,
and re-execs a fresh child (fresh process = fresh backend init) up to 3
attempts before giving up loudly.  Remediation for a persistent wedge:
stale claims self-heal minutes after the holder dies — wait, do not
re-kill mid-compile (see MIGRATION.md "axon tunnel").
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_PYTORCH_BASELINE_IMGS_PER_SEC = 100.0

# bf16 peak per jax device (one v2/v3 device is a CORE; v4+ a megacore chip)
_PEAK_BF16_TFLOPS = (
    ("v6", 918.0),  # Trillium / v6e chip
    ("v5p", 459.0),
    ("v5 lite", 197.0),  # v5e chip ("TPU v5 lite")
    ("v5e", 197.0),
    ("v5", 459.0),  # plain "TPU v5" reports the p variant
    ("v4", 275.0),
    ("v3", 61.4),  # per-core: v2/v3 expose each core as a device
    ("v2", 23.0),
)

# int8 peak (TOPS) per device — 2x bf16 on v5e/v5p/v6e; v4 executes int8
# at the bf16 rate; v2/v3 have no int8 MXU mode (omitted -> None)
_PEAK_INT8_TOPS = (
    ("v6", 1836.0),
    ("v5p", 918.0),
    ("v5 lite", 394.0),
    ("v5e", 394.0),
    ("v5", 918.0),
    ("v4", 275.0),
)

DISCOVERY_WATCHDOG_S = 300.0
ATTEMPTS = 3
# post-discovery budget: remote compiles are 70-100s each and the extras add
# ~3 programs; killing a client MID-REMOTE-COMPILE is exactly what creates a
# stale remote claim (the wedge this retry loop exists to survive), so the
# parent is generous once discovery has succeeded and only ever quick-kills
# a child that is still stuck in discovery (which self-heals in ~30s).
POST_DISCOVERY_BUDGET_S = 3000.0
DISCOVERY_GRACE_S = 330.0  # child watchdog (300s) + margin; child self-exits
BACKOFFS_S = (60.0, 120.0)


def _last_verified_on_chip(artifact_dir: str | None = None):
    """Provenance for the wedge-failure record: the newest driver-recorded
    SUCCESSFUL bench artifact (``BENCH_r*.json`` written next to this file
    by the round driver, highest round with rc==0 and a parsed value).
    Falls back to the round-2 constant when none parses (e.g. a fresh
    checkout without artifacts)."""
    import glob

    best = {
        "artifact": "BENCH_r02.json",
        "value": 515.39,
        "unit": "img/s",
        "vs_baseline": 5.154,
    }
    best_n = -1
    if artifact_dir is None:
        artifact_dir = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(artifact_dir, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = d.get("parsed") if isinstance(d, dict) else None
        if (
            isinstance(d, dict)
            and d.get("rc") == 0
            and isinstance(parsed, dict)
            and isinstance(parsed.get("value"), (int, float))
        ):
            n = d.get("n", 0)
            if isinstance(n, (int, float)) and n > best_n:
                best_n = n
                best = {
                    "artifact": os.path.basename(p),
                    "value": parsed["value"],
                    "unit": parsed.get("unit", "img/s"),
                    "vs_baseline": parsed.get("vs_baseline"),
                }
    return best


def _emit_wedge_failure_json(error: str) -> None:
    """ONE machine-readable line for the round artifact when the tunnel is
    wedged: value=null is unambiguous (an environment failure, NOT a
    measurement — the exit code stays nonzero), and the last verified
    measurement carries the provenance a reader needs."""
    print(
        json.dumps(
            {
                "metric": "images/sec/chip at 518px eval (dinov2-base + DBA decoder)",
                "value": None,
                "unit": "img/s",
                "vs_baseline": None,
                "error": error,
                "last_verified_on_chip": _last_verified_on_chip(),
            }
        )
    )


def _peak_bf16_tflops(device_kind: str):
    kind = device_kind.lower()
    for key, peak in _PEAK_BF16_TFLOPS:
        if key in kind:
            return peak
    return None


def _peak_int8_tops(device_kind: str):
    kind = device_kind.lower()
    for key, peak in _PEAK_INT8_TOPS:
        if key in kind:
            return peak
    return None


def _analytic_backbone_flops_per_img(
    cfg, img: int, key_fold_dim: int | None = None
) -> float:
    """Analytic bf16 FLOPs (mul+add = 2) of one ViT forward at ``img`` px:
    per layer 24*N*D^2 (qkv/proj/mlp matmuls) + 4*N^2*D (scores + p@v),
    plus the patch embed.

    ``key_fold_dim``: the measured live-eval composition key-folds the
    LAST layer down to ``LN1(x) @ (D, F)`` (models/dino.py::dino_forward)
    — its q/v projections, attention, MLP and final norm are never
    executed, so counting a full layer would INFLATE the derived MFU by
    ~8%.  Decoder/upsample FLOPs are excluded (<1%), keeping the estimate
    a slight UNDERcount — honest in the right direction."""
    n = (img // cfg.patch_size) ** 2 + 1
    d = cfg.hidden_size
    per_layer = 24 * n * d * d + 4 * n * n * d
    patch_embed = 2 * n * (cfg.patch_size**2 * 3) * d
    total = float(cfg.num_layers * per_layer + patch_embed)
    if key_fold_dim is not None:
        total = total - per_layer + 2.0 * n * d * key_fold_dim
    return total


def _analytic_lora_joint_flops_per_img(cfg, img: int) -> float:
    """Model FLOPs (not executed flops) of one LoRA joint train step, per
    image: the full unfolded backbone forward, plus the backward actually
    REQUIRED by the adaptation — dx through every linear (same matmul cost
    as forward; base weights are FROZEN so no dW for them) and the full
    attention backward (dq/dk/dv = 2x the forward's two score/PV matmuls).
    Adapter dW (rank 2) and the decoder/EMA/optimizer are <1% and excluded —
    an honest UNDERcount, like the headline's excluded decoder.  Remat and
    flash-backward softmax recompute are deliberately NOT counted: MFU is
    model-work per second, recompute is the price paid for memory (the
    executed-flops figure from XLA cost analysis is reported alongside)."""
    n = (img // cfg.patch_size) ** 2 + 1
    d = cfg.hidden_size
    lin = 24 * n * d * d  # qkv + proj + fc1 + fc2 forward matmuls
    attn = 4 * n * n * d  # scores + PV
    patch_embed = 2 * n * (cfg.patch_size**2 * 3) * d
    fwd = cfg.num_layers * (lin + attn) + patch_embed
    bwd = cfg.num_layers * (lin + 2 * attn)  # dx everywhere + attention bwd
    return float(fwd + bwd)


def _min_marginal_rate(run_one, run_many, repeats: int = 3):
    """Marginal per-iteration cost from the MINIMA of 1-iteration and
    (n+1)-iteration timings taken separately — tunneled chips show large
    run-to-run noise (host RTT spikes, shared terminal contention), and a
    paired (many - one) with a noisy `one` would INFLATE the rate."""
    best_one = float("inf")
    best_many = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_one()
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_many()
        best_many = min(best_many, time.perf_counter() - t0)
    dt = best_many - best_one
    return dt, best_one, best_many


def measure():
    import threading

    ready = threading.Event()

    def watchdog():
        if not ready.wait(DISCOVERY_WATCHDOG_S):
            print(
                f"bench.py[child]: backend discovery exceeded "
                f"{DISCOVERY_WATCHDOG_S:.0f}s — the TPU tunnel appears wedged "
                "(stale remote claim?); exiting for a parent retry",
                file=sys.stderr,
            )
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("UCOD_FORCE_CPU"):  # smoke tests: the axon plugin
        # ignores JAX_PLATFORMS, force via config before discovery
        jax.config.update("jax_platforms", "cpu")

    jax.devices()
    ready.set()
    sentinel = os.environ.get("UCOD_BENCH_DISCOVERY_SENTINEL")
    if sentinel:  # tell the parent discovery succeeded: from here on a
        # kill would land mid-remote-compile and could wedge the tunnel
        with open(sentinel, "w") as f:
            f.write("ok")

    from ucod_dpl_tpu.engine.runner import _enable_compilation_cache

    _enable_compilation_cache()  # repeat runs skip the (remote) compile

    from ucod_dpl_tpu.models.dba import fg_logits_live, init_rev_decoder
    from ucod_dpl_tpu.models.dino import DinoConfig, init_dino
    from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc

    cfg = DinoConfig.dinov2_base()
    tiny_extras = bool(os.environ.get("UCOD_BENCH_TINY_EXTRAS"))
    if tiny_extras:
        # test hook: shrink the backbone so the whole pipeline (primary +
        # extras) executes on CPU in seconds — a wiring error in the extras
        # must be caught BEFORE the one on-chip driver run the round's perf
        # artifact depends on.  The printed numbers are meaningless.
        import dataclasses

        cfg = dataclasses.replace(cfg, num_layers=2)
    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    device_kind = jax.devices()[0].device_kind

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)

    # bs32 measured fastest per-image (scripts/microbench/bench_batch_sweep2.py,
    # post-key-fold: 24 -> 493, 32 -> 497, 40 -> 495, 48 -> 491 img/s)
    batch = 32 if on_tpu else 2
    img = 518

    def eval_body(backbone_params, decoder_params, pixels):
        # the exact live-inference composition serving/eval run: key-fold
        # fast path (decoupling folded into the last key projection — see
        # models/dba.py::fg_logits_live), decoder body at 68, mask upsample
        fg, _, _ = fg_logits_live(
            backbone_params, decoder_params, pixels, cfg,
            compute_dtype=compute_dtype, size=68,
        )
        up = interpolate_bilinear_nhwc(fg, (img, img))[..., 0]
        masks = jax.nn.sigmoid(up) > 0.5
        return jnp.sum(masks.astype(jnp.int32))

    iters = 8 if on_tpu else 2

    @jax.jit
    def eval_many(backbone_params, decoder_params, pixels, n):
        # the iteration loop lives inside jit with a single scalar readback:
        # device-to-host latency over the axon tunnel (~30ms RTT) must not be
        # billed to the compute; the input is perturbed per iteration so no
        # step can be CSE'd away.
        def body(i, acc):
            return acc + eval_body(
                backbone_params, decoder_params,
                pixels + (acc % 3).astype(pixels.dtype) * 1e-6,
            )

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((batch, img, img, 3)).astype(np.float32))

    # warmup / compile (scalar readback = real synchronisation), plus an
    # on-hardware numerics guard: the composed program must produce FINITE
    # logits.  A silent NaN forward times identically to a correct one —
    # this caught a real bug (garbage in XLA tile padding beyond seq_len
    # turning the kernel's additive boundary mask into NaN, round 4) that
    # no CPU/interpret-mode test can see.
    def logits_small(backbone_params, decoder_params, px2):
        fg, _, _ = fg_logits_live(
            backbone_params, decoder_params, px2, cfg,
            compute_dtype=compute_dtype, size=68,
        )
        return jnp.sum(jnp.isfinite(fg)), fg.size

    finite, total = jax.jit(logits_small)(backbone, decoder, pixels[:2])
    assert int(finite) == int(total), (
        f"NON-FINITE decoder logits on {jax.default_backend()}: "
        f"{int(total) - int(finite)}/{int(total)} bad — refusing to bench a broken forward"
    )

    int(eval_many(backbone, decoder, pixels, 1))

    best_dt, best_one, best_many = _min_marginal_rate(
        lambda: int(eval_many(backbone, decoder, pixels, 1)),
        lambda: int(eval_many(backbone, decoder, pixels, iters + 1)),
    )
    # sanity: timing noise can invert many/one on a badly contended host —
    # an absurd implied rate must FAIL loudly, not print a nonsense JSON
    # line a driver would record as a measurement
    if best_dt <= 0 or batch * iters / best_dt > 50_000:
        raise RuntimeError(
            f"timing inverted/absurd (one={best_one:.4f}s many={best_many:.4f}s): "
            "host too contended to measure — re-run on a quiet host"
        )

    imgs_per_sec = batch * iters / best_dt
    # fg_logits_live folds the decoder's 768->128 decoupling into the last
    # key projection (2*EMBED_DIM = 128 output lanes)
    flops_per_img = _analytic_backbone_flops_per_img(cfg, img, key_fold_dim=128)
    peak = _peak_bf16_tflops(device_kind) if on_tpu else None
    mfu = (imgs_per_sec * flops_per_img / (peak * 1e12)) if peak else None

    extras, omitted = [], []
    if tiny_extras:
        extras, omitted = _measure_extras(
            jax, jnp, np, cfg, backbone, compute_dtype, tiny=True,
            headline_imgs_per_sec=imgs_per_sec,
        )
    elif on_tpu and not os.environ.get("UCOD_BENCH_FAST"):
        extras, omitted = _measure_extras(
            jax, jnp, np, cfg, backbone, compute_dtype,
            headline_imgs_per_sec=imgs_per_sec,
        )

    out = {
        "metric": "images/sec/chip at 518px eval (dinov2-base + DBA decoder)",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / A100_PYTORCH_BASELINE_IMGS_PER_SEC, 3),
        "device_kind": device_kind,
        "backend": jax.default_backend(),
        "flops_per_img": flops_per_img,
        "peak_bf16_tflops": peak,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "metrics": extras,
        # machine-visible omission record (ADVICE r4: a failing extra must
        # not vanish into stderr — the JSON artifact itself says what's
        # missing and why, so a reader never mistakes absence for coverage)
        "omitted_extras": omitted,
    }
    if tiny_extras:
        # the metric labels describe the PRODUCTION shapes; a tiny smoke run
        # measured none of them and must be self-identifying — a driver or
        # human must never record this line as the round's perf artifact
        out["tiny_smoke"] = True
        out["metric"] = "[TINY SMOKE — not a measurement] " + out["metric"]
        for m in extras:
            m["metric"] = "[TINY SMOKE] " + m["metric"]
    print(json.dumps(out))


def _xla_flops_per_call(jitted, *args):
    """Executed-FLOPs estimate for one call of a jitted function, from XLA's
    own cost analysis (includes remat recompute and Pallas cost_estimates —
    i.e. HARDWARE flops, not model flops).  None when the backend doesn't
    implement cost_analysis (e.g. some remote plugins)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older JAX returned [dict]
            cost = cost[0] if cost else {}
        f = cost.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:  # noqa: BLE001 — purely informational
        return None


def _measure_extras(
    jax, jnp, np, cfg, backbone, compute_dtype, tiny=False,
    headline_imgs_per_sec=None,
):
    """The non-headline hot paths (VERDICT r3 #4 / SURVEY §3.5):

    * 756px feature-cache build — the throughput-dominant ONE-TIME stage
      (stage-2 LR dataset, ``data/dataset.py:350-352``): full unfolded
      forward materialising the (54, 54, 768) key-feature map;
    * stage-1 train step (cached features, shipped config shapes:
      bs16, 37x37 features -> 68 grid, ``loop_UCOD_DPL.py:148-184``);
    * LoRA joint train step (the heaviest training composition);
    * int8 W8A8 serving eval (the opt-in quantized path, ops/quant.py).

    Returns ``(extras, omitted)`` — the omission record is part of the JSON
    artifact, never stderr-only.
    """
    from ucod_dpl_tpu.engine.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from ucod_dpl_tpu.models import init_discriminator
    from ucod_dpl_tpu.models.dba import init_rev_decoder
    from ucod_dpl_tpu.models.dino import dino_forward

    extras = []
    omitted = []
    rng = np.random.default_rng(1)

    def omit(label, one, many):
        # absurd-rate contract (same as the primary metric): a
        # noise-inverted timing must NOT land in the self-certifying JSON;
        # an extra is non-essential, so record the omission — with the full
        # metric label, so a test (or a reader) can tell WHICH extra is
        # missing and why — instead of aborting the whole bench
        reason = (
            f"timing inverted/absurd (one={one:.4f}s many={many:.4f}s); "
            "host too contended"
        )
        omitted.append({"metric": label, "reason": reason})
        print(f"bench.py: extra omitted [{label}] — {reason}", file=sys.stderr)

    # error types a retry/fresh-host cannot fix: a programming error in an
    # extra must FAIL the bench loudly, not degrade to an omission note
    # (ADVICE r4: a NameError after a refactor silently cost the artifact
    # its metric)
    _NON_TRANSIENT = (NameError, AttributeError, ImportError, SyntaxError, TypeError)

    def guarded(label, section):
        # extras are fault-ISOLATED: each runs its own (long) remote
        # compiles, and a transient tunnel fault there previously raised out
        # of the whole bench and lost the already-measured headline number
        # (observed: "remote_compile: response body closed" during the LoRA
        # backward compile).  A failing extra is omitted with its cause in
        # the JSON omission record — same contract as the absurd-timing
        # omission — and the remaining extras still get their attempt.
        try:
            section()
        except _NON_TRANSIENT:
            raise
        except Exception as e:  # noqa: BLE001 — transient extra failures are non-fatal
            reason = f"{type(e).__name__}: {e}"
            omitted.append({"metric": label, "reason": reason})
            print(f"bench.py: extra omitted [{label}] — {reason}", file=sys.stderr)

    # ---- 756px cache build ------------------------------------------------
    cb_batch, cb_img = (2, 126) if tiny else (8, 756)

    def _cache_build_extra():
        @jax.jit
        def cache_many(params, pixels, n):
            def body(i, acc):
                out = dino_forward(
                    params,
                    pixels + (acc % 3).astype(pixels.dtype) * 1e-6,
                    cfg,
                    compute_dtype=compute_dtype,
                )
                return acc + jnp.sum(
                    out["key_features"].astype(jnp.float32) ** 2
                ).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        cb_pixels = jnp.asarray(
            rng.standard_normal((cb_batch, cb_img, cb_img, 3)).astype(np.float32)
        )
        cb_iters = 4
        float(cache_many(backbone, cb_pixels, 1))  # compile + warm
        dt, one, many = _min_marginal_rate(
            lambda: float(cache_many(backbone, cb_pixels, 1)),
            lambda: float(cache_many(backbone, cb_pixels, cb_iters + 1)),
        )
        if dt > 0 and cb_batch * cb_iters / dt < 50_000:
            entry = {
                "metric": "756px feature-cache build (dinov2-base, unfolded)",
                "value": round(cb_batch * cb_iters / dt, 2),
                "unit": "img/s",
            }
            # self-certify like the headline: analytic FLOPs of the UNFOLDED
            # forward at the cache-build resolution vs the chip's bf16 peak
            cb_peak = _peak_bf16_tflops(jax.devices()[0].device_kind)
            if cb_peak and jax.default_backend() == "tpu":
                cb_flops = _analytic_backbone_flops_per_img(cfg, cb_img)
                entry["mfu"] = round(entry["value"] * cb_flops / (cb_peak * 1e12), 4)
            extras.append(entry)
        else:
            omit("756px feature-cache build", one, many)

    guarded("756px feature-cache build", _cache_build_extra)

    # ---- stage-1 train step ------------------------------------------------
    from ucod_dpl_tpu.config import CfgNode

    def _make_state():
        optimizer = make_optimizer(2e-4, 0.95, 25)
        dis_optimizer = make_optimizer(1e-3, 0.95, 25)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        dec = init_rev_decoder(k1, cfg.hidden_size)
        ema = init_rev_decoder(k2, cfg.hidden_size)
        dis_p, dis_s = init_discriminator(k3, feature_size=68, use_features=False)
        return optimizer, TrainState(
            decoder=dec,
            decoder_ema=ema,
            opt_state=optimizer.init(dec),
            dis_params=dis_p,
            dis_stats=dis_s,
            dis_opt_state=dis_optimizer.init(dis_p),
            ema_step=jnp.zeros((), jnp.int32),
        )

    def _train_step_extra():
        tcfg = CfgNode(
            {
                "model_cfg": {
                    "dim": cfg.hidden_size, "feature_size": 68,
                    "ema_weight": 0.99, "dis_use_features": False,
                },
                "train_cfg": {
                    "max_epoch": 25, "start_finetune": -5, "merge_method": "dis",
                    "lr0": 2e-4, "dis_lr0": 1e-3,
                    "step_lr_gamma": 0.95, "step_lr_size": 25,
                },
                "log_cfg": {"log_interval": 50},
            }
        )
        optimizer, state = _make_state()
        step = jax.jit(make_train_step(tcfg, optimizer))
        tr_batch = 2 if tiny else 16
        feats = jnp.asarray(
            rng.standard_normal((tr_batch, 37, 37, cfg.hidden_size)).astype(np.float32)
        )
        plabels = jnp.asarray(
            (rng.random((tr_batch, 37, 37, 1)) > 0.5).astype(np.float32)
        )
        epoch = jnp.float32(1.0)
        adv = jnp.float32(1.0)

        def run_steps(n):
            s = state
            aux = None
            for _ in range(n):
                s, aux = step(s, feats, plabels, epoch, adv)
            float(aux["loss"])  # sync

        run_steps(1)  # compile + warm
        tr_iters = 8
        dt, one, many = _min_marginal_rate(
            lambda: run_steps(1), lambda: run_steps(tr_iters + 1)
        )
        # a bs16 stage-1 step is milliseconds of real work; sub-0.1ms implies
        # the marginal subtraction was eaten by host noise
        if dt > 0 and dt / tr_iters > 1e-4:
            entry = {
                "metric": "stage-1 train step (bs16 cached features, shipped config)",
                "value": round(dt / tr_iters * 1e3, 2),
                "unit": "ms/step",
            }
            # executed-FLOPs utilization from XLA's own cost analysis (the
            # step is decoder+discriminator-only — no analytic model exists
            # for it like the backbone's; VERDICT r4 #4).  This step's
            # matmuls are tiny (37x37 grids), so a low figure here is
            # bandwidth/latency floor, not kernel waste — recorded to make
            # that floor visible, not to claim MXU saturation.
            hw_flops = _xla_flops_per_call(step, state, feats, plabels, epoch, adv)
            st_peak = _peak_bf16_tflops(jax.devices()[0].device_kind)
            if hw_flops and st_peak and jax.default_backend() == "tpu":
                entry["flops_per_step_executed"] = hw_flops
                entry["mfu"] = round(
                    hw_flops / (dt / tr_iters) / (st_peak * 1e12), 4
                )
            extras.append(entry)
        else:
            omit("stage-1 train step", one, many)

    guarded("stage-1 train step", _train_step_extra)

    # ---- LoRA joint train step (live backbone, flash VJP + remat) ---------
    # the heaviest training composition the framework ships: pixels ->
    # LoRA-adapted ViT-B -> decoder loss, grads to adapters AND decoder
    # (model_cfg.lora.enable).  Its backward is a separate (long) remote
    # compile — skippable with UCOD_BENCH_FAST=1 like the other extras.
    def _lora_extra():
        from ucod_dpl_tpu.engine.train_step import make_lora_train_step
        from ucod_dpl_tpu.models.lora import init_lora

        ltcfg = CfgNode(
            {
                "model_cfg": {
                    "dim": cfg.hidden_size, "feature_size": 68,
                    "ema_weight": 0.99, "dis_use_features": False,
                    # remat "none": fastest at bs16@518 on a 16GB chip
                    # (measured A/B in scripts/microbench/bench_lora_remat.py:
                    # layer 123.7 / dots 121.2 / none 109.7 ms) — matches the
                    # shipped config default
                    "lora": {"rank": 2, "alpha": 4.0, "remat": "none"},
                },
                "train_cfg": {
                    "max_epoch": 25, "start_finetune": -5, "merge_method": "dis",
                    "lr0": 2e-4, "dis_lr0": 1e-3,
                    "step_lr_gamma": 0.95, "step_lr_size": 25,
                },
                "log_cfg": {"log_interval": 50},
            }
        )
        optimizer, lstate = _make_state()
        lora_opt = make_optimizer(1e-4, 0.95, 25)
        lora_params = init_lora(jax.random.PRNGKey(9), backbone, rank=2)
        lora_opt_state = lora_opt.init(lora_params)
        lstep = jax.jit(
            make_lora_train_step(ltcfg, optimizer, lora_opt, cfg, compute_dtype)
        )
        lr_batch, lr_img = (2, 126) if tiny else (16, 518)
        lpixels = jnp.asarray(
            rng.standard_normal((lr_batch, lr_img, lr_img, 3)).astype(np.float32)
        )
        lplabels = jnp.asarray(
            (rng.random((lr_batch, 37, 37, 1)) > 0.5).astype(np.float32)
        )

        def run_lora_steps(n):
            s, lp, lo = lstate, lora_params, lora_opt_state
            aux = None
            for _ in range(n):
                s, lp, lo, aux = lstep(
                    s, lp, lo, backbone, lpixels, lplabels,
                    jnp.float32(1.0), jnp.float32(1.0),
                )
            float(aux["loss"])  # sync

        run_lora_steps(1)  # compile + warm (the big backward compile)
        lr_iters = 4
        dt, one, many = _min_marginal_rate(
            lambda: run_lora_steps(1), lambda: run_lora_steps(lr_iters + 1)
        )
        if dt > 0 and dt / lr_iters > 1e-3:  # a live-backbone bwd is >> 1ms
            entry = {
                "metric": "LoRA joint train step (bs16 live 518px backbone)",
                "value": round(dt / lr_iters * 1e3, 2),
                "unit": "ms/step",
            }
            lr_peak = _peak_bf16_tflops(jax.devices()[0].device_kind)
            if lr_peak and jax.default_backend() == "tpu":
                step_s = dt / lr_iters
                model_flops = lr_batch * _analytic_lora_joint_flops_per_img(
                    cfg, lr_img
                )
                entry["flops_per_step_model"] = model_flops
                entry["mfu"] = round(model_flops / step_s / (lr_peak * 1e12), 4)
                # executed flops (incl. remat + flash softmax recompute):
                # the gap between this utilization and mfu is the memory-
                # for-FLOPs trade, not kernel waste
                hw = _xla_flops_per_call(
                    lstep, lstate, lora_params, lora_opt_state, backbone,
                    lpixels, lplabels, jnp.float32(1.0), jnp.float32(1.0),
                )
                if hw:
                    entry["flops_per_step_executed"] = hw
                    entry["hw_util"] = round(hw / step_s / (lr_peak * 1e12), 4)
            extras.append(entry)
        else:
            omit("LoRA joint train step", one, many)

    guarded("LoRA joint train step", _lora_extra)

    # ---- int8 W8A8 serving eval --------------------------------------------
    # the opt-in quantized serving path (ops/quant.py): the SAME 518px live
    # composition as the primary metric, with every transformer linear in
    # the MXU's 2x int8 mode (v5e: 394 TOPS vs 197 bf16 TFLOPS).  Reported
    # as an extra — the headline stays the bf16 parity composition.
    def _int8_extra():
        from ucod_dpl_tpu.models.dba import fg_logits_live
        from ucod_dpl_tpu.ops.quant import quantize_dino_linears
        from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc

        q_batch, q_img = (2, 126) if tiny else (32, 518)
        qparams = jax.jit(quantize_dino_linears)(backbone)
        q_decoder = init_rev_decoder(jax.random.PRNGKey(11), cfg.hidden_size)

        @jax.jit
        def int8_many(params, qp, dec_params, pixels, n):
            def body(i, acc):
                fg, _, _ = fg_logits_live(
                    params, dec_params,
                    pixels + (acc % 3).astype(pixels.dtype) * 1e-6,
                    cfg, compute_dtype=compute_dtype, size=68, quant=qp,
                )
                up = interpolate_bilinear_nhwc(fg, (q_img, q_img))[..., 0]
                return acc + jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        q_pixels = jnp.asarray(
            rng.standard_normal((q_batch, q_img, q_img, 3)).astype(np.float32)
        )
        q_iters = 8
        int(int8_many(backbone, qparams, q_decoder, q_pixels, 1))  # compile + warm
        dt, one, many = _min_marginal_rate(
            lambda: int(int8_many(backbone, qparams, q_decoder, q_pixels, 1)),
            lambda: int(
                int8_many(backbone, qparams, q_decoder, q_pixels, q_iters + 1)
            ),
        )
        if dt > 0 and q_batch * q_iters / dt < 50_000:
            entry = {
                "metric": "518px eval, int8 W8A8 backbone (opt-in serving path)",
                "value": round(q_batch * q_iters / dt, 2),
                "unit": "img/s",
            }
            # utilization vs the chip's INT8 peak.  Slight undercount by
            # construction: the attention (~23% of FLOPs) stays bf16, so its
            # ops are charged at half their true cost share — honest in the
            # right direction, like the headline's excluded decoder FLOPs.
            int8_peak = _peak_int8_tops(jax.devices()[0].device_kind)
            if int8_peak and jax.default_backend() == "tpu":
                q_flops = _analytic_backbone_flops_per_img(
                    cfg, q_img, key_fold_dim=128
                )
                entry["mfu_vs_int8_peak"] = round(
                    entry["value"] * q_flops / (int8_peak * 1e12), 4
                )
                entry["peak_int8_tops"] = int8_peak
            if headline_imgs_per_sec:
                # composed A/B against THIS run's bf16 headline (same chip,
                # same run — the end-to-end win the opt-in buys; the path
                # bounds at ~1.6x, see ops/quant.py:4-8)
                entry["composed_vs_bf16_headline"] = round(
                    entry["value"] / headline_imgs_per_sec, 3
                )
            extras.append(entry)
        else:
            omit("int8 W8A8 backbone", one, many)

    guarded("int8 W8A8 backbone", _int8_extra)

    # ---- int8 raw-chain A/B (quant-overhead share) -------------------------
    # where the 2x MXU datasheet ratio actually goes: a ViT-MLP-shaped
    # matmul chain timed bf16 vs int8 (dynamic per-token quant included).
    # ideal int8 time = bf16/2; the shortfall is the VPU quantization
    # overhead — reported as a share so the composed ratio above can be
    # read against its bound (VERDICT r4 #5).
    def _int8_chain_extra():
        from ucod_dpl_tpu.ops.quant import dense_w8a8, quantize_linear

        n_tok = (16 * 1370) if not tiny else 512
        x0 = jnp.asarray(
            rng.standard_normal((n_tok, 768)).astype(np.float32),
            dtype=compute_dtype,
        )
        w1 = {"w": jnp.asarray(
            rng.standard_normal((768, 3072)).astype(np.float32) * 0.02),
            "b": jnp.zeros((3072,), jnp.float32)}
        w2 = {"w": jnp.asarray(
            rng.standard_normal((3072, 768)).astype(np.float32) * 0.02),
            "b": jnp.zeros((768,), jnp.float32)}
        q1, q2 = quantize_linear(w1), quantize_linear(w2)

        @jax.jit
        def chain_bf16(x, n):
            def body(i, acc):
                h = jnp.dot(
                    (x + acc * 1e-9).astype(compute_dtype),
                    w1["w"].astype(compute_dtype),
                )
                h = jnp.dot(h, w2["w"].astype(compute_dtype))
                return acc + jnp.sum(h.astype(jnp.float32) ** 2) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        @jax.jit
        def chain_int8(x, n):
            def body(i, acc):
                h = dense_w8a8((x + acc * 1e-9).astype(compute_dtype), q1,
                               compute_dtype)
                h = dense_w8a8(h, q2, compute_dtype)
                return acc + jnp.sum(h.astype(jnp.float32) ** 2) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        ch_iters = 16 if not tiny else 2
        times = {}
        for name, fn in (("bf16", chain_bf16), ("int8", chain_int8)):
            float(fn(x0, 1))  # compile + warm
            cdt, cone, cmany = _min_marginal_rate(
                lambda fn=fn: float(fn(x0, 1)),
                lambda fn=fn: float(fn(x0, ch_iters + 1)),
            )
            if cdt <= 0:
                omit("int8 raw matmul chain", cone, cmany)
                return
            times[name] = cdt / ch_iters
        ratio = times["bf16"] / times["int8"]
        # ideal int8 = bf16/2 on a 2x-rate MXU; shortfall = dynamic-quant
        # VPU work (per-token max-abs/scale/round/cast) the MXU can't hide
        overhead = 1.0 - (times["bf16"] / 2.0) / times["int8"]
        extras.append({
            "metric": "int8 raw matmul chain vs bf16 (ViT MLP shapes)",
            "value": round(ratio, 3),
            "unit": "x speedup",
            "quant_overhead_share": round(overhead, 3),
            "bf16_ms": round(times["bf16"] * 1e3, 3),
            "int8_ms": round(times["int8"] * 1e3, 3),
        })

    if jax.default_backend() == "tpu" or tiny:
        guarded("int8 raw matmul chain", _int8_chain_extra)

    return extras, omitted


def main():
    if "--_measure" in sys.argv or os.environ.get("UCOD_BENCH_NO_RETRY"):
        measure()
        return

    import tempfile

    last_rc = 1
    # parent-owned tempdir: the sentinel path cannot pre-exist or be
    # planted by another process (tempfile.mktemp is race-prone)
    sentinel_dir = tempfile.mkdtemp(prefix="ucod_bench_")
    for attempt in range(ATTEMPTS):
        sentinel = os.path.join(sentinel_dir, f"discovered_{attempt}")
        env = dict(os.environ, UCOD_BENCH_DISCOVERY_SENTINEL=sentinel)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--_measure"],
            stdout=subprocess.PIPE,
            text=True,
            env=env,
        )
        # phase 1: discovery.  The child self-exits(3) at 300s; give it
        # +30s of margin, then treat a still-running discovery-phase child
        # as hung and kill it (a discovery-phase kill self-heals in ~30s —
        # unlike a mid-compile kill, which creates the stale-claim wedge).
        deadline = time.monotonic() + DISCOVERY_GRACE_S
        while proc.poll() is None and not os.path.exists(sentinel):
            if time.monotonic() > deadline:
                break
            time.sleep(2.0)
        discovered = os.path.exists(sentinel)
        try:
            # phase 2: measurement.  Post-discovery kills can wedge the
            # tunnel, so the budget is generous; a child still stuck IN
            # discovery past the grace is killed quickly.
            budget = POST_DISCOVERY_BUDGET_S if discovered else 5.0
            out, _ = proc.communicate(timeout=budget)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            # re-check: discovery may have completed between the snapshot
            # and the kill — then the kill landed mid-compile and retrying
            # would meet our own fresh stale claim
            discovered = discovered or os.path.exists(sentinel)
            phase = "measurement" if discovered else "discovery"
            print(
                f"bench.py: attempt {attempt + 1}/{ATTEMPTS} killed in "
                f"{phase} phase (wedged tunnel?)",
                file=sys.stderr,
            )
            last_rc = 3
            if discovered:
                # the kill may have landed mid-compile — retrying now
                # would meet our own fresh stale claim; report and stop
                print(
                    "bench.py: a post-discovery kill can itself wedge the "
                    "tunnel; not retrying. Wait for the claim to expire "
                    "and re-run.",
                    file=sys.stderr,
                )
                _emit_wedge_failure_json(
                    "TPU tunnel wedge suspected: the measurement child was "
                    f"killed after exceeding the {POST_DISCOVERY_BUDGET_S:.0f}s "
                    "post-discovery budget; not retrying (a post-discovery "
                    "kill can itself create a stale remote claim)"
                )
                sys.exit(3)
        else:
            if proc.returncode == 0:
                sys.stdout.write(out)
                return
            sys.stdout.write(out)
            last_rc = proc.returncode
            if proc.returncode != 3:
                # real measurement failure (assert, numerics guard) — a
                # fresh backend will not change it; fail fast and loudly
                sys.exit(proc.returncode)
            print(
                f"bench.py: attempt {attempt + 1}/{ATTEMPTS} hit the "
                "discovery watchdog (stale remote claim?)",
                file=sys.stderr,
            )
        finally:
            if os.path.exists(sentinel):
                os.unlink(sentinel)
        if attempt < ATTEMPTS - 1:
            backoff = BACKOFFS_S[min(attempt, len(BACKOFFS_S) - 1)]
            print(
                f"bench.py: backing off {backoff:.0f}s before re-exec "
                "(fresh backend init; stale claims self-heal once the "
                "holder is gone)",
                file=sys.stderr,
            )
            time.sleep(backoff)
    print(
        f"bench.py: all {ATTEMPTS} attempts failed — the TPU tunnel looks "
        "persistently wedged.  Remediation: wait for the stale remote claim "
        "to expire (minutes after the holding process dies), do NOT kill "
        "clients mid-remote-compile, then re-run bench.py.",
        file=sys.stderr,
    )
    _emit_wedge_failure_json(
        f"TPU tunnel wedged: backend discovery failed in all {ATTEMPTS} "
        f"child attempts (watchdog {DISCOVERY_WATCHDOG_S:.0f}s each); "
        "remote terminal fault — needs infra-side restart"
    )
    sys.exit(last_rc)


if __name__ == "__main__":
    main()
