"""CORAL stage-2 loops: UDLR evaluation and refiner training.

Evaluation follows ``LocalRefineValidationLoop`` (``engine/runner/
loop_CORAL.py:41-341``): multi-resolution features, optional 2x2 m-patch
prediction stitching (68px windows, stride 34 -> 102px canvas,
``concate_preds`` loop_CORAL.py:62-96), centre-crop fallback when the
foreground ratio is < 0.1%, SparseRefiner forward, centre-pad on cropped
samples, metrics + PNG masks.

Training: the reference ships only an empty stub
(``loop_CORAL.py:38-39`` — CORAL training was never released).  This trainer
completes the capability using the IoU-weighted distillation loss that *is*
shipped (``SparseRefiner.cal_ex_loss``, UDLR.py:52-75): window targets are
the frozen stage-1 decoder's predictions on each window's high-res features,
so the refiner distills toward the decoder evaluated at higher resolution —
our design choice, documented here, since upstream never defined one.
"""

from __future__ import annotations

import functools
import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ucod_dpl_tpu.models.dba import rev_decoder_forward
from ucod_dpl_tpu.models.udlr import (
    refiner_train_loss,
    sparse_refiner_forward,
)
from ucod_dpl_tpu.ops import interpolate_bilinear
from ucod_dpl_tpu.utils.fileio import save_binary_mask
from ucod_dpl_tpu.utils.metrics import CODStatistics

from .train_step import make_optimizer


def _nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _resize_nhwc(x, size):
    return _nhwc(interpolate_bilinear(_nchw(x), size))


def concate_m_patch_preds(preds: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, 68, 68, 1) 2x2 patch predictions -> (B, 102, 102, 1) with
    overlap averaging (stride 34), as loop_CORAL.concate_preds."""
    b = preds.shape[0]
    canvas = jnp.zeros((b, 102, 102, 1), preds.dtype)
    counter = jnp.zeros((b, 102, 102, 1), preds.dtype)
    idx = 0
    for i in range(2):
        for j in range(2):
            y, x = i * 34, j * 34
            canvas = canvas.at[:, y : y + 68, x : x + 68].add(preds[:, idx])
            counter = counter.at[:, y : y + 68, x : x + 68].add(1.0)
            idx += 1
    return canvas / (counter + 1e-6)


# module-level cached jit builders: evaluators are constructed per launch
# and per-instance closures would re-trace on every dataset (see
# eval_loop._make_first_pass for the rationale)

@functools.lru_cache(maxsize=8)
def _make_decoder_fwd():
    @jax.jit
    def decoder_fwd(dec, feats):
        fg, _, _ = rev_decoder_forward(dec, feats, with_loss=False)
        return fg

    return decoder_fwd


@functools.lru_cache(maxsize=16)
def _make_refine(window_size: int, threshold: float):
    @jax.jit
    def refine(refiner_params, l_feat, h_feat, preds):
        out = sparse_refiner_forward(
            refiner_params, l_feat, h_feat, preds,
            window_size=window_size, threshold=threshold,
        )
        return out.outputs

    return refine


def prepare_refine_inputs(decoder_params, l_input, h_input, m_input, window_length):
    """Multi-resolution feature prep for the refiner (loop_CORAL.py:206-245),
    shared by the evaluator and the serving RefinePredictor.

    l/h features resize to the window length; the coarse prediction comes
    from the stage-1 decoder on the 2x2 m-patch stitch when m features are
    given, else directly on the resized l features."""
    wl = window_length
    b = l_input.shape[0]
    c = l_input.shape[-1]
    decoder_fwd = _make_decoder_fwd()
    l_feat = _resize_nhwc(jnp.asarray(l_input), (wl, wl))
    hf = jnp.asarray(h_input).reshape((-1,) + h_input.shape[2:])
    h_feat = _resize_nhwc(hf, (wl, wl)).reshape(b, -1, wl, wl, c)

    if m_input is not None:
        mf = jnp.asarray(m_input).reshape((-1,) + m_input.shape[2:])
        m_feat = _resize_nhwc(mf, (68, 68))
        preds = decoder_fwd(decoder_params, m_feat)
        preds = concate_m_patch_preds(preds.reshape(b, 4, 68, 68, 1))
    else:
        preds = decoder_fwd(decoder_params, l_feat)
    return l_feat, h_feat, preds


class LocalRefineEvaluator:
    def __init__(self, cfg, runner):
        self.cfg = cfg
        self.runner = runner
        mc = cfg.model_cfg
        self.window_length = mc.window_length
        self.window_size = mc.get("window_size", 3)
        self.threshold = mc.get("threshold", 0.0015)
        self.require_m = cfg.dataset_cfg.valset_cfg.get("require_m_patches", False)
        self.save_preds = cfg.val_cfg.get("save_preds", True)

        self._decoder_fwd = _make_decoder_fwd()
        self._refine = _make_refine(self.window_size, float(self.threshold))

    # -- feature prep (loop_CORAL.py:206-245) ------------------------------
    def _prepare(self, l_input, h_input, m_input):
        return prepare_refine_inputs(
            self.runner.decoder_params,
            l_input,
            h_input,
            m_input if self.require_m else None,
            self.window_length,
        )

    @staticmethod
    def _center_pad(x: np.ndarray, fill: float = -10.0) -> np.ndarray:
        """Pad to 2x around the centre (loop_CORAL.py:168-204)."""
        b, h, w, c = x.shape
        out = np.full((b, 2 * h, 2 * w, c), fill, dtype=x.dtype)
        out[:, h // 2 : h // 2 + h, w // 2 : w // 2 + w] = x
        return out

    def _refine_one_cropped(self, img_path: str) -> np.ndarray:
        """Centre-crop fallback for one image: live re-extraction, single
        refiner pass, centre-pad (loop_CORAL.py:148-151, 276-311)."""
        got = self.runner.val_dataset.get_features(img_path, crop_center=True)
        l_c, h_c, m_c = got
        l_feat, h_feat, preds = self._prepare(
            np.asarray(l_c, np.float32),
            np.asarray(h_c, np.float32),
            np.asarray(m_c, np.float32) if m_c is not None else None,
        )
        out = np.asarray(self._refine(self.runner.refiner_params, l_feat, h_feat, preds))
        return self._center_pad(out)[0]

    def run(self) -> Dict[str, float]:
        """Batched refiner evaluation (the reference is strictly bs=1,
        loop_CORAL.py:139; the device pass here handles any val batch size —
        only the data-dependent centre-crop fallback re-runs per image)."""
        runner = self.runner
        n_total = len(runner.val_dataloader.dataset)
        workers = self.cfg.val_cfg.get("metric_workers", -1)
        if workers < 0:
            workers = CODStatistics.auto_workers(n_total)
        stats = CODStatistics(workers=workers)
        dataset_name = self.cfg.dataset_cfg.valset_cfg.DATASET
        runner.logger.log(f"start validate on {dataset_name} (UDLR)")

        from ucod_dpl_tpu.utils.progress import ProgressReporter

        progress = ProgressReporter(runner.logger, n_total, f"eval {dataset_name}")

        loader_bs = runner.val_dataloader.batch_size
        try:
            return self._sweep(stats, progress, loader_bs, dataset_name)
        except BaseException:
            stats.close()  # error/preemption path: stop the scorer pool
            raise

    def _sweep(self, stats, progress, loader_bs, dataset_name) -> Dict[str, float]:
        runner = self.runner
        from . import preempt
        from ucod_dpl_tpu.ops.resize import interpolate_bilinear_np

        # see eval_loop.py: no-op outside trainers; ragged multi-process
        # shards poll on preempt.GlobalPoll's fixed collective schedule
        poll = preempt.GlobalPoll(len(runner.val_dataloader))
        for batch in runner.val_dataloader:
            poll.step()
            labels = batch["label"]
            paths = batch["img_path"]
            l_input = np.asarray(batch["features"], np.float32)
            h_input = np.asarray(batch["h_inputs"], np.float32)
            m_input = (
                np.asarray(batch["m_inputs"], np.float32)
                if batch.get("m_inputs") is not None
                and not isinstance(batch["m_inputs"], list)
                else None
            )
            n = l_input.shape[0]
            if n < loader_bs:  # pad the tail batch: avoids a fresh XLA compile
                rep = loader_bs - n
                l_input = np.concatenate([l_input, np.repeat(l_input[-1:], rep, 0)])
                h_input = np.concatenate([h_input, np.repeat(h_input[-1:], rep, 0)])
                if m_input is not None:
                    m_input = np.concatenate(
                        [m_input, np.repeat(m_input[-1:], rep, 0)]
                    )

            l_feat, h_feat, preds = self._prepare(l_input, h_input, m_input)
            outputs = np.asarray(
                self._refine(runner.refiner_params, l_feat, h_feat, preds)
            )[:n]

            # per-image centre-crop fallback for near-empty predictions
            preds_np = np.asarray(preds)[:n]
            ratios = (preds_np > 0).sum(axis=(1, 2, 3)) / (
                preds_np.shape[1] * preds_np.shape[2]
            )
            outs = list(outputs)
            for i in np.nonzero(ratios < 0.001)[0]:
                outs[i] = self._refine_one_cropped(paths[i])

            for i in range(n):
                label = labels[i]
                out = outs[i][None]  # (1, H, W, 1)
                in_01 = bool(np.all((out >= 0) & (out <= 1)))
                # clip keeps exp() in range; saturation beyond +-88 is below
                # 1e-38, invisible to the 0.5 binarisation threshold
                probs = (
                    out if in_01 else 1.0 / (1.0 + np.exp(-np.clip(out, -88.0, 88.0)))
                )
                lh, lw = label.shape[:2]
                up = interpolate_bilinear_np(
                    np.transpose(probs, (0, 3, 1, 2)), (lh, lw)
                )
                pred = (up[0, 0] > 0.5).astype(np.float64)

                stats.step(label[None, :, :, 0], pred[None])
                if self.save_preds:
                    save_binary_mask(
                        pred,
                        os.path.join(
                            self.cfg.log_cfg.log_path, "preds", dataset_name,
                            os.path.basename(paths[i]),
                        ),
                    )
            progress.update(n)

        poll.finish()  # shorter shards drain the shared poll schedule
        progress.finish()
        stats.sync_across_processes()
        result = stats.get_result()
        runner.logger.log_table({k: [round(v, 4)] for k, v in result.items()})
        return result


class LocalRefineTrainLoop:
    """Stage-2 refiner training (completes the reference's unreleased stub)."""

    def __init__(self, cfg, runner):
        self.cfg = cfg
        self.runner = runner
        tc = cfg.train_cfg
        mc = cfg.model_cfg
        self.max_epoch = tc.max_epoch
        self.window_length = mc.window_length
        self.window_size = mc.get("window_size", 3)
        self.threshold = mc.get("threshold", 0.0015)

        # per-epoch StepLR for stage 2 (step_lr_size counts epochs here; the
        # reference never defined the schedule for the unreleased trainer).
        # inject_hyperparams makes the LR a state field we set each epoch.
        self.lr0 = tc.get("lr0", 1e-4)
        self.gamma = tc.get("step_lr_gamma", 0.95)
        self.step_size = tc.get("step_lr_size", 2)
        self.optimizer = optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.lr0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        )

        ws, wl = self.window_size, self.window_length

        def loss_fn(refiner_params, dec_params, l_feat, h_feat, preds):
            out = sparse_refiner_forward(
                refiner_params, l_feat, h_feat, preds,
                window_size=ws, threshold=self.threshold,
            )
            b = l_feat.shape[0]
            c = l_feat.shape[-1]
            # window targets: frozen decoder on each window's features
            h_flat = h_feat.reshape(b * ws * ws, wl, wl, c)
            tgt_logits, _, _ = rev_decoder_forward(dec_params, h_flat, with_loss=False)
            h_targets = jax.lax.stop_gradient(
                (jax.nn.sigmoid(tgt_logits) > 0.5).astype(jnp.float32)
            )
            # shipped window-level distillation + the GE ensemble term —
            # without the latter the fuser gets no gradient at all (see
            # models/udlr.py::refiner_ensemble_loss)
            loss = refiner_train_loss(out, preds, h_targets, window_size=ws)
            return loss

        @jax.jit
        def train_step(refiner_params, opt_state, dec_params, l_feat, h_feat, preds):
            loss, grads = jax.value_and_grad(loss_fn)(
                refiner_params, dec_params, l_feat, h_feat, preds
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, refiner_params)
            new_params = optax.apply_updates(refiner_params, updates)
            return new_params, opt_state, loss

        self._train_step = train_step

        @jax.jit
        def decoder_fwd(dec, feats):
            fg, _, _ = rev_decoder_forward(dec, feats, with_loss=False)
            return fg

        self._decoder_fwd = decoder_fwd

    def _prepare(self, batch):
        wl = self.window_length
        l_input = np.asarray(batch["features"], np.float32)
        h_input = np.asarray(batch["h_inputs"], np.float32)
        b, c = l_input.shape[0], l_input.shape[-1]
        l_feat = _resize_nhwc(jnp.asarray(l_input), (wl, wl))
        hf = jnp.asarray(h_input).reshape((-1,) + h_input.shape[2:])
        h_feat = _resize_nhwc(hf, (wl, wl)).reshape(b, -1, wl, wl, c)

        m_input = batch.get("m_inputs")
        if m_input is not None and not isinstance(m_input, list):
            m_input = np.asarray(m_input, np.float32)
            mf = jnp.asarray(m_input).reshape((-1,) + m_input.shape[2:])
            m_feat = _resize_nhwc(mf, (68, 68))
            preds = self._decoder_fwd(self.runner.decoder_params, m_feat)
            preds = concate_m_patch_preds(preds.reshape(b, 4, 68, 68, 1))
        else:
            preds = self._decoder_fwd(self.runner.decoder_params, l_feat)
        # shard the batch dim over the mesh's `data` axis: the jitted step
        # then runs multi-device DP with GSPMD psum-ing the refiner grads
        # (ragged batches fall back to replication inside data_sharding)
        from ucod_dpl_tpu.parallel import data_sharding

        mesh = self.runner.mesh
        put = lambda x: jax.device_put(  # noqa: E731
            x, data_sharding(mesh, x.ndim, batch_size=x.shape[0])
        )
        return put(l_feat), put(h_feat), put(preds)

    def _install_preemption_handler(self):
        """Deferred-flag preemption handling, like the stage-1 loop
        (train_loop.py::_install_preemption_handler — saving from inside a
        signal handler is unsound while a jitted step holds state).  Uses
        the shared :mod:`engine.preempt` flag so the CORAL validation loop
        this trainer launches polls the same request per batch."""
        from . import preempt

        preempt.install()

    def _maybe_preempt_exit(self, epoch: int, signum=None) -> None:
        from . import preempt

        # stage-2 training is single-process (run() refuses pods), so the
        # local flag suffices; requested_global degrades to it and stays
        # correct if that restriction is ever lifted
        signum = signum if signum is not None else preempt.requested_global()
        if signum is None:
            return
        self.runner.refiner_params = {
            **self._trainable, "num_heads": self.runner.refiner_params["num_heads"]
        }
        path = self.runner.save_refiner(f"{epoch}_preempt")
        self.runner.logger.log(
            f"Preemption signal {signum}: refiner saved to {path}; restart "
            f"stage 2 with --refiner_path {path}"
        )
        raise SystemExit(128 + signum)

    def run(self) -> None:
        runner = self.runner
        if jax.process_count() > 1:
            # the stage-2 step has no cross-PROCESS gradient sync (the
            # loaders are per-rank; ranks would silently train divergent
            # replicas and race last-writer-wins on the same checkpoint
            # path).  The full 25-epoch stage-2 schedule is ~1 min of
            # device time — run it on ONE host (multi-DEVICE DP below
            # still applies) rather than silently corrupting a pod run.
            raise NotImplementedError(
                "stage-2 (CORAL) training is single-process: run it on one "
                "host (its full schedule is minutes of device time; the "
                "batch still shards over all local devices) — multi-process "
                "ranks would train divergent refiners"
            )
        self._install_preemption_handler()
        from ucod_dpl_tpu.parallel import replicate

        # refiner-only parameters are trained; num_heads is static metadata.
        # Params/optimizer replicate over the mesh; _prepare shards batches
        # over the `data` axis, so the jitted step runs data-parallel with
        # GSPMD inserting the gradient psum (same design as stage 1).
        repl = replicate(runner.mesh)
        trainable = jax.device_put(
            {k: v for k, v in runner.refiner_params.items() if k != "num_heads"},
            repl,
        )
        opt_state = jax.device_put(self.optimizer.init(trainable), repl)
        # EMA refiner: the config's ema_weight=0.70 / start_ema=1 belong to
        # the unreleased reference trainer; we track an EMA copy from epoch
        # `start_ema` with the stage-1 alpha-ramp semantics
        ema_weight = self.cfg.model_cfg.get("ema_weight", 0.70)
        start_ema = self.cfg.get("start_ema", 1)
        ema_params = jax.tree.map(lambda x: x, trainable)
        step = 0
        for epoch in range(self.max_epoch):
            lr = self.lr0 * self.gamma ** (epoch // self.step_size)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            self._lr = lr
            losses = []
            runner.train_dataloader.set_epoch(epoch)  # resume-deterministic
            for batch in runner.train_dataloader:
                l_feat, h_feat, preds = self._prepare(batch)
                trainable, opt_state, loss = self._train_step(
                    trainable, opt_state, runner.decoder_params, l_feat, h_feat, preds
                )
                losses.append(float(loss))
                self._trainable = trainable
                self._maybe_preempt_exit(epoch)
                if epoch >= start_ema:
                    alpha = min(1.0 - 1.0 / (step + 1.0), ema_weight)
                    ema_params = jax.tree.map(
                        lambda e, p: alpha * e + (1.0 - alpha) * p, ema_params, trainable
                    )
                    step += 1
                else:
                    ema_params = jax.tree.map(lambda x: x, trainable)
            runner.logger.log(
                f"[stage2] epoch {epoch}: loss={np.mean(losses):.4f} lr={self._lr:.2e}"
            )
            self.ema_params = ema_params
            runner.refiner_params = {**trainable, "num_heads": runner.refiner_params["num_heads"]}
            vc = self.cfg.val_cfg
            if (epoch + 1) % vc.get("val_interval", 4) == 0 and (epoch + 1) >= vc.get(
                "val_start", 4
            ):
                from . import preempt

                try:
                    runner.launch_val()
                except preempt.Preempted as e:
                    # mid-validation preemption: refiner state is coherent
                    # (val never mutates it) — save and exit now instead of
                    # waiting out the sweep
                    self._maybe_preempt_exit(epoch, e.signum)
            self._save(epoch + 1)
            self._maybe_preempt_exit(epoch)

    def _save(self, epoch: int) -> None:
        path = self.runner.save_refiner(epoch)
        self.runner.logger.log(f"Saved refiner checkpoint {path}")
        if getattr(self, "ema_params", None) is not None:
            from ucod_dpl_tpu.models.udlr import save_refiner_checkpoint

            ema_path = os.path.join(
                self.runner.log_path, "refiner_ckp", f"epoch{epoch}_ema.safetensors"
            )
            save_refiner_checkpoint(
                ema_path,
                {**self.ema_params, "num_heads": self.runner.refiner_params["num_heads"]},
            )
