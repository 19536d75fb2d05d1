"""Stage-1 training loop — host-side epoch orchestration.

Counterpart of ``TrainLoop`` (``engine/runner/loop_UCOD_DPL.py:36-272``):
epoch loop with discriminator inter-training every ``dis_intertrain`` epochs,
the finetune switch in the last ``-start_finetune`` epochs (fresh optimizer,
adversarial term off, EMA-ramp reset), periodic checkpointing and LookTwice
validation with best-MAE tracking.

Device work happens in the two jitted steps from :mod:`train_step`; batches
are sharded over the mesh's ``data`` axis before each call.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.parallel import data_sharding, replicate

from .train_step import (
    TrainState,
    make_discriminator_step,
    make_optimizer,
    make_train_step,
)


class TrainLoop:
    def __init__(self, cfg, runner):
        self.cfg = cfg
        self.runner = runner
        tc = cfg.train_cfg
        self.max_epoch = tc.max_epoch
        self.start_epoch = tc.get("start_epoch", 0)
        self.start_finetune = tc.get("start_finetune", -5)
        self.dis_intertrain = tc.get("dis_intertrain", 2)
        self.dis_epochs = tc.get("dis_epoch", 1)
        self.merge_method = tc.get("merge_method", "dis")
        self.log_interval = cfg.log_cfg.get("log_interval", 50)
        # multi-process flag-coordination cadence (see _maybe_preempt_exit);
        # grace periods are tens of seconds, steps are milliseconds — every
        # 16 batches bounds the added collectives at ~1/16 of the naive cost
        self.preempt_poll = max(int(tc.get("preempt_poll_interval", 16)), 1)

        vc = cfg.val_cfg
        self.enable_val = vc.get("enable_val", True)
        self.val_interval = vc.get("val_interval", 5)
        self.val_start = (
            self.max_epoch + vc.get("start_val", -50)
            if vc.get("start_val", -50) < 0
            else vc.get("start_val")
        )
        sc = tc.get("save_cfg", {})
        self.save_interval = sc.get("save_interval", 5)
        self.save_start = (
            self.max_epoch + sc.get("start_save", -50)
            if sc.get("start_save", -50) < 0
            else sc.get("start_save")
        )

        self.optimizer = make_optimizer(
            tc.lr0, tc.get("step_lr_gamma", 0.95), tc.get("step_lr_size", 25)
        )
        self.dis_optimizer = make_optimizer(
            tc.get("dis_lr0", 1e-3),
            tc.get("dis_step_lr_gamma", 0.95),
            tc.get("dis_step_lr_size", 25),
        )
        self._train_step = jax.jit(
            make_train_step(cfg, self.optimizer), donate_argnums=(0,)
        )
        self._dis_step = jax.jit(
            make_discriminator_step(cfg, self.dis_optimizer), donate_argnums=(0,)
        )

        # LoRA joint training (model_cfg.lora.enable): adapters on the
        # backbone's q/k/v trained alongside the decoder from live pixels
        lc = cfg.model_cfg.get("lora", {})
        self.lora_enabled = bool(lc.get("enable", False))
        if self.lora_enabled:
            if runner.mesh.shape.get("model", 1) > 1:
                raise NotImplementedError(
                    "LoRA training with a model-parallel mesh is not "
                    "supported (the adapted backbone runs replicated per "
                    "data shard); set tpu_cfg.mesh.model to 1 and scale "
                    "with data parallelism"
                )
            from ucod_dpl_tpu.models.lora import init_lora

            from .train_step import make_lora_train_step

            fe = runner.feature_extractor
            self.lora_optimizer = make_optimizer(
                lc.get("lr", 1e-4),
                tc.get("step_lr_gamma", 0.95),
                tc.get("step_lr_size", 25),
            )
            self.lora_params = init_lora(
                jax.random.PRNGKey(cfg.get("seed", 42) + 3),
                fe.params,
                rank=int(lc.get("rank", 2)),
            )
            self.lora_opt_state = self.lora_optimizer.init(self.lora_params)
            # a seq mesh axis (tpu_cfg.mesh = {"data": N, "seq": M}) shards
            # the adapted backbone's TOKEN dim during training too: ring
            # attention carries its own VJP (parallel/sp.py), so this is the
            # activation-memory lever for high-resolution fine-tuning
            self._lora_step = jax.jit(
                make_lora_train_step(
                    cfg, self.optimizer, self.lora_optimizer, fe.config,
                    fe.compute_dtype, sp_shard=fe.sp_shard,
                ),
                donate_argnums=(0, 1, 2),
            )
            # discriminator inter-training must see the features the stage-1
            # step scores it on — the LIVE adapted backbone's, not the stale
            # cached base-backbone features (as adapters drift, a
            # cache-trained discriminator's p_s/p_p and hence the APM merge
            # weight would degrade silently)
            from ucod_dpl_tpu.models.lora import lora_forward

            self._lora_extract = jax.jit(
                lambda lora_p, px: lora_forward(
                    fe.params, lora_p, px, fe.config,
                    rank=int(lc.get("rank", 2)),
                    alpha=float(lc.get("alpha", 4.0)),
                    compute_dtype=fe.compute_dtype, remat=False,
                    sp_shard=fe.sp_shard,
                )["key_features"].astype(jnp.float32)
            )

        self.state = TrainState(
            decoder=runner.decoder_params,
            decoder_ema=runner.decoder_ema_params,
            opt_state=self.optimizer.init(runner.decoder_params),
            dis_params=runner.discriminator_params,
            dis_stats=runner.discriminator_stats,
            dis_opt_state=self.dis_optimizer.init(runner.discriminator_params),
            ema_step=jnp.zeros((), jnp.int32),
        )
        # place the state REPLICATED on the mesh explicitly.  Fresh-init
        # leaves are uncommitted host arrays that jit happens to re-place
        # compatibly — but a --resume restore commits leaves to a single
        # device (orbax restores with the template's sharding), and a
        # multi-host resumed step then fails on mixed device sets.  The
        # explicit placement makes the fresh path deliberate and gives the
        # restore template the correct replicated sharding
        # (tests/test_distributed_preempt.py resumes under 2 processes).
        self.state = jax.device_put(self.state, replicate(runner.mesh))
        if self.lora_enabled:
            self.lora_params = jax.device_put(
                self.lora_params, replicate(runner.mesh)
            )
            self.lora_opt_state = jax.device_put(
                self.lora_opt_state, replicate(runner.mesh)
            )
        self.finetune = False
        self.best_mae = float("inf")
        self.best_result: Optional[Dict[str, float]] = None
        self.save_mode = tc.get("save_cfg", {}).get("save_mode", "model")
        # full-state backend: "npz" (single-host default) or "orbax"
        # (multi-host sharded saves) — see engine/checkpoint.py
        self.ckpt_backend = tc.get("save_cfg", {}).get("backend", "npz")

        resume = tc.get("resume")
        if resume:
            self._resume(resume)

    def _resume(self, path: str) -> None:
        """Restore full training state (optimizer moments, EMA step, epoch)
        from a save_mode='all' checkpoint."""
        import os

        from .checkpoint import load_train_state

        self.state, meta = load_train_state(path, self.state)
        self.start_epoch = int(meta.get("epoch", 0))
        self.finetune = bool(meta.get("finetune", False))
        self.best_mae = float(meta.get("best_mae", float("inf")))
        # mid-epoch preemption state: which phase of start_epoch was running
        # and how many batches it had already applied — consumed once by
        # run()/_run_epoch/_train_discriminator so the resumed trajectory
        # skips exactly the already-applied batches instead of replaying
        # them on top of state that contains their updates
        if meta.get("phase"):
            self._resume_phase = (
                str(meta["phase"]),
                int(meta.get("dis_pass", 0)),
                int(meta.get("batch_done", 0)),
            )
        self._resume_val_pending = bool(meta.get("val_pending", False))
        if self.lora_enabled and (
            os.path.exists(path + "_lora.npz") or os.path.isdir(path + "_lora.orbax")
        ):
            # adapters + their optimizer moments resume alongside TrainState
            lora_tree, lora_meta = load_train_state(
                path + "_lora",
                {"lora": self.lora_params, "opt": self.lora_opt_state},
            )
            # both files carry the same metadata dict at save time; a crash
            # between the two os.replace commits leaves adapters one save
            # older than the decoder state — resuming that pair silently
            # trains mismatched halves
            if lora_meta != meta:
                raise RuntimeError(
                    f"LoRA state {path}_lora is from a different save than "
                    f"{path} (meta {lora_meta} vs {meta}) — a crash likely "
                    "interrupted the checkpoint pair; resume from the "
                    "previous state_epochN checkpoint instead"
                )
            self.lora_params = lora_tree["lora"]
            self.lora_opt_state = lora_tree["opt"]
        self.runner.logger.log(
            f"Resumed training state from {path} (epoch {self.start_epoch}, "
            f"finetune={self.finetune})"
        )

    def _save_full_state(self, path: str, epoch: int, phase_meta=None) -> None:
        from .checkpoint import save_train_state

        meta = {"epoch": epoch, "finetune": self.finetune, "best_mae": self.best_mae}
        if getattr(self, "_val_pending", False):
            # this boundary's validation has not run yet — any resume from
            # this checkpoint must re-run it (see run())
            meta["val_pending"] = True
        if phase_meta:
            meta.update(phase_meta)
        save_train_state(path, self.state, meta, backend=self.ckpt_backend)
        if self.lora_enabled:
            save_train_state(
                path + "_lora",
                {"lora": self.lora_params, "opt": self.lora_opt_state},
                meta,
                backend=self.ckpt_backend,
            )

    # ------------------------------------------------------------------
    def _device_batch(self, batch, need_features: bool = True):
        mesh = self.runner.mesh
        plabels = batch["pseudo_label"]
        # collate passes Nones/raggeds through as a list -> no usable cache
        if plabels is None or isinstance(plabels, list):
            raise RuntimeError(
                "Training requires a pseudo-label cache; run "
                "scripts/generate_pseudo_label.py first."
            )
        plabels = np.asarray(plabels, dtype=np.float32)
        bs = plabels.shape[0]
        features = None
        if need_features:  # LoRA batches ship pixels instead — skip the
            # (large) cached-feature host->device transfer entirely
            features = np.asarray(batch["features"], dtype=np.float32)
            features = jax.device_put(
                features, data_sharding(mesh, features.ndim, batch_size=bs)
            )
        return (
            features,
            jax.device_put(plabels, data_sharding(mesh, plabels.ndim, batch_size=bs)),
        )

    def _device_pixels(self, batch):
        """Normalised image pixels, data-sharded over the mesh (LoRA paths
        feed the live backbone from pixels instead of cached features)."""
        pixels = np.asarray(batch["pixels"], dtype=np.float32)
        mesh = self.runner.mesh
        return jax.device_put(
            pixels, data_sharding(mesh, pixels.ndim, batch_size=pixels.shape[0])
        )

    def _sync_runner_params(self) -> None:
        self.runner.decoder_params = self.state.decoder
        self.runner.decoder_ema_params = self.state.decoder_ema
        self.runner.discriminator_params = self.state.dis_params
        self.runner.discriminator_stats = self.state.dis_stats

    # ------------------------------------------------------------------
    def _install_preemption_handler(self):
        """Checkpoint full state on SIGTERM/SIGINT (preemption safety —
        SURVEY §5.3: the reference has no elastic/preemption story).

        DEFERRED design (see :mod:`engine.preempt`): the handler only sets a
        flag; the epoch loops save and exit at the next safe boundary.
        Saving directly inside the handler is unsound: the signal can land
        while the jitted step holds ``self.state``'s DONATED buffers, and
        the save then crashes on deleted arrays — the process would die
        without a checkpoint (caught by tests/test_preemption.py).  The
        validation loops poll the same flag per batch and raise
        :class:`~engine.preempt.Preempted`, handled in :meth:`run`."""
        from . import preempt

        preempt.install()

    def _maybe_preempt_exit(self, signum=None, batch_idx=None) -> None:
        """Save full state and exit if a preemption signal was flagged.

        The checkpoint records the phase progress of the current epoch
        (``phase``/``dis_pass``/``batch_done``) so a resumed run skips the
        batches whose updates the saved state already contains — replaying
        them would double-apply and diverge from the uninterrupted run.

        Multi-process runs take the CLUSTER-agreed flag
        (:func:`preempt.requested_global`): local flags race batch
        boundaries, and per-rank decisions would mix steps inside the
        collective orbax save or strand the other ranks in a psum.  The
        allgather is host-blocking (it would serialize async dispatch if
        taken every batch), so mid-phase calls pass ``batch_idx`` and only
        coordinate every ``train_cfg.preempt_poll_interval`` batches —
        identical arithmetic on every rank, so the collective schedule
        stays lockstep; phase/epoch boundaries always coordinate.
        Single-process keeps the immediate per-batch local check (the
        behavior the bitwise preemption tests pin)."""
        import jax

        from . import preempt

        if signum is None:
            if jax.process_count() == 1:
                signum = preempt.requested()
            elif batch_idx is None or batch_idx % self.preempt_poll == 0:
                signum = preempt.requested_global()
            else:
                return  # off-schedule in a pod: wait for a coordinated point
        if signum is None:
            return
        path = f"{self.runner.ckp_dir}/state_preempt"
        phase = getattr(self, "_phase", None)
        phase_meta = {}
        if phase is not None:
            phase_meta = {
                "phase": phase[0], "dis_pass": phase[1], "batch_done": phase[2],
            }
        self._save_full_state(path, self._cur_epoch, phase_meta)
        self.runner.logger.log(
            f"Preemption signal {signum}: state saved to {path}; resume with "
            f"--resume {path}"
        )
        raise SystemExit(128 + signum)

    def run(self) -> None:
        from . import preempt

        logger = self.runner.logger
        logger.log(f"Starting training: {self.max_epoch} epochs")
        epoch = self.start_epoch
        self._cur_epoch = epoch
        self._phase = None
        self._val_pending = False
        self._install_preemption_handler()
        if getattr(self, "_resume_val_pending", False):
            # the preempted run was interrupted at (or during) a boundary
            # validation — run it now so best-MAE tracking matches the
            # uninterrupted trajectory
            self._resume_val_pending = False
            self._val_pending = True
            self._sync_runner_params()
            try:
                result = self.runner.launch_val_look_twice()
            except preempt.Preempted as e:
                self._maybe_preempt_exit(e.signum)
                raise  # unreachable
            self._update_best(result)
            self._val_pending = False
        while epoch < self.max_epoch:
            self._cur_epoch = epoch
            self._maybe_preempt_exit()
            if not self.finetune and epoch == self.max_epoch + self.start_finetune:
                self._enter_finetune()

            rp = getattr(self, "_resume_phase", None)
            resumed_in_train = rp is not None and rp[0] == "train" and epoch == self.start_epoch
            if (
                self.merge_method == "dis"
                and not self.finetune
                and epoch % self.dis_intertrain == 0
                # a mid-train-phase preemption already ran this epoch's
                # discriminator inter-training — don't re-apply it
                and not resumed_in_train
            ):
                self._train_discriminator(epoch)

            self._run_epoch(epoch)
            epoch += 1
            self._cur_epoch = epoch  # post-epoch saves/val belong to the boundary

            # flag the boundary validation BEFORE any boundary save: a
            # state_epochN or preemption checkpoint written before the val
            # ran records val_pending, so ANY resume from it re-runs the
            # validation and best-MAE tracking matches the uninterrupted run
            self._val_pending = (
                self.enable_val
                and epoch >= self.val_start
                and epoch % self.val_interval == 0
            )
            if epoch >= self.save_start and epoch % self.save_interval == 0:
                self._sync_runner_params()
                self.runner.save_checkpoint(epoch)
                if self.lora_enabled:
                    self._save_lora(epoch)
                if self.save_mode == "all":
                    self._save_full_state(
                        f"{self.runner.ckp_dir}/state_epoch{epoch}", epoch
                    )
            self._maybe_preempt_exit()

            if self._val_pending:
                self._sync_runner_params()
                try:
                    result = self.runner.launch_val_look_twice()
                except preempt.Preempted as e:
                    # the eval loop polls the flag per batch so a long
                    # validation cannot swallow the preemption grace period;
                    # train state is coherent here (val never mutates it)
                    self._maybe_preempt_exit(e.signum)
                    raise  # unreachable (exit raises SystemExit)
                self._update_best(result)
                self._val_pending = False

        self._sync_runner_params()
        if self.best_result is not None:
            logger.log(f"Best result: {self.best_result}")

    def _save_lora(self, epoch: int) -> None:
        """Adapters + the densely-merged backbone (HF layout): eval/serving
        consume the merged file through the ordinary ``backbone_weights``
        path at base-model inference cost."""
        from ucod_dpl_tpu.models.lora import save_lora_checkpoint, save_merged_backbone

        lc = self.cfg.model_cfg.lora
        fe = self.runner.feature_extractor
        adapters = f"{self.runner.ckp_dir}/lora_epoch{epoch}.safetensors"
        merged = f"{self.runner.ckp_dir}/backbone_merged_epoch{epoch}.safetensors"
        save_lora_checkpoint(adapters, self.lora_params)
        save_merged_backbone(
            merged, fe.params, self.lora_params, fe.config,
            rank=int(lc.get("rank", 2)), alpha=float(lc.get("alpha", 4.0)),
        )
        self.runner.logger.log(f"Saved LoRA adapters {adapters} + merged backbone {merged}")

    def _enter_finetune(self) -> None:
        """Finetune switch (loop:100-103, runner.start_finetune): fresh
        optimizer states (LR schedules restart at lr0), EMA ramp reset,
        adversarial term disabled."""
        self.finetune = True
        self.runner.logger.log("Entering finetune phase: optimizers rebuilt, APM off")
        self.state = self.state._replace(
            opt_state=self.optimizer.init(self.state.decoder),
            dis_opt_state=self.dis_optimizer.init(self.state.dis_params),
            ema_step=jnp.zeros((), jnp.int32),
        )
        if self.lora_enabled:
            # the adapters' schedule restarts with the other optimizers
            self.lora_opt_state = self.lora_optimizer.init(self.lora_params)

    def _run_epoch(self, epoch: int) -> None:
        logger = self.runner.logger
        adv = 0.0 if self.finetune else 1.0
        t0 = time.perf_counter()
        last_aux = None
        # batch order = f(seed, epoch): resumed runs replay the exact order
        self.runner.train_dataloader.set_epoch(epoch)
        n = self._consume_resume_skip("train", epoch)
        for batch in self.runner.train_dataloader:
            features, plabels = self._device_batch(
                batch, need_features=not self.lora_enabled
            )
            if self.lora_enabled:
                (
                    self.state, self.lora_params, self.lora_opt_state, aux,
                ) = self._lora_step(
                    self.state, self.lora_params, self.lora_opt_state,
                    self.runner.feature_extractor.params,
                    self._device_pixels(batch), plabels,
                    jnp.float32(epoch), jnp.float32(adv),
                )
            else:
                self.state, aux = self._train_step(
                    self.state, features, plabels, jnp.float32(epoch), jnp.float32(adv)
                )
            last_aux = aux
            n += 1
            self._phase = ("train", 0, n)
            self._maybe_preempt_exit(batch_idx=n)
            if n % max(self.log_interval, 1) == 0:
                logger.log(
                    f"epoch {epoch} iter {n}: loss={float(aux['loss']):.4f} "
                    f"dis={float(aux['dis_loss']):.4f} w={float(aux['merge_weight']):.2f}"
                )
        self._phase = None
        dt = time.perf_counter() - t0
        if last_aux is not None:
            logger.log(
                f"epoch {epoch} done: {n} iters in {dt:.1f}s "
                f"({n / max(dt, 1e-9):.2f} it/s), loss={float(last_aux['loss']):.4f}"
            )

    def _consume_resume_skip(self, phase: str, epoch: int, dis_pass: int = 0) -> int:
        """Batches of (phase, epoch[, dis_pass]) the preempted run already
        applied: skip them in the loader (one-shot) and start the batch
        counter there.  Returns 0 when this is not the resumed phase."""
        rp = getattr(self, "_resume_phase", None)
        if rp is None or epoch != self.start_epoch or rp[0] != phase:
            return 0
        if phase == "dis" and rp[1] != dis_pass:
            return 0
        self._resume_phase = None
        if rp[2]:
            self.runner.train_dataloader.skip_batches(rp[2])
            self.runner.logger.log(
                f"Resume: skipping {rp[2]} already-applied {phase} batches "
                f"of epoch {epoch}"
            )
        return rp[2]

    def _train_discriminator(self, epoch: int) -> None:
        logger = self.runner.logger
        rp = getattr(self, "_resume_phase", None)
        start_pass = rp[1] if rp is not None and rp[0] == "dis" and epoch == self.start_epoch else 0
        for d in range(start_pass, self.dis_epochs):
            losses = []
            # distinct deterministic orders for discriminator passes
            self.runner.train_dataloader.set_epoch(1_000_000 + epoch * 100 + d)
            n = self._consume_resume_skip("dis", epoch, dis_pass=d)
            for batch in self.runner.train_dataloader:
                features, plabels = self._device_batch(
                    batch, need_features=not self.lora_enabled
                )
                if self.lora_enabled:
                    # current-adapter features (no grad) — see __init__
                    features = self._lora_extract(
                        self.lora_params, self._device_pixels(batch)
                    )
                self.state, aux = self._dis_step(self.state, features, plabels)
                losses.append(float(aux["dis_train_loss"]))
                n += 1
                self._phase = ("dis", d, n)
                self._maybe_preempt_exit(batch_idx=n)
            if losses:
                logger.log(
                    f"epoch {epoch}: discriminator pass mean loss {np.mean(losses):.4f}"
                )
        self._phase = None

    def _update_best(self, result: Dict[str, float]) -> None:
        if result["MAE"] < self.best_mae:
            self.best_mae = result["MAE"]
            self.best_result = result
            self.runner.logger.log("best result:")
            self.runner.logger.log_table({k: [round(v, 4)] for k, v in result.items()})
