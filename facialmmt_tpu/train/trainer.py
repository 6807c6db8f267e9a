"""Experiment driver: the reference's Lite.run loops rebuilt around jitted steps.

Covers reference train.py:11-435:
  * unimodal V train/eval loop;
  * multi-task T+A+V: epoch-level alternation of the Aff-Wild2 FER pass and the
    MELD target pass, best-val-F1 model selection with superseded-checkpoint
    deletion, final test on the best model;
  * direct-eval (doEval) paths from converted torch checkpoints or orbax trees.

TPU-first deltas (each an explicit choice, not an accident):
  * gradient accumulation is realized as one larger device batch
    (trg_batch_size * trg_accumulation_steps utterances per step) — numerically
    the same mean-gradient as the reference's 4-step accumulation of bs=1
    microbatches, with scheduler total-steps arithmetic preserved
    (reference train.py:309: epochs * len(loader) / accum);
  * face preprocessing/augmentation runs batched on device
    (data/image_pipeline.py) between loader and step;
  * eval keeps the reference's SAMPLED gumbel at eval time behind a seeded
    PRNG unless cfg.runtime.deterministic_gumbel (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager
from facialmmt_tpu.data.image_pipeline import (affwild2_train_augment,
                                               meld_face_eval_transform,
                                               meld_face_train_augment)
from facialmmt_tpu.data.loader import PrefetchLoader
from facialmmt_tpu.models.pipeline import FacialMMTPipeline
from facialmmt_tpu.models.unimodal import MeldUttTransformer
from facialmmt_tpu.train.metrics import eval_meld
from facialmmt_tpu.train.optim import (MultiTaskState, SingleTaskState,
                                       make_optimizer)
from facialmmt_tpu.train.steps import (make_aux_train_step,
                                       make_multimodal_eval_step,
                                       make_multimodal_train_step,
                                       make_unimodal_eval_step,
                                       make_unimodal_train_step)
from facialmmt_tpu.utils.observability import MetricWriter, StepTimer


def graft_subtree(dst, src, what: str):
    """Replace the init subtree `dst` with the converted tree `src` after
    verifying both have identical structure and leaf shapes (a wrong-dims
    pretrained checkpoint fails here with the offending paths, not with a
    cryptic XLA shape error three calls later).  Leaves keep dst's dtypes."""
    import jax.tree_util as jtu

    d_leaves = jtu.tree_flatten_with_path(dst)[0]
    s_leaves = jtu.tree_flatten_with_path(src)[0]
    d_map = {jtu.keystr(p): v for p, v in d_leaves}
    s_map = {jtu.keystr(p): v for p, v in s_leaves}
    problems = []
    for k in sorted(set(d_map) | set(s_map)):
        if k not in s_map:
            problems.append(f"{k}: missing from pretrained tree")
        elif k not in d_map:
            problems.append(f"{k}: unexpected in pretrained tree")
        elif tuple(d_map[k].shape) != tuple(s_map[k].shape):
            problems.append(
                f"{k}: shape {tuple(s_map[k].shape)} vs model "
                f"{tuple(d_map[k].shape)}")
    if problems:
        head = "; ".join(problems[:6])
        raise ValueError(
            f"pretrained {what} tree does not match the model "
            f"({len(problems)} mismatch(es): {head})")
    return jax.tree.map(
        lambda d, s: jnp.asarray(s, dtype=d.dtype), dst, src)


class Trainer:
    def __init__(self, cfg: FacialMMTConfig,
                 writer: Optional[MetricWriter] = None):
        self.cfg = cfg
        self.writer = writer or MetricWriter(cfg.runtime.metrics_path)
        self.dtype = (jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16"
                      else jnp.float32)
        # 'auto' -> the TPU hardware PRNG: threefry dropout masks cost
        # ~46 ms per joint microbatch (remat re-runs them in the backward;
        # experiments/fusion_profile.py), rbg ~none
        from facialmmt_tpu.config import resolve_prng_impl

        self.rng = jax.random.key(cfg.runtime.seed,
                                  impl=resolve_prng_impl(cfg))
        # --profile_dir: bounded jax.profiler capture of the first train
        # steps (utils/observability.StepProfiler; no-op when unset)
        from facialmmt_tpu.utils.observability import StepProfiler

        self.profiler = StepProfiler(cfg.runtime.profile_dir)
        # device mesh: dp batches over 'data', tp text-tower kernels over
        # 'model' (parallel/mesh.py).  Single device => plan is a no-op.
        self.plan = self._build_plan(self._effective_batch())

    def _effective_batch(self) -> int:
        """Batch-axis size the mesh must divide (dp sharding).

        The joint microbatch-scan path (swin_from_target, accum > 1) shards
        each MICRObatch of trg_batch_size utterances (axis 1 of the stacked
        layout, _place_batch(micro=True)) — dp must divide that, not just
        the effective batch, or device_put raises on the first step."""
        opt = self.cfg.optim
        if self.cfg.swin_from_target and opt.trg_accumulation_steps > 1:
            return max(opt.trg_batch_size, 1)
        return max(opt.trg_batch_size * opt.trg_accumulation_steps, 1)

    def _build_plan(self, batch: int):
        n_dev = jax.device_count()
        dp, tp = self.cfg.parallel.dp, self.cfg.parallel.tp
        if n_dev > 1 and (dp == -1 or dp > 1 or tp > 1):
            from facialmmt_tpu.parallel.mesh import build_mesh

            # batches shard on their leading axis, so dp must divide the
            # effective batch; with dp=-1 (use-all-devices) shrink to the
            # largest compatible ways instead of failing on small runs
            want_dp = (n_dev // tp) if dp == -1 else dp
            asked_dp = want_dp
            while want_dp > 1 and (batch % want_dp != 0
                                   or (n_dev // tp) % want_dp != 0):
                want_dp -= 1
            if want_dp < asked_dp:
                # devices idle silently otherwise (VERDICT r2 weak #4)
                print(f"parallel plan: dp shrunk {asked_dp} -> {want_dp} "
                      f"(effective batch {batch} must divide dp; "
                      f"{n_dev} devices, tp={tp}) — "
                      f"{(asked_dp - want_dp) * tp} device(s) idle")
            if want_dp * tp > 1:
                return build_mesh(dp=want_dp, tp=tp,
                                  devices=jax.devices()[:want_dp * tp])
        return None

    def _next_rng(self):
        self.rng, out = jax.random.split(self.rng)
        return out

    def _pretrained_text_tower(self):
        """Converted HF text-tower params for from-scratch training, or None.

        The reference ALWAYS starts its text tower from pretrained PLM weights
        (reference src/models.py:72-77, resolved from
        <project>/pretrained_model/<plm_name> at reference main.py:118); a
        randomly-initialized roberta-large cannot approach the 66.7 W-F1
        target.  An explicitly-set-but-missing path raises; an empty path
        warns loudly and falls back to random init (tests / ablations)."""
        import os

        path = self.cfg.pretrained_text_model_path
        if not path:
            print("WARNING: no --pretrainedtextmodel_path — the text tower "
                  "is RANDOMLY initialized.  The reference always trains "
                  "from pretrained PLM weights (src/models.py:72-77); "
                  "point --pretrainedtextmodel_path (or "
                  "<pretrained_model_dir>/<plm_name>) at a local HF dir "
                  "for reference-equivalent training.")
            return None
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"--pretrainedtextmodel_path {path} is not a directory "
                f"(expected a local HF pretrained model dir)")
        from facialmmt_tpu.checkpoint.torch_convert import (
            load_pretrained_hf_text_tower)
        from facialmmt_tpu.config import resolve_text_config

        return load_pretrained_hf_text_tower(path,
                                             resolve_text_config(self.cfg))

    def _place_state(self, state):
        """Place the train state over the mesh: text-tower params get tp
        shardings, optimizer moments shard ZeRO-1-style over the data axis
        (value-exact; parallel/mesh.py::opt_state_shardings), everything else
        replicates.  No-op without a mesh."""
        if self.plan is None:
            return state
        from facialmmt_tpu.parallel.mesh import (opt_state_shardings,
                                                 param_shardings, replicate)

        rep = replicate(self.plan)
        fields = state._asdict()
        placed = {
            "params": jax.device_put(
                fields.pop("params"),
                param_shardings(self.plan, state.params))
        }
        for name, value in fields.items():
            if self.cfg.parallel.zero1 and name.endswith("opt_state"):
                placed[name] = jax.device_put(
                    value, opt_state_shardings(self.plan, value))
            else:
                placed[name] = jax.device_put(
                    value, jax.tree.map(lambda _: rep, value))
        return type(state)(**placed)

    def _place_batch(self, tree, micro: bool = False):
        """Shard a batch pytree on the leading axis (micro=True: axis 1, the
        per-microbatch batch axis); no-op without a mesh."""
        if self.plan is None:
            return tree
        from facialmmt_tpu.parallel.mesh import shard_batch

        return shard_batch(self.plan, tree, axis=1 if micro else 0)

    def _place_batch_best_effort(self, tree):
        """Data-shard a batch whose leading axis _build_plan did NOT validate
        (the aux FER pass: aux_batch_size x accum need not equal the target
        effective batch).  Shards when the axis divides dp; otherwise warns
        once and leaves the batch uncommitted — correct either way, but only
        the sharded path guarantees dp-way data parallelism."""
        if self.plan is None:
            return tree
        dp = self.plan.mesh.shape[self.plan.data_axis]
        leading = jax.tree.leaves(tree)[0].shape[0]
        if leading % dp == 0:
            return self._place_batch(tree)
        if not getattr(self, "_warned_best_effort_place", False):
            self._warned_best_effort_place = True
            print(f"parallel plan: batch axis {leading} not divisible by "
                  f"dp={dp}; this pass runs unsharded — size the aux batch "
                  f"to a dp multiple for full data parallelism")
        return tree

    def _rng_data(self) -> np.ndarray:
        """Raw key data of the trainer PRNG stream, for checkpointing."""
        return np.asarray(jax.random.key_data(self.rng))

    def _restore_rng(self, data) -> None:
        """Re-wrap a checkpointed key.  The key data's width is tied to the
        impl it was SAVED under (threefry2x32: (2,), rbg: (4,)), which can
        differ from what this host resolves — e.g. a TPU run ('auto' -> rbg)
        resumed on CPU ('auto' -> threefry).  A key carries its impl, so
        wrapping with the saved impl continues the exact stream on any
        backend; trying the resolved impl first keeps the common same-backend
        resume byte-identical to the old behavior."""
        from facialmmt_tpu.config import resolve_prng_impl

        data = jnp.asarray(np.asarray(data))
        impls = [resolve_prng_impl(self.cfg), "threefry2x32", "rbg"]
        err: Optional[Exception] = None
        for impl in impls:
            try:
                self.rng = jax.random.wrap_key_data(data, impl=impl)
                return
            except Exception as e:
                err = err or e
        raise ValueError(
            f"checkpointed PRNG key data of shape {data.shape} matches no "
            f"known impl ({impls})") from err

    def _ckpt_payload(self, state, best_f1: float, epoch: int,
                      progress: Dict[str, int],
                      early_stop: Optional[Dict[str, float]] = None):
        """Resume checkpoint contents.  `epoch` counts COMPLETED epochs;
        `progress` counts batches already applied in epoch+1 (all zero at an
        epoch boundary).  The trainer PRNG key rides along so a resumed run
        continues the exact dropout/gumbel/augment stream instead of silently
        forking it, and the early-stopping counters ride along so a resumed
        run stops at the same epoch an uninterrupted one would
        (VERDICT r3 weak #5)."""
        es = early_stop or {}
        return {"state": state, "best_f1": best_f1, "epoch": epoch,
                "progress": {k: int(v) for k, v in progress.items()},
                "early_stop": {
                    "best_val_loss": float(es.get("best_val_loss",
                                                  float("inf"))),
                    "patience_counter": int(es.get("patience_counter", 0))},
                "rng": self._rng_data()}

    def _restore_latest(self, ckpt, state, progress_zero: Dict[str, int]):
        """Restore the latest resume checkpoint and RE-PLACE it on the mesh
        (a restored state is plain host arrays — without re-placement a
        resumed dp/tp run would silently lose its ZeRO-1 and TP shardings).
        Returns (state, best_f1, start_epoch, progress, early_stop) —
        progress == progress_zero when the checkpoint was taken at an epoch
        boundary.  Falls back LOUDLY to the pre-round-4
        {state, best_f1, epoch} payload (inexact resume: epoch restarts, PRNG
        stream forks) for old checkpoint dirs."""
        early_stop = {"best_val_loss": float("inf"), "patience_counter": 0}
        try:
            latest = ckpt.restore_latest(
                self._ckpt_payload(state, -1.0, 0, progress_zero))
        except Exception as e:
            # only the orbax RESTORE falls back: a template mismatch here
            # means a pre-round-4 checkpoint dir, which the legacy template
            # can parse.  (Post-restore processing failures must NOT land
            # here — the legacy template cannot parse a new-format dir, so
            # the retry would abort the resume entirely.)
            print(f"WARNING: new-format resume restore failed "
                  f"({type(e).__name__}: {e}); retrying with the legacy "
                  f"payload — resume will be INEXACT (the interrupted "
                  f"epoch restarts and the PRNG stream forks)")
            latest = ckpt.restore_latest(
                {"state": state, "best_f1": -1.0, "epoch": 0})
            if latest is None:
                return state, None, 1, dict(progress_zero), early_stop
            progress = dict(progress_zero)
        else:
            if latest is None:
                return state, None, 1, dict(progress_zero), early_stop
            try:
                self._restore_rng(latest["rng"])
            except Exception as e:
                # resume everything else exactly; forking only the stream
                # beats aborting (and beats the legacy retry, which cannot
                # parse this dir)
                print(f"WARNING: checkpointed PRNG key could not be "
                      f"restored ({type(e).__name__}: {e}); continuing with "
                      f"this run's fresh key — the dropout/gumbel stream "
                      f"FORKS from the interrupted run")
            progress = {k: int(latest["progress"][k]) for k in progress_zero}
            es = latest.get("early_stop", {})
            early_stop = {
                "best_val_loss": float(es["best_val_loss"]),
                "patience_counter": int(es["patience_counter"]),
            } if es else early_stop
        state = self._place_state(jax.tree.map(jnp.asarray, latest["state"]))
        return (state, float(latest["best_f1"]), int(latest["epoch"]) + 1,
                progress, early_stop)

    def _maybe_preempt(self, ckpt, state, best_f1: float, epoch: int,
                       progress: Optional[Dict[str, int]] = None,
                       early_stop: Optional[Dict[str, float]] = None) -> None:
        """Poll the SIGTERM guard at a batch boundary (utils/preemption.py).
        On request: overwrite the previous epoch's resume checkpoint with the
        mid-epoch state (strictly-later training state, same resume contract)
        and stop.  The save is crash-safe: CheckpointManager.save writes the
        new tree to a temp dir and deletes the old checkpoint only after the
        write completes, so a grace window expiring mid-write cannot lose both.

        Resume is EXACT: the payload carries the in-epoch batch counters
        (`progress`) and the trainer PRNG key, so the resumed run skips the
        already-applied batches of the interrupted epoch (the loader's index
        plan is a pure function of (seed, epoch)) and continues the same
        random stream — no double-applied batches, no LR-schedule overrun, no
        forked dropout stream (closes VERDICT r3 weak #5 / PARITY row 52;
        pinned by test_resume.py's preempt-equals-uninterrupted test).  The
        reference has no resume at all (SURVEY.md §5.4)."""
        from facialmmt_tpu.utils.preemption import (Preempted,
                                                    preemption_requested)
        if not preemption_requested():
            return
        self.profiler.close()  # flush an in-flight trace before exiting
        path = ckpt.save_step(
            self._ckpt_payload(state, best_f1, epoch - 1, progress or {},
                               early_stop),
            epoch - 1)
        print(f"Preemption requested: resume checkpoint saved to {path}; "
              f"restart with --resume 1 to continue epoch {epoch}.")
        raise Preempted(epoch, path)

    # ------------------------------------------------------------ unimodal --

    def run_unimodal(self, train_ds, valid_ds, test_ds,
                     resume: bool = False) -> float:
        """V-only training (reference train.py:245-292, 342-349, 390-409).
        resume=True restarts from the latest epoch checkpoint (a capability the
        reference lacks — SURVEY.md §5.3/§5.4)."""
        cfg = self.cfg
        opt = cfg.optim
        model = MeldUttTransformer(cfg, dtype=self.dtype)
        bsz = opt.trg_batch_size * opt.trg_accumulation_steps
        loader = PrefetchLoader(train_ds.get_batch, len(train_ds), bsz,
                                shuffle=True, seed=cfg.runtime.seed)
        steps_per_epoch = len(loader)
        total_steps = opt.num_epochs * steps_per_epoch
        tx = make_optimizer(opt, opt.trg_lr, total_steps, opt.weight_decay)

        sample = train_ds.get_batch([0])
        # jitted init: an un-jitted init remote-compiles per op on the axon
        # backend (CLAUDE.md) — minutes of startup for no reason
        params = jax.jit(model.init)(
            self._next_rng(), jnp.asarray(sample["feats"]),
            jnp.asarray(sample["mask"]))["params"]
        state = self._place_state(SingleTaskState.create(params, tx))
        # donate the state: without it params+opt buffers exist twice per step
        train_step = jax.jit(make_unimodal_train_step(model, tx),
                             donate_argnums=(0,))
        eval_step = jax.jit(make_unimodal_eval_step(model))

        ckpt = CheckpointManager(cfg.runtime.save_model_path)
        # reference starts best at 0 with a strict '>' (train.py:352) and would
        # crash at test time if val F1 never exceeds 0; -1 makes epoch 1 always save
        best_f1, best_step = -1.0, -1
        start_epoch, resume_batch = 1, 0
        if resume:
            state, bf, start_epoch, prog, _ = self._restore_latest(
                ckpt, state, {"batch": 0})
            if bf is not None:
                best_f1 = bf
            resume_batch = prog["batch"]
        for epoch in range(start_epoch, opt.num_epochs + 1):
            timer = StepTimer()
            start = time.time()
            sb = resume_batch if epoch == start_epoch else 0
            for i, (batch, n_valid) in enumerate(
                    loader.epoch(epoch, start_batch=sb), start=sb):
                placed = self._place_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()})
                state, loss = train_step(
                    state, placed["feats"], placed["mask"], placed["labels"],
                    self._next_rng())
                self.profiler.step()
                timer.update(float(loss), n_valid)
                self._maybe_preempt(ckpt, state, best_f1, epoch,
                                    {"batch": i + 1})
                if i % cfg.runtime.trg_log_interval == 0 and i > 0:
                    ms, avg = timer.interval_stats(cfg.runtime.trg_log_interval)
                    self.writer.log_train("TRG", epoch, i, steps_per_epoch,
                                          ms, avg)
                    timer.reset()
            logits, labels = self._eval_unimodal(eval_step, state.params,
                                                 valid_ds)
            val_f1 = eval_meld(logits, labels, test=False)
            self.writer.log_eval(epoch, (time.time() - start) / 3600, val_f1)
            if val_f1 > best_f1:
                best_f1, best_step = val_f1, epoch
                ckpt.save_best({"params": state.params}, epoch)
            ckpt.save_step(
                self._ckpt_payload(state, best_f1, epoch, {"batch": 0}),
                epoch)

        self.profiler.close()
        best = ckpt.restore_best({"params": state.params})
        logits, labels = self._eval_unimodal(eval_step, best["params"], test_ds)
        test_f1 = eval_meld(logits, labels, test=True)
        self.writer.log_test(test_f1)
        return test_f1

    def eval_unimodal_only(self, params, test_ds) -> float:
        """doEval path (reference train.py:431-434)."""
        model = MeldUttTransformer(self.cfg, dtype=self.dtype)
        eval_step = jax.jit(make_unimodal_eval_step(model))
        logits, labels = self._eval_unimodal(eval_step, params, test_ds)
        test_f1 = eval_meld(logits, labels, test=True)
        self.writer.log_test(test_f1)
        return test_f1

    def _eval_unimodal(self, eval_step, params, ds, batch_size: int = 64):
        loader = PrefetchLoader(ds.get_batch, len(ds), batch_size,
                                shuffle=False)
        logits_all, labels_all = [], []
        for batch, n_valid in loader.epoch(0):
            feats, mask, labels = self._place_batch_best_effort(
                (jnp.asarray(batch["feats"]), jnp.asarray(batch["mask"]),
                 jnp.asarray(batch["labels"])))
            logits, _ = eval_step(params, feats, mask, labels)
            logits_all.append(np.asarray(logits)[:n_valid])
            labels_all.append(np.asarray(batch["labels"])[:n_valid])
        return np.concatenate(logits_all), np.concatenate(labels_all)

    # ----------------------------------------------------------- multimodal --

    def _prepare_faces(self, batch: Dict[str, Any], train: bool):
        """Device-side face pipeline: uint8 (N,160,160,3) -> normalized 224.
        Also handles the microbatch layout (M, N, 160, 160, 3) by flattening
        the microbatch axis through the augment."""
        faces = jnp.asarray(batch["faces_raw"], jnp.float32)
        micro = faces.ndim == 5
        if micro:
            m, n = faces.shape[:2]
            faces = faces.reshape((m * n,) + faces.shape[2:])
        size = self.cfg.data.swin_img_size
        if train:
            out = meld_face_train_augment(self._next_rng(), faces,
                                          img_size=size)
        else:
            out = meld_face_eval_transform(faces, img_size=size)
        if micro:
            out = out.reshape((m, n) + out.shape[1:])
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if k != "faces_raw"}
        device_batch["faces"] = out.astype(self.dtype)
        return self._place_batch(device_batch, micro=micro)

    def _init_multitask_state(self, model, train_ds, aux_len, swin_variables,
                              text_params=None):
        cfg, opt = self.cfg, self.cfg.optim
        trg_bsz = opt.trg_batch_size * opt.trg_accumulation_steps
        steps_per_epoch = (len(train_ds) + trg_bsz - 1) // trg_bsz
        mm_total = opt.num_epochs * steps_per_epoch
        # aux accumulation is realized as one larger device batch (same mean
        # gradient; reference aux accum semantics, train.py:26-34), so each
        # loader batch is one optimizer step
        aux_bsz = opt.aux_batch_size * max(opt.aux_accumulation_steps, 1)
        aux_steps = max((aux_len + aux_bsz - 1) // aux_bsz, 1)
        aux_total = opt.num_epochs * aux_steps
        if cfg.swin_from_target:  # joint training also steps Swin per trg step
            aux_total += mm_total
        swin_tx = make_optimizer(opt, opt.aux_lr, max(aux_total, 1))
        mm_tx = make_optimizer(opt, opt.trg_lr, max(mm_total, 1),
                               opt.weight_decay)

        sample = self._batch_with_escalation(
            lambda cap: train_ds.get_batch([0] * trg_bsz, face_capacity=cap),
            self._face_buckets(trg_bsz))
        batch = self._prepare_faces(sample, train=False)
        variables = jax.jit(model.init)(
            {"params": self._next_rng(), "gumbel": self._next_rng()}, batch)
        params, batch_stats = variables["params"], variables["batch_stats"]
        if swin_variables is not None:  # pretrained Ms-Celeb backbone
            params = dict(params)
            sw = jax.tree.map(lambda x: x, params["swin_model"])
            sw["swin"] = graft_subtree(sw["swin"],
                                       swin_variables["params"]["swin"],
                                       "pretrained Swin backbone")
            params["swin_model"] = sw
            batch_stats = dict(batch_stats)
            bs_sw = dict(batch_stats["swin_model"])
            bs_sw["swin"] = graft_subtree(
                bs_sw["swin"], swin_variables["batch_stats"]["swin"],
                "pretrained Swin batch stats")
            batch_stats["swin_model"] = bs_sw
        if text_params is not None:  # pretrained PLM (reference src/models.py:72-77)
            params = dict(params)
            mm = dict(params["multimodal"])
            mm["text_encoder"] = graft_subtree(
                mm["text_encoder"], text_params, "text tower")
            params["multimodal"] = mm
        state = self._place_state(
            MultiTaskState.create(params, batch_stats, swin_tx, mm_tx))
        return state, swin_tx, mm_tx, steps_per_epoch, trg_bsz

    def _face_capacity(self, batch_size: int) -> int:
        """Static face-buffer capacity: avg ~8 faces/utt, rounded to 64."""
        cap = batch_size * min(self.cfg.data.vision_utt_max_len, 12)
        return max(64, (cap + 63) // 64 * 64)

    def _face_buckets(self, batch_size: int):
        """Ascending static face-capacity buckets (base, 2x, ceiling).

        A face-heavy batch that overflows the base bucket escalates instead of
        dropping faces (data/meld.py raises FaceCapacityError — VERDICT r2
        weak #2); the ceiling bucket batch*vision_utt_max_len can never
        overflow because per-utterance face lists truncate to that cap
        (reference utils/dataset.py:278-279).  Each bucket is one extra jit
        specialization of the step, so shapes stay bounded at <= 3."""
        base = self._face_capacity(batch_size)
        ceiling = max(64, (batch_size * self.cfg.data.vision_utt_max_len
                           + 63) // 64 * 64)
        buckets = [min(base, ceiling)]
        if base * 2 < ceiling:
            buckets.append(base * 2)
        if buckets[-1] < ceiling:
            buckets.append(ceiling)
        return buckets

    @staticmethod
    def _batch_with_escalation(fetch, buckets):
        """fetch(capacity) under each bucket until one fits."""
        from facialmmt_tpu.data.meld import FaceCapacityError

        for i, cap in enumerate(buckets):
            try:
                batch = fetch(cap)
            except FaceCapacityError as e:
                if i == len(buckets) - 1:
                    raise  # ceiling bucket: a real data/config inconsistency
                print(f"face capacity {cap} overflowed (need {e.required}); "
                      f"escalating to bucket {buckets[i + 1]}")
                continue
            return batch

    def run_multimodal(self, aux_ds, train_ds, valid_ds, test_ds,
                       pretrained_swin=None, resume: bool = False) -> float:
        """T+A+V multi-task training (reference train.py:297-421).
        resume=True restarts from the latest epoch checkpoint."""
        cfg, opt = self.cfg, self.cfg.optim
        model = FacialMMTPipeline(cfg, dtype=self.dtype)
        state, swin_tx, mm_tx, steps_per_epoch, trg_bsz = \
            self._init_multitask_state(model, train_ds, len(aux_ds),
                                       pretrained_swin,
                                       self._pretrained_text_tower())
        # donate the state in both task steps: params + optimizer moments for
        # the large text tower would otherwise be double-buffered (~6 GB extra)
        aux_step = jax.jit(make_aux_train_step(model, swin_tx),
                           donate_argnums=(0,))
        # joint training at accumulation > 1 runs the microbatch-scan step so
        # the Swin backward fits memory at full effective batch (VERDICT r1
        # weak #3); otherwise accumulation is one larger fused device batch
        accum = max(opt.trg_accumulation_steps, 1)
        use_micro = cfg.swin_from_target and accum > 1
        if use_micro:
            from facialmmt_tpu.train.steps import (
                make_multimodal_train_step_accum)

            trg_step = jax.jit(
                make_multimodal_train_step_accum(model, swin_tx, mm_tx,
                                                 swin_from_target=True),
                donate_argnums=(0,))
        else:
            trg_step = jax.jit(
                make_multimodal_train_step(
                    model, swin_tx, mm_tx,
                    swin_from_target=cfg.swin_from_target),
                donate_argnums=(0,))
        eval_step = jax.jit(make_multimodal_eval_step(
            model, sample_gumbel=not cfg.runtime.deterministic_gumbel,
            face_chunk=cfg.runtime.eval_face_chunk))

        buckets = self._face_buckets(trg_bsz)
        if use_micro:
            micro_bsz = opt.trg_batch_size
            buckets_m = self._face_buckets(micro_bsz)

            def make_trg_batch(idx):
                chunks = [idx[i * micro_bsz:(i + 1) * micro_bsz]
                          for i in range(accum)]

                # all microbatches must share one capacity (np.stack), so an
                # overflow in ANY chunk escalates the whole fetch
                def fetch(cap):
                    subs = [train_ds.get_batch(c, face_capacity=cap)
                            for c in chunks]
                    return {k: np.stack([s[k] for s in subs])
                            for k in subs[0]}

                return self._batch_with_escalation(fetch, buckets_m)
        else:
            def make_trg_batch(idx):
                return self._batch_with_escalation(
                    lambda cap: train_ds.get_batch(idx, face_capacity=cap),
                    buckets)
        trg_loader = PrefetchLoader(
            make_trg_batch,
            len(train_ds), trg_bsz, shuffle=True, seed=cfg.runtime.seed)
        aux_bsz = opt.aux_batch_size * max(opt.aux_accumulation_steps, 1)
        aux_loader = PrefetchLoader(
            lambda idx: aux_ds.get_batch(idx), len(aux_ds),
            aux_bsz, shuffle=True, seed=cfg.runtime.seed + 1)

        ckpt = CheckpointManager(cfg.runtime.save_model_path)
        best_f1 = -1.0  # see run_unimodal note on the reference's 0-init crash
        best_val_loss = float("inf")  # early stopping (appendix train.py:114-152)
        patience_counter = 0
        start_epoch = 1
        resume_prog = {"aux_batch": 0, "trg_batch": 0}
        if resume:
            state, bf, start_epoch, resume_prog, es = self._restore_latest(
                ckpt, state, resume_prog)
            if bf is not None:
                best_f1 = bf
            best_val_loss = es["best_val_loss"]
            patience_counter = es["patience_counter"]
        for epoch in range(start_epoch, opt.num_epochs + 1):
            first = epoch == start_epoch
            aux_sb = resume_prog["aux_batch"] if first else 0
            trg_sb = resume_prog["trg_batch"] if first else 0
            # a preempt during the trg pass marks the aux pass complete
            if first and trg_sb > 0:
                aux_sb = len(aux_loader)
            # ---- auxiliary FER pass (reference train.py:356-363) ----
            start = time.time()
            timer = StepTimer()
            for i, (ab, n_valid) in enumerate(
                    aux_loader.epoch(epoch, start_batch=aux_sb),
                    start=aux_sb):
                images, labels = ab
                images, labels = self._place_batch_best_effort(
                    (jnp.asarray(images, jnp.float32), jnp.asarray(labels)))
                images = affwild2_train_augment(
                    self._next_rng(), images,
                    img_size=cfg.data.swin_img_size).astype(self.dtype)
                state, loss = aux_step(state, images, labels,
                                       self._next_rng())
                self.profiler.step()
                timer.update(float(loss), n_valid)
                self._maybe_preempt(
                    ckpt, state, best_f1, epoch,
                    {"aux_batch": i + 1, "trg_batch": 0},
                    {"best_val_loss": best_val_loss,
                     "patience_counter": patience_counter})
                if i % cfg.runtime.aux_log_interval == 0 and i > 0:
                    ms, avg = timer.interval_stats(cfg.runtime.aux_log_interval)
                    self.writer.log_train("SRC", epoch, i, len(aux_loader),
                                          ms, avg)
                    timer.reset()
            print("-" * 50)
            print(f"**SRC** | Epoch {epoch:2d} | Time "
                  f"{(time.time() - start) / 3600:5.4f} hour")
            print("-" * 50)

            # ---- target multimodal pass (reference train.py:364-374) ----
            start = time.time()
            timer = StepTimer()
            for i, (batch, n_valid) in enumerate(
                    trg_loader.epoch(epoch, start_batch=trg_sb),
                    start=trg_sb):
                device_batch = self._prepare_faces(batch, train=True)
                state, loss = trg_step(state, device_batch, self._next_rng())
                self.profiler.step()
                timer.update(float(loss), n_valid)
                self._maybe_preempt(
                    ckpt, state, best_f1, epoch,
                    {"aux_batch": len(aux_loader), "trg_batch": i + 1},
                    {"best_val_loss": best_val_loss,
                     "patience_counter": patience_counter})
                if i % cfg.runtime.trg_log_interval == 0 and i > 0:
                    ms, avg = timer.interval_stats(cfg.runtime.trg_log_interval)
                    self.writer.log_train("TRG", epoch, i, steps_per_epoch,
                                          ms, avg)
                    timer.reset()
            logits, labels, val_loss = self._eval_multimodal(
                eval_step, state.params, state.batch_stats, valid_ds,
                return_loss=True)
            val_f1 = eval_meld(logits, labels, test=False)
            self.writer.log_eval(epoch, (time.time() - start) / 3600, val_f1)
            if val_f1 > best_f1:
                best_f1 = val_f1
                ckpt.save_best({"params": state.params,
                                "batch_stats": state.batch_stats}, epoch)
            # update the early-stopping counters BEFORE the epoch checkpoint
            # so a resumed run carries them (exact-resume contract)
            if opt.patience > 0:  # appendix early stopping on val loss
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    patience_counter = 0
                else:
                    patience_counter += 1
            ckpt.save_step(
                self._ckpt_payload(state, best_f1, epoch,
                                   {"aux_batch": 0, "trg_batch": 0},
                                   {"best_val_loss": best_val_loss,
                                    "patience_counter": patience_counter}),
                epoch)
            if opt.patience > 0 and patience_counter >= opt.patience:
                print(f"Validation loss has not descended for "
                      f"{opt.patience} epochs. Stopping training.")
                break

        self.profiler.close()
        best = ckpt.restore_best({"params": state.params,
                                  "batch_stats": state.batch_stats})
        logits, labels = self._eval_multimodal(
            eval_step, best["params"], best["batch_stats"], test_ds)
        test_f1 = eval_meld(logits, labels, test=True)
        self.writer.log_test(test_f1)
        return test_f1

    def eval_multimodal_only(self, params, batch_stats, test_ds,
                             batch_size: int = 16) -> float:
        """doEval path from converted checkpoints (reference train.py:424-434)."""
        cfg = self.cfg
        model = FacialMMTPipeline(cfg, dtype=self.dtype)
        eval_step = jax.jit(make_multimodal_eval_step(
            model, sample_gumbel=not cfg.runtime.deterministic_gumbel,
            face_chunk=cfg.runtime.eval_face_chunk))
        logits, labels = self._eval_multimodal(eval_step, params, batch_stats,
                                               test_ds, batch_size)
        test_f1 = eval_meld(logits, labels, test=True)
        self.writer.log_test(test_f1)
        return test_f1

    def _eval_multimodal(self, eval_step, params, batch_stats, ds,
                         batch_size: int = 16, return_loss: bool = False):
        buckets = self._face_buckets(batch_size)
        loader = PrefetchLoader(
            lambda idx: self._batch_with_escalation(
                lambda cap: ds.get_batch(idx, face_capacity=cap), buckets),
            len(ds), batch_size, shuffle=False)
        logits_all, labels_all = [], []
        loss_sum, n_sum = 0.0, 0
        for batch, n_valid in loader.epoch(0):
            device_batch = self._prepare_faces(batch, train=False)
            logits, loss = eval_step(params, batch_stats, device_batch,
                                     self._next_rng())
            loss_sum += float(loss) * n_valid
            n_sum += n_valid
            logits_all.append(np.asarray(logits)[:n_valid])
            labels_all.append(np.asarray(batch["labels"])[:n_valid])
        logits_cat = np.concatenate(logits_all)
        labels_cat = np.concatenate(labels_all)
        if return_loss:
            return logits_cat, labels_cat, loss_sum / max(n_sum, 1)
        return logits_cat, labels_cat


class TextTrainer(Trainer):
    """Feature-modality experiment driver: choice_modality 'T' (the
    appendix's unimodal text, reference (Appendix)CCAC2023/utils/dataset.py:
    112-147) and the M3ED-style precomputed-feature subsets 'T+A' / 'T+V' /
    'T+A+V' (vision = raw extractor features, no faces/FER branch —
    reference :165-302), all with the same loop shape as the other tasks."""

    def _build_text_model(self):
        from facialmmt_tpu.models.multimodal import (
            MultiModalTransformerForClassification)

        modality = (self.cfg.choice_modality
                    if self.cfg.choice_modality in
                    ("T", "T+A", "T+V", "T+A+V") else "T")
        return MultiModalTransformerForClassification(
            self.cfg.replace(choice_modality=modality), dtype=self.dtype)

    def _init_text_params(self, model, ds, bsz, text_params=None):
        from facialmmt_tpu.train.steps import _feature_kwargs

        sample = {k: jnp.asarray(v) for k, v in ds.get_batch([0] * bsz).items()}
        params = jax.jit(model.init)(
            self._next_rng(), sample["dia_input_ids"],
            sample["dia_input_mask"], sample["dia_sep_mask"],
            utt_in_dia_idx=sample["utt_in_dia_idx"],
            dia_idx=sample["dia_idx"], **_feature_kwargs(sample))["params"]
        if text_params is not None:  # pretrained PLM ((Appendix) src/models.py:51)
            params = dict(params)
            params["text_encoder"] = graft_subtree(
                params["text_encoder"], text_params, "text tower")
        return params

    def _evaluate_text(self, eval_step, params, ds, bsz):
        loader = PrefetchLoader(ds.get_batch, len(ds), bsz, shuffle=False)
        logits_all, labels_all = [], []
        loss_sum, n_sum = 0.0, 0
        for batch, n_valid in loader.epoch(0):
            placed = self._place_batch(
                {k: jnp.asarray(v) for k, v in batch.items()})
            logits, loss = eval_step(params, placed)
            logits_all.append(np.asarray(logits)[:n_valid])
            labels_all.append(np.asarray(batch["labels"])[:n_valid])
            loss_sum += float(loss) * n_valid
            n_sum += n_valid
        return (np.concatenate(logits_all), np.concatenate(labels_all),
                loss_sum / max(n_sum, 1))

    def run_text(self, train_ds, valid_ds, test_ds,
                 use_macro_f1: bool = True, resume: bool = False) -> float:
        """resume=True restarts from the latest epoch checkpoint; the
        early-stopping counters ride the checkpoint, so a resumed run stops
        at the same epoch an uninterrupted one would."""
        from facialmmt_tpu.train.metrics import macro_f1, weighted_f1
        from facialmmt_tpu.train.steps import (make_text_eval_step,
                                               make_text_train_step)

        cfg, opt = self.cfg, self.cfg.optim
        model = self._build_text_model()
        bsz = self._effective_batch()
        loader = PrefetchLoader(train_ds.get_batch, len(train_ds), bsz,
                                shuffle=True, seed=cfg.runtime.seed)
        total = max(opt.num_epochs * len(loader), 1)
        tx = make_optimizer(opt, opt.trg_lr, total, opt.weight_decay)
        params = self._init_text_params(model, train_ds, bsz,
                                        self._pretrained_text_tower())
        state = self._place_state(SingleTaskState.create(params, tx))
        train_step = jax.jit(make_text_train_step(model, tx),
                             donate_argnums=(0,))
        eval_step = jax.jit(make_text_eval_step(model))

        metric = macro_f1 if use_macro_f1 else weighted_f1
        ckpt = CheckpointManager(cfg.runtime.save_model_path)
        best_f1 = -1.0
        best_val_loss = float("inf")
        patience_counter = 0
        start_epoch, resume_batch = 1, 0
        if resume:
            state, bf, start_epoch, prog, es = self._restore_latest(
                ckpt, state, {"batch": 0})
            if bf is not None:
                best_f1 = bf
            resume_batch = prog["batch"]
            best_val_loss = es["best_val_loss"]
            patience_counter = es["patience_counter"]
        for epoch in range(start_epoch, opt.num_epochs + 1):
            sb = resume_batch if epoch == start_epoch else 0
            for i, (batch, _) in enumerate(
                    loader.epoch(epoch, start_batch=sb), start=sb):
                placed = self._place_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()})
                state, loss = train_step(state, placed, self._next_rng())
                self.profiler.step()
                self._maybe_preempt(ckpt, state, best_f1, epoch,
                                    {"batch": i + 1},
                                    {"best_val_loss": best_val_loss,
                                     "patience_counter": patience_counter})
            logits, labels, val_loss = self._evaluate_text(
                eval_step, state.params, valid_ds, bsz)
            val_f1 = metric(labels, logits.argmax(-1))
            self.writer.log_eval(epoch, 0.0, val_f1)
            if val_f1 > best_f1:
                best_f1 = val_f1
                ckpt.save_best({"params": state.params}, epoch)
            # update the early-stopping counters BEFORE the epoch checkpoint
            # so a resumed run carries them (exact-resume contract)
            if opt.patience > 0:
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    patience_counter = 0
                else:
                    patience_counter += 1
            ckpt.save_step(
                self._ckpt_payload(state, best_f1, epoch, {"batch": 0},
                                   {"best_val_loss": best_val_loss,
                                    "patience_counter": patience_counter}),
                epoch)
            if opt.patience > 0 and patience_counter >= opt.patience:
                print(f"Validation loss has not descended for "
                      f"{opt.patience} epochs. Stopping training.")
                break

        self.profiler.close()
        best = ckpt.restore_best({"params": state.params})
        logits, labels, _ = self._evaluate_text(
            eval_step, best["params"], test_ds, bsz)
        test_f1 = metric(labels, logits.argmax(-1))
        self.writer.log_test(test_f1)
        return test_f1

    def eval_text_only(self, test_ds, ckpt_dir: Optional[str] = None,
                       submission_template: str = "",
                       submission_out: str = "",
                       pred_dump_path: str = "",
                       use_macro_f1: bool = True) -> float:
        """doEval path for the utterance-level models.  The reference fills
        the competition submission CSV and writes the 'pred true' dump for
        the UTT granularity too (reference (Appendix)CCAC2023/train.py:
        166-196, utt branch at :167-171; dump at utils/eval_metrics.py:22-35),
        so this mirrors DialogueTrainer.eval_dialogue_only's plumbing."""
        import os

        from facialmmt_tpu.train.metrics import macro_f1, weighted_f1
        from facialmmt_tpu.train.steps import make_text_eval_step
        from facialmmt_tpu.utils.submission import (write_pred_true_dump,
                                                    write_submission_csv)

        cfg = self.cfg
        model = self._build_text_model()
        bsz = self._effective_batch()
        params = self._init_text_params(model, test_ds, bsz)
        ckpt = CheckpointManager(ckpt_dir or cfg.runtime.save_model_path)
        params = jax.tree.map(
            jnp.asarray, ckpt.restore_best({"params": params})["params"])
        eval_step = jax.jit(make_text_eval_step(model))
        logits, labels, _ = self._evaluate_text(eval_step, params, test_ds,
                                                bsz)
        preds = logits.argmax(-1)
        if submission_template and not os.path.exists(submission_template):
            # fail loudly: a typo'd template path must not silently produce
            # an F1-only run with the competition artifact missing
            raise FileNotFoundError(
                f"--submission_template not found: {submission_template}")
        if submission_template:
            out = submission_out or os.path.join(
                cfg.runtime.save_model_path, "nustm_submission.csv")
            write_submission_csv(logits, submission_template, out)
            print(f"submission written: {out}")
        if pred_dump_path:
            correct = write_pred_true_dump(preds, labels, pred_dump_path)
            print(f"pred/true dump: {pred_dump_path} "
                  f"({correct}/{len(preds)} correct)")
        metric = macro_f1 if use_macro_f1 else weighted_f1
        test_f1 = metric(labels, preds)
        self.writer.log_test(test_f1)
        return test_f1


class DialogueTrainer(Trainer):
    """Dialogue-level experiment driver (appendix --uttORdia dia,
    reference (Appendix)CCAC2023/train.py:100-194).

    Runs over the same dp x tp mesh as the utterance-level trainer (the
    reference has no distributed story — SURVEY.md §5.8 makes this the
    framework's own bar)."""

    def _effective_batch(self) -> int:
        # one sample = one dialogue; no accumulation batching here
        return max(self.cfg.optim.trg_batch_size, 1)

    def _build_model(self):
        from facialmmt_tpu.models.dialogue import DialogueMultiModalTransformer

        return DialogueMultiModalTransformer(self.cfg, dtype=self.dtype)

    def _init_dialogue_params(self, model, ds, bsz, text_params=None):
        sample = {k: jnp.asarray(v) for k, v in ds.get_batch([0] * bsz).items()}
        params = jax.jit(model.init)(
            self._next_rng(), sample["dia_input_ids"],
            sample["dia_input_mask"], sample["dia_sep_mask"],
            sample["audio_inputs"], sample["audio_mask"],
            sample["vision_inputs"], sample["vision_mask"],
            sample["dia_mask"])["params"]
        if text_params is not None:  # pretrained PLM ((Appendix) src/models.py:262)
            params = dict(params)
            params["text_encoder"] = graft_subtree(
                params["text_encoder"], text_params, "text tower")
        return params

    def _evaluate_dialogue(self, eval_step, params, ds, bsz):
        """Returns (preds, trues, valid_logits, mean_loss); preds/logits are
        mask-selected in dataset order — the utterance order the submission
        CSV expects (reference (Appendix)CCAC2023/train.py:162-186)."""
        l = PrefetchLoader(ds.get_batch, len(ds), bsz, shuffle=False)
        preds, trues, logits_all = [], [], []
        loss_sum, n_sum = 0.0, 0
        for batch, n_valid in l.epoch(0):
            device_batch = self._place_batch(
                {k: jnp.asarray(v) for k, v in batch.items()})
            logits, loss = eval_step(params, device_batch)
            logits = np.asarray(logits)[:n_valid]
            mask = np.asarray(batch["dia_mask"])[:n_valid].astype(bool)
            labels = np.asarray(batch["labels"])[:n_valid]
            logits_all.append(logits[mask])
            preds.append(logits[mask].argmax(-1))
            trues.append(labels[mask])
            loss_sum += float(loss) * n_valid
            n_sum += n_valid
        return (np.concatenate(preds), np.concatenate(trues),
                np.concatenate(logits_all), loss_sum / max(n_sum, 1))

    def run_dialogue(self, train_ds, valid_ds, test_ds,
                     use_macro_f1: bool = True, resume: bool = False) -> float:
        """resume=True restarts from the latest epoch checkpoint; the
        early-stopping counters ride the checkpoint (see run_text)."""
        from facialmmt_tpu.train.metrics import macro_f1, weighted_f1
        from facialmmt_tpu.train.steps import (make_dialogue_eval_step,
                                               make_dialogue_train_step)

        cfg, opt = self.cfg, self.cfg.optim
        model = self._build_model()
        bsz = self._effective_batch()
        loader = PrefetchLoader(train_ds.get_batch, len(train_ds), bsz,
                                shuffle=True, seed=cfg.runtime.seed)
        total = max(opt.num_epochs * len(loader), 1)
        tx = make_optimizer(opt, opt.trg_lr, total, opt.weight_decay)

        params = self._init_dialogue_params(model, train_ds, bsz,
                                            self._pretrained_text_tower())
        state = self._place_state(SingleTaskState.create(params, tx))
        train_step = jax.jit(make_dialogue_train_step(model, tx),
                             donate_argnums=(0,))
        eval_step = jax.jit(make_dialogue_eval_step(model))

        metric = macro_f1 if use_macro_f1 else weighted_f1
        ckpt = CheckpointManager(cfg.runtime.save_model_path)
        best_f1 = -1.0
        best_val_loss = float("inf")
        patience_counter = 0
        start_epoch, resume_batch = 1, 0
        if resume:
            state, bf, start_epoch, prog, es = self._restore_latest(
                ckpt, state, {"batch": 0})
            if bf is not None:
                best_f1 = bf
            resume_batch = prog["batch"]
            best_val_loss = es["best_val_loss"]
            patience_counter = es["patience_counter"]
        for epoch in range(start_epoch, opt.num_epochs + 1):
            sb = resume_batch if epoch == start_epoch else 0
            for i, (batch, _) in enumerate(
                    loader.epoch(epoch, start_batch=sb), start=sb):
                device_batch = self._place_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()})
                state, loss = train_step(state, device_batch,
                                         self._next_rng())
                self.profiler.step()
                self._maybe_preempt(ckpt, state, best_f1, epoch,
                                    {"batch": i + 1},
                                    {"best_val_loss": best_val_loss,
                                     "patience_counter": patience_counter})
            preds, trues, _, val_loss = self._evaluate_dialogue(
                eval_step, state.params, valid_ds, bsz)
            val_f1 = metric(trues, preds)
            self.writer.log_eval(epoch, 0.0, val_f1)
            if val_f1 > best_f1:
                best_f1 = val_f1
                ckpt.save_best({"params": state.params}, epoch)
            # counters update BEFORE the epoch checkpoint (exact resume)
            if opt.patience > 0:
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    patience_counter = 0
                else:
                    patience_counter += 1
            ckpt.save_step(
                self._ckpt_payload(state, best_f1, epoch, {"batch": 0},
                                   {"best_val_loss": best_val_loss,
                                    "patience_counter": patience_counter}),
                epoch)
            if opt.patience > 0 and patience_counter >= opt.patience:
                print(f"Validation loss has not descended for "
                      f"{opt.patience} epochs. Stopping training.")
                break

        self.profiler.close()
        best = ckpt.restore_best({"params": state.params})
        preds, trues, _, _ = self._evaluate_dialogue(
            eval_step, best["params"], test_ds, bsz)
        test_f1 = metric(trues, preds)
        self.writer.log_test(test_f1)
        return test_f1

    def eval_dialogue_only(self, test_ds, ckpt_dir: Optional[str] = None,
                           submission_template: str = "",
                           submission_out: str = "",
                           pred_dump_path: str = "",
                           use_macro_f1: bool = True) -> float:
        """doEval path for the dia-level model (reference
        (Appendix)CCAC2023/train.py:156-194): restore the best checkpoint,
        predict the test split in order, fill the competition submission CSV
        (argmax -> emotion names) and write the 'pred true' dump."""
        import os

        from facialmmt_tpu.train.metrics import macro_f1, weighted_f1
        from facialmmt_tpu.train.steps import make_dialogue_eval_step
        from facialmmt_tpu.utils.submission import (write_pred_true_dump,
                                                    write_submission_csv)

        cfg = self.cfg
        model = self._build_model()
        bsz = self._effective_batch()
        params = self._init_dialogue_params(model, test_ds, bsz)
        ckpt = CheckpointManager(ckpt_dir or cfg.runtime.save_model_path)
        params = jax.tree.map(
            jnp.asarray, ckpt.restore_best({"params": params})["params"])
        if self.plan is not None:
            from facialmmt_tpu.parallel.mesh import replicate

            params = jax.device_put(
                params, jax.tree.map(lambda _: replicate(self.plan), params))
        eval_step = jax.jit(make_dialogue_eval_step(model))

        preds, trues, logits, _ = self._evaluate_dialogue(
            eval_step, params, test_ds, bsz)
        if submission_template and not os.path.exists(submission_template):
            # fail loudly: a typo'd template path must not silently produce
            # an F1-only run with the competition artifact missing
            raise FileNotFoundError(
                f"--submission_template not found: {submission_template}")
        if submission_template:
            out = submission_out or os.path.join(
                cfg.runtime.save_model_path, "nustm_submission.csv")
            write_submission_csv(logits, submission_template, out)
            print(f"submission written: {out}")
        if pred_dump_path:
            correct = write_pred_true_dump(preds, trues, pred_dump_path)
            print(f"pred/true dump: {pred_dump_path} "
                  f"({correct}/{len(preds)} correct)")
        metric = macro_f1 if use_macro_f1 else weighted_f1
        test_f1 = metric(trues, preds)
        self.writer.log_test(test_f1)
        return test_f1
