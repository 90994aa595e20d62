"""TTS training harness (SURVEY.md §3.1 #14, §4.1).

The reference wraps ReformerTTS in a PyTorch Lightning module; here the
harness is an explicit jit-compiled train step over a device mesh:

- params replicated, batch sharded over the ``data`` axis (SURVEY.md §3.4) —
  XLA inserts the gradient all-reduce over ICI from the shardings;
- teacher-forced forward, masked losses, global-norm clipping, Adam+Noam;
- eval logs val loss plus the reference's artifact discipline: a
  predicted-vs-target mel PNG and a rendered wav per eval;
- atomic checkpoints with top-k retention and resume.
"""

from __future__ import annotations

import pathlib
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rtts.config import Config
from rtts.data.dataset import (
    EpochBatcher,
    Manifest,
    TextMelDataset,
    split_manifest,
)
from rtts.models import reformer_tts as M
from rtts.parallel.mesh import initialize_distributed, make_mesh
from rtts.parallel.sharding import batch_sharding, replicated
from rtts.train.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from rtts.train.interrupt import GracefulStop, stop_requested_global
from rtts.train.losses import make_stop_target, tts_loss
from rtts.train.optim import lr_at_step, make_optimizer
from rtts.utils.metrics import MetricLogger


def make_train_step(model_cfg, optimizer):
    gal_w = model_cfg.guided_attention_weight
    gal_decay = model_cfg.guided_attention_decay_steps

    def train_step(params, opt_state, batch, rng, step=0):
        def loss_fn(p):
            sink = [] if gal_w > 0.0 else None
            pre, post, stop = M.forward(
                p, model_cfg, batch["tokens"], batch["token_mask"],
                batch["mel"], batch["mel_mask"], rng=rng, deterministic=False,
                attn_sink=sink)
            total, metrics = tts_loss(pre, post, stop, batch["mel"],
                                      make_stop_target(batch["mel_mask"]),
                                      batch["mel_mask"],
                                      model_cfg.stop_pos_weight)
            if sink is not None:
                from rtts.train.losses import guided_attention_loss

                gal = guided_attention_loss(
                    sink, batch["token_mask"], batch["mel_mask"],
                    model_cfg.reduction_factor,
                    model_cfg.guided_attention_sigma)
                w = jnp.float32(gal_w)
                if gal_decay > 0:
                    # linear anneal to 0 by guided_attention_decay_steps
                    w = w * jnp.clip(
                        1.0 - jnp.float32(step) / gal_decay, 0.0, 1.0)
                total = total + w * gal
                metrics = dict(metrics, loss=total, loss_guided_attn=gal)
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


def make_eval_step(model_cfg):
    def eval_step(params, batch):
        pre, post, stop = M.forward(
            params, model_cfg, batch["tokens"], batch["token_mask"],
            batch["mel"], batch["mel_mask"], deterministic=True)
        _, metrics = tts_loss(pre, post, stop, batch["mel"],
                              make_stop_target(batch["mel_mask"]),
                              batch["mel_mask"], model_cfg.stop_pos_weight)
        # objective quality scalars (SURVEY.md §6.5 / VERDICT r3 item 6):
        # spectral fidelity + teacher-forced stop-timing accuracy
        from rtts.train.quality import mel_cepstral_distortion, stop_length_mae

        metrics["mcd"] = mel_cepstral_distortion(post, batch["mel"],
                                                 batch["mel_mask"])
        metrics["stop_len_mae"] = stop_length_mae(
            stop, batch["mel_mask"], model_cfg.stop_threshold)
        return metrics, post

    return eval_step


def _shard_batch(batch: Dict[str, np.ndarray], mesh) -> Dict[str, jnp.ndarray]:
    """Shard the batch axis over ``data``; replicate when not divisible
    (ragged eval batches) — correctness first, XLA still partitions work."""
    dp = mesh.shape[next(iter(mesh.axis_names))]

    def put(v):
        if v.shape[0] % dp == 0:
            return jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
        return jax.device_put(v, replicated(mesh))

    return {k: put(v) for k, v in batch.items()}


def train_tts(cfg: Config, workdir: str, max_steps: Optional[int] = None,
              manifest_path: Optional[str] = None,
              stop: Optional[Any] = None) -> Dict[str, Any]:
    """Run TTS training; returns final metrics. Resumable.

    ``stop``: optional object with a ``stop_requested`` property, polled
    at every step boundary (injection point for tests / embedding hosts).
    When None, a :class:`GracefulStop` is installed so SIGTERM/SIGINT
    (cloud-TPU preemption, ctrl-C) checkpoint-and-exit cleanly instead
    of killing the run mid-step (SURVEY.md §6.3)."""
    import contextlib

    # the stop context wraps ALL of training (setup, compiles, the
    # step loop): a preemption signal during the first compile is as
    # real as one mid-run, and must not fall through to the default
    # handler (= process kill)
    stop_ctx = GracefulStop() if stop is None else contextlib.nullcontext(stop)
    with stop_ctx as stopper:
        work = pathlib.Path(workdir)
        work.mkdir(parents=True, exist_ok=True)
        exp = cfg.experiment
        max_steps = max_steps if max_steps is not None else exp.max_steps
        if exp.debug_nans:
            from rtts.utils.profiling import enable_nan_debugging

            enable_nan_debugging()

        from rtts.config import save_config
        if jax.process_index() == 0:
            save_config(cfg, work / "config.yaml")

        # -- data ---------------------------------------------------------------
        man = Manifest.load(manifest_path or
                            pathlib.Path(cfg.dataset.data_dir) / cfg.dataset.manifest)
        train_man, val_man = split_manifest(man, cfg.dataset.val_fraction,
                                            cfg.dataset.split_seed)
        train_ds = TextMelDataset(train_man, cfg.dataset)
        val_ds = TextMelDataset(val_man, cfg.dataset)
        # step->batch is a pure function (EpochBatcher), and the per-step RNG is
        # fold_in(key, step): together they make mid-epoch resume BIT-EXACT —
        # steps k..N of a resumed run replay the exact batches and dropout of an
        # uninterrupted run (tested in test_checkpoint.py)
        batcher = EpochBatcher(train_ds, cfg.dataset.batch_size,
                               seed=cfg.dataset.shuffle_seed,
                               drop_last=len(train_ds) > cfg.dataset.batch_size)

        # -- model / optimizer / mesh ------------------------------------------
        model_cfg = cfg.model
        if model_cfg.vocab_size <= 0:
            from rtts.text import frontend_vocab_size
            import dataclasses
            model_cfg = dataclasses.replace(
                model_cfg, vocab_size=frontend_vocab_size(cfg.dataset.text.level))
        initialize_distributed(exp.mesh)
        mesh = make_mesh(exp.mesh)
        optimizer = make_optimizer(exp.optim)

        rng = jax.random.PRNGKey(exp.seed)
        params = M.init(jax.random.PRNGKey(exp.seed), model_cfg)
        opt_state = optimizer.init(params)
        step0 = 0

        ckpt_dir = work / cfg.experiment.checkpoint.directory
        if exp.checkpoint.resume:
            latest = latest_checkpoint(ckpt_dir)
            if latest:
                restored, step0 = restore_checkpoint(
                    latest, {"params": params, "opt_state": opt_state})
                params, opt_state = restored["params"], restored["opt_state"]
                print(f"resumed from {latest} at step {step0}")

        with mesh:
            # TP when the mesh has a model axis > 1; ZeRO-1 moments on request
            from rtts.parallel.sharding import (make_param_shardings,
                                                opt_state_shardings)

            tp = exp.mesh.model_parallel > 1
            params = jax.device_put(
                params, make_param_shardings(params, mesh, tensor_parallel=tp))
            opt_state = jax.device_put(
                opt_state, opt_state_shardings(opt_state, mesh,
                                               tensor_parallel=tp,
                                               zero=exp.mesh.zero_sharding))
            train_step = jax.jit(make_train_step(model_cfg, optimizer),
                                 donate_argnums=(0, 1))
            eval_step = jax.jit(make_eval_step(model_cfg))

            # host IO (metrics, checkpoints, artifacts) is process-0 only;
            # every process still executes the SPMD train/eval computation
            is_main = jax.process_index() == 0
            if is_main:
                from rtts.config import to_dict
                from rtts.utils.tracking import make_tracker

                logger = MetricLogger(
                    str(work / exp.logging.jsonl_path),
                    exp.logging.tensorboard_dir,
                    tracker=make_tracker(exp.logging.tracker, exp.name,
                                         config=to_dict(cfg)))
            else:
                logger = None
            # async saves overlap the npz write with the next train steps;
            # _save snapshots to host first, so donation can't corrupt them
            saver = AsyncCheckpointer() if exp.checkpoint.async_save else None

            def _save(step, metric):
                state = {"params": params, "opt_state": opt_state}
                if saver is not None:
                    saver.save(ckpt_dir, state, step, metric=metric,
                               keep=exp.checkpoint.keep)
                else:
                    save_checkpoint(ckpt_dir, state, step, metric=metric,
                                    keep=exp.checkpoint.keep)

            last_metrics: Dict[str, Any] = {}
            t_last = time.time()
            for step in range(step0, max_steps):
                batch = _shard_batch(batcher.batch_at(step), mesh)
                sub = jax.random.fold_in(rng, step)
                # step rides as a traced scalar (a python int would
                # retrace every iteration)
                params, opt_state, metrics = train_step(
                    params, opt_state, batch, sub,
                    jnp.asarray(step, jnp.int32))

                if (step + 1) % exp.logging.log_every_steps == 0 or step == step0:
                    metrics = jax.device_get(metrics)
                    now = time.time()
                    metrics["steps_per_sec"] = (
                        exp.logging.log_every_steps / max(now - t_last, 1e-6))
                    metrics["lr"] = lr_at_step(exp.optim, step)
                    t_last = now
                    if is_main:
                        logger.log(step + 1, metrics, prefix="train/")
                    last_metrics = metrics

                saved = False
                if (step + 1) % exp.logging.eval_every_steps == 0 or step + 1 == max_steps:
                    val_metrics = _run_eval(cfg, model_cfg, eval_step, params,
                                            val_ds, mesh, work, step + 1,
                                            artifacts=is_main, logger=logger)
                    if is_main:
                        logger.log(step + 1, val_metrics, prefix="val/")
                        _save(step + 1,
                              metric=float(val_metrics.get("loss", 0.0)))
                        saved = True
                elif (step + 1) % exp.checkpoint.save_every_steps == 0:
                    # periodic save between evals (crash-resume granularity,
                    # SURVEY.md §6.4); unranked — top-k ranking stays on val loss
                    if is_main:
                        _save(step + 1, metric=None)
                        saved = True

                if stop_requested_global(stopper, step,
                                         exp.logging.log_every_steps):
                    # preemption / ctrl-C: checkpoint the completed step and
                    # leave cleanly; resume replays from here bit-exactly
                    if is_main and not saved:
                        _save(step + 1, metric=None)
                    last_metrics["interrupted_at_step"] = step + 1
                    if is_main:
                        print(f"stop requested: checkpointed step {step + 1}, "
                              "exiting cleanly (resume to continue)")
                    break
            if saver is not None:
                saver.wait()   # flush before anyone reads the directory back
            if is_main:
                logger.close()
        return last_metrics


def _run_eval(cfg, model_cfg, eval_step, params, val_ds, mesh, work,
              step, artifacts: bool = True, logger=None) -> Dict[str, float]:
    agg: Dict[str, float] = {}
    n = 0
    post_example = None
    batch_example = None
    for i, batch in enumerate(val_ds.batches(cfg.dataset.batch_size,
                                             shuffle=False)):
        if i >= cfg.experiment.eval_batches:
            break
        sharded = _shard_batch(batch, mesh)
        metrics, post = eval_step(params, sharded)
        metrics = jax.device_get(metrics)
        for k, v in metrics.items():
            agg[k] = agg.get(k, 0.0) + float(v)
        n += 1
        if post_example is None:
            post_example = np.asarray(post[0])
            batch_example = batch
    out = {k: v / max(n, 1) for k, v in agg.items()}

    # alignment quality scalars from the exact teacher-forced replay
    # (VERDICT r3 item 6) — batch-averaged over the first eval batch
    align = None
    if post_example is not None:
        try:
            from rtts.infer.diagnostics import alignment_map
            from rtts.train.quality import attention_diagonality

            align = np.asarray(alignment_map(
                params, model_cfg, jnp.asarray(batch_example["tokens"]),
                jnp.asarray(batch_example["token_mask"]),
                jnp.asarray(batch_example["mel"]),
                jnp.asarray(batch_example["mel_mask"])))
            r = model_cfg.reduction_factor
            diags, focuses = [], []
            for i in range(align.shape[0]):
                # ceil division: decode_train emits ceil(frames/r) groups,
                # so a partial final group is a valid scored row (ADVICE r4)
                n_rows = -(-int(batch_example["mel_mask"][i].sum()) // max(r, 1))
                d, f = attention_diagonality(
                    align[i], n_rows,
                    int(batch_example["token_mask"][i].sum()))
                diags.append(d)
                focuses.append(f)
            out["attn_diagonality"] = float(np.mean(diags))
            out["attn_focus"] = float(np.mean(focuses))
        except Exception as e:  # scalars must never kill training
            print(f"alignment quality scalars failed: {e}")

    # artifact discipline: predicted-vs-target mel PNG + rendered wav
    if post_example is not None and artifacts:
        try:
            from rtts.data.visualize import plot_spectrogram

            art = pathlib.Path(work) / cfg.experiment.logging.artifacts_dir
            t_len = int(batch_example["mel_mask"][0].sum())
            plot_spectrogram(post_example[:t_len],
                             str(art / f"mel_step{step}.png"),
                             title=f"predicted (step {step})",
                             target=batch_example["mel"][0][:t_len])
            # alignment diagnostic: head-averaged decoder cross-attention
            from rtts.data.visualize import plot_attention

            if align is not None:
                n_tok = int(batch_example["token_mask"][0].sum())
                plot_attention(align[0][:, :n_tok],
                               str(art / f"align_step{step}.png"),
                               title=f"cross-attention (step {step})")
            from rtts.audio.griffin import mel_to_audio
            from rtts.audio.wav import write_wav

            # Griffin-Lim uses complex FFT — not supported on every TPU
            # backend (observed on axon); render the artifact on CPU
            with jax.default_device(jax.devices("cpu")[0]):
                wav = np.asarray(mel_to_audio(
                    jnp.asarray(post_example[:t_len]), cfg.dataset.audio,
                    n_iter=8))
            write_wav(art / f"audio_step{step}.wav", wav,
                      cfg.dataset.audio.sample_rate)
            # waveform-domain fidelity vs GROUND-TRUTH audio (VERDICT r4
            # item 3).  The render is Griffin-Lim, so absolute values carry
            # a phase-reconstruction floor (suffix _gl); the magnitude-only
            # distance still tracks model fidelity across evals.  The first
            # eval batch is the first length-sorted chunk (batches() with
            # shuffle=False), so example 0 is the shortest val clip.
            from rtts.train.quality import multi_resolution_stft_distance

            order0 = min(range(len(val_ds)),
                         key=lambda i: val_ds.man.clips[i]["n_frames"])
            gt_audio = val_ds.store.load(
                val_ds.man.clips[order0]["clip"])["audio"]
            wf = multi_resolution_stft_distance(wav, gt_audio)
            out["mr_stft_gl"] = wf["mr_stft"]
            out["spectral_convergence_gl"] = wf["spectral_convergence"]
            if logger is not None:  # hosted-tracker copies (additive)
                for fname in (f"mel_step{step}.png", f"align_step{step}.png",
                              f"audio_step{step}.wav"):
                    if (art / fname).exists():
                        logger.log_artifact(art / fname)
        except Exception as e:  # artifacts must never kill training
            print(f"eval artifact generation failed: {e}")
    return out
