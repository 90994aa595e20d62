"""Vocoder training harness (SURVEY.md §3.1 #15, §4.2): flow NLL on
(mel window, audio crop) pairs; eval logs generated audio."""

from __future__ import annotations

import pathlib
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rtts.config import Config
from rtts.data.dataset import Manifest, MelAudioDataset, split_manifest
from rtts.models import squeezewave as SW
from rtts.parallel.mesh import initialize_distributed, make_mesh
from rtts.parallel.sharding import replicated
from rtts.train.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from rtts.train.interrupt import GracefulStop, stop_requested_global
from rtts.train.optim import lr_at_step, make_optimizer
from rtts.train.vocoder_loss import squeezewave_loss
from rtts.utils.metrics import MetricLogger


def make_train_step(voc_cfg, optimizer):
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            z, log_s, log_det = SW.forward(p, voc_cfg, batch["mel"],
                                           batch["audio"])
            return squeezewave_loss(z, log_s, log_det, voc_cfg.sigma)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


def make_eval_step(voc_cfg):
    def eval_step(params, batch):
        z, log_s, log_det = SW.forward(params, voc_cfg, batch["mel"],
                                       batch["audio"])
        _, metrics = squeezewave_loss(z, log_s, log_det, voc_cfg.sigma)
        return metrics

    return eval_step


def train_vocoder(cfg: Config, workdir: str, max_steps: Optional[int] = None,
                  manifest_path: Optional[str] = None,
                  stop: Optional[Any] = None) -> Dict[str, Any]:
    """Run vocoder training; resumable.  ``stop`` as in
    :func:`rtts.train.train_tts.train_tts` — None installs a
    :class:`GracefulStop` so SIGTERM/SIGINT checkpoint-and-exit."""
    import contextlib

    # wraps ALL of training incl. setup/compiles — see train_tts
    stop_ctx = GracefulStop() if stop is None else contextlib.nullcontext(stop)
    with stop_ctx as stopper:
        work = pathlib.Path(workdir)
        work.mkdir(parents=True, exist_ok=True)
        exp = cfg.experiment
        voc = cfg.vocoder
        max_steps = max_steps if max_steps is not None else exp.max_steps

        from rtts.config import save_config
        if jax.process_index() == 0:
            save_config(cfg, work / "config.yaml")

        man = Manifest.load(manifest_path or
                            pathlib.Path(cfg.dataset.data_dir) / cfg.dataset.manifest)
        train_man, val_man = split_manifest(man, cfg.dataset.val_fraction,
                                            cfg.dataset.split_seed)
        train_ds = MelAudioDataset(train_man, cfg.dataset, voc.audio_segment_length)
        val_ds = MelAudioDataset(val_man, cfg.dataset, voc.audio_segment_length)

        initialize_distributed(exp.mesh)
        mesh = make_mesh(exp.mesh)
        optimizer = make_optimizer(exp.optim)
        params = SW.init(jax.random.PRNGKey(exp.seed), voc)
        opt_state = optimizer.init(params)
        step0 = 0

        ckpt_dir = work / exp.checkpoint.directory
        if exp.checkpoint.resume:
            latest = latest_checkpoint(ckpt_dir)
            if latest:
                restored, step0 = restore_checkpoint(
                    latest, {"params": params, "opt_state": opt_state})
                params, opt_state = restored["params"], restored["opt_state"]
                print(f"resumed from {latest} at step {step0}")

        with mesh:
            # vocoder params replicate (conv trees match no TP rule); the Adam
            # moments can still ZeRO-shard over the data axis on request
            from rtts.parallel.sharding import opt_state_shardings

            params = jax.device_put(params, replicated(mesh))
            opt_state = jax.device_put(
                opt_state, opt_state_shardings(
                    opt_state, mesh, zero=cfg.experiment.mesh.zero_sharding))
            train_step = jax.jit(make_train_step(voc, optimizer),
                                 donate_argnums=(0, 1))
            eval_step = jax.jit(make_eval_step(voc))
            infer_jit = jax.jit(lambda p, mel, rng: SW.infer(p, voc, mel, rng=rng))

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
            saver = AsyncCheckpointer() if exp.checkpoint.async_save else None

            def _save(step, metric):
                state = {"params": params, "opt_state": opt_state}
                if saver is not None:
                    saver.save(ckpt_dir, state, step, metric=metric,
                               keep=exp.checkpoint.keep)
                else:
                    save_checkpoint(ckpt_dir, state, step, metric=metric,
                                    keep=exp.checkpoint.keep)

            last: Dict[str, Any] = {}
            t_last = time.time()
            from rtts.train.train_tts import _shard_batch

            for step in range(step0, max_steps):
                # crops drawn from a per-step generator: the data stream is a
                # pure function of the step counter, so resume is bit-exact
                crop_rng = np.random.default_rng((cfg.dataset.shuffle_seed, step))
                batch = _shard_batch(
                    train_ds.sample(crop_rng, cfg.dataset.batch_size), mesh)
                params, opt_state, metrics = train_step(params, opt_state, batch)

                if (step + 1) % exp.logging.log_every_steps == 0 or step == step0:
                    metrics = jax.device_get(metrics)
                    now = time.time()
                    metrics["steps_per_sec"] = (
                        exp.logging.log_every_steps / max(now - t_last, 1e-6))
                    metrics["lr"] = lr_at_step(exp.optim, step)
                    t_last = now
                    if is_main:
                        logger.log(step + 1, metrics, prefix="train/")
                    last = metrics

                saved = False
                if (step + 1) % exp.logging.eval_every_steps == 0 or step + 1 == max_steps:
                    # held-out flow NLL: checkpoint top-k ranks on THIS, not the
                    # noisy train loss (the crops are drawn with a fixed seed so
                    # the val metric is comparable across evals)
                    val_rng = np.random.default_rng(1234)
                    agg: Dict[str, float] = {}
                    n_val = 0
                    for _ in range(max(1, exp.eval_batches)):
                        vb = val_ds.sample(val_rng, cfg.dataset.batch_size)
                        vm = jax.device_get(eval_step(params, _shard_batch(vb, mesh)))
                        for k, v in vm.items():
                            agg[k] = agg.get(k, 0.0) + float(v)
                        n_val += 1
                    val_metrics = {k: v / n_val for k, v in agg.items()}
                    if is_main:
                        # waveform-domain fidelity (VERDICT r4 item 3): vocode
                        # one held-out batch, score vs the ground-truth crops
                        try:
                            from rtts.train.quality import (
                                multi_resolution_stft_distance)

                            vb = val_ds.sample(np.random.default_rng(1),
                                               cfg.dataset.batch_size)
                            wavs = np.asarray(infer_jit(
                                params, jnp.asarray(vb["mel"]),
                                jax.random.PRNGKey(0)))
                            ds_ = [multi_resolution_stft_distance(
                                wavs[i], vb["audio"][i])
                                for i in range(wavs.shape[0])]
                            for k in ("mr_stft", "spectral_convergence",
                                      "log_stft_l1"):
                                val_metrics[k] = float(
                                    np.mean([x[k] for x in ds_]))
                        except Exception as e:
                            print(f"waveform quality scalar failed: {e}")
                    last["val_loss_vocoder"] = val_metrics.get("loss_vocoder")
                    if is_main:
                        logger.log(step + 1, val_metrics, prefix="val/")
                        # artifact: render one validation mel window to audio
                        try:
                            vb = val_ds.sample(np.random.default_rng(0), 1)
                            wav = np.asarray(infer_jit(params, jnp.asarray(vb["mel"]),
                                                       jax.random.PRNGKey(0))[0])
                            from rtts.audio.wav import write_wav

                            art = work / exp.logging.artifacts_dir
                            write_wav(art / f"vocoder_step{step + 1}.wav",
                                      np.clip(wav, -1, 1), voc.sample_rate)
                        except Exception as e:
                            print(f"vocoder eval artifact failed: {e}")
                        _save(step + 1,
                              metric=float(val_metrics.get("loss_vocoder", 0.0)))
                        saved = True
                elif (step + 1) % exp.checkpoint.save_every_steps == 0:
                    # periodic save between evals (crash-resume granularity)
                    if is_main:
                        _save(step + 1, metric=None)
                        saved = True

                if stop_requested_global(stopper, step,
                                         exp.logging.log_every_steps):
                    # preemption / ctrl-C: checkpoint the completed step and
                    # leave cleanly; resume replays from here bit-exactly
                    if is_main and not saved:
                        _save(step + 1, metric=None)
                    last["interrupted_at_step"] = step + 1
                    if is_main:
                        print(f"stop requested: checkpointed step {step + 1}, "
                              "exiting cleanly (resume to continue)")
                    break
            if saver is not None:
                saver.wait()   # flush before anyone reads the directory back
            if is_main:
                logger.close()
        return last
