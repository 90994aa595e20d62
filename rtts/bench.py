"""Benchmark harness (SURVEY.md §7, BASELINE.md).

Primary metrics:
- AR decode throughput: mel frames / sec / chip (batched greedy decode)
- end-to-end text->wav real-time factor (RTF) per chip; target < 0.05

The reference publishes no numbers (BASELINE.json "published": {}), so
``vs_baseline`` is reported against the driver's north-star RTF target:
vs_baseline = target_rtf / measured_rtf  (> 1.0 means beating the target).

All timing uses a blocking sync on a concrete output array after a compile
warmup (SURVEY.md §6.1).  (Note: on the axon-tunneled TPU backend,
block_until_ready on a *tuple* was observed returning early; _sync blocks
on a single leaf, which measures correctly.)
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config

TARGET_RTF = 0.05


def _sync(x):
    """Force real completion by fetching one element to the host.

    Measured on the axon-tunneled TPU backend: jax.block_until_ready
    returns immediately (0.2 ms) while the computation is still running;
    a 1-element device->host fetch waits for the true completion (and
    costs ~1 ms itself, negligible at bench scales)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
    return x
# mel frame rate of real-time audio: sample_rate / hop
def _frame_rate(cfg: Config) -> float:
    return cfg.dataset.audio.sample_rate / cfg.dataset.audio.hop_length


def base_bench_config() -> Config:
    """BASELINE config 1: base LSH (4 hashes, chunk 64), batch-8 synthesis."""
    from rtts.config import from_dict
    from rtts.text import vocab_size

    return from_dict(Config, {
        "model": {
            "vocab_size": vocab_size(),
            "d_model": 256,
            "n_mels": 80,
            "encoder": {"num_layers": 4, "d_model": 256, "d_ff": 1024,
                        "reversible": True, "causal": False,
                        "attention": {"kind": "lsh", "num_heads": 4,
                                      "head_dim": 64, "num_hashes": 4,
                                      "chunk_length": 64}},
            "decoder": {"num_layers": 4, "d_model": 256, "d_ff": 1024,
                        "reversible": True, "causal": True,
                        "attention": {"kind": "full", "num_heads": 4,
                                      "head_dim": 64, "num_hashes": 4,
                                      "chunk_length": 64}},
            "dec_prenet_hidden": 256,
            "max_pos": 4096,
            "compute_dtype": "bfloat16",
        },
    })


def _build(cfg: Config):
    from rtts.models import reformer_tts as M

    params = M.init(jax.random.PRNGKey(0), cfg.model)
    return params


def bench_decode(cfg: Optional[Config] = None, batch: int = 8,
                 token_len: int = 256, max_frames: int = 512,
                 repeats: int = 3) -> Dict[str, Any]:
    """Batched greedy AR decode throughput: mel frames/sec/chip."""
    from rtts.infer.decode import decode_greedy
    from rtts.models import reformer_tts as M

    cfg = cfg or base_bench_config()
    params = _build(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, token_len),
                                3, cfg.model.vocab_size)
    tmask = jnp.ones((batch, token_len), bool)

    @jax.jit
    def run(p, tok, msk):
        memory = M.encode(p, cfg.model, tok, msk, deterministic=True)
        # stop_threshold > 1: force a full-length decode for stable timing
        return decode_greedy(p, cfg.model, memory, msk,
                             max_frames=max_frames, stop_threshold=2.0)

    mel, lengths, _ = _sync(run(params, tokens, tmask))  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(params, tokens, tmask))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    frames = batch * max_frames
    return {
        "frames_per_sec": frames / dt,
        "decode_seconds": dt,
        "batch": batch,
        "max_frames": max_frames,
        "device": str(jax.devices()[0]),
    }


def bench_e2e(cfg: Optional[Config] = None, batch: int = 8,
              token_len: int = 256, max_frames: int = 512,
              repeats: int = 3, use_vocoder: bool = True) -> Dict[str, Any]:
    """text->wav RTF: wall time / audio duration produced (per chip)."""
    from rtts.infer.decode import decode_greedy
    from rtts.models import reformer_tts as M
    from rtts.models import squeezewave as SW

    cfg = cfg or base_bench_config()
    params = _build(cfg)
    voc_params = SW.fold_weightnorm(SW.init(jax.random.PRNGKey(2), cfg.vocoder)) \
        if use_vocoder else None
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, token_len),
                                3, cfg.model.vocab_size)
    tmask = jnp.ones((batch, token_len), bool)

    @jax.jit
    def run(p, vp, tok, msk):
        memory = M.encode(p, cfg.model, tok, msk, deterministic=True)
        mel, lengths, _ = decode_greedy(p, cfg.model, memory, msk,
                                        max_frames=max_frames,
                                        stop_threshold=2.0)
        if vp is not None:
            audio = SW.infer(vp, cfg.vocoder, mel, rng=jax.random.PRNGKey(0),
                             folded=True)
        else:
            audio = mel  # no vocoder: mel only
        return audio

    out = _sync(run(params, voc_params, tokens, tmask))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(params, voc_params, tokens, tmask))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * max_frames / _frame_rate(cfg)
    rtf = dt / audio_seconds
    return {
        "rtf": rtf,
        "wall_seconds": dt,
        "audio_seconds": audio_seconds,
        "batch": batch,
        "max_frames": max_frames,
        "vocoder": bool(use_vocoder),
        "device": str(jax.devices()[0]),
    }


def bench_vocoder(cfg: Optional[Config] = None, batch: int = 8,
                  mel_frames: int = 512, repeats: int = 3) -> Dict[str, Any]:
    from rtts.models import squeezewave as SW

    cfg = cfg or base_bench_config()
    voc = cfg.vocoder
    params = SW.fold_weightnorm(SW.init(jax.random.PRNGKey(0), voc))
    mel = jax.random.normal(jax.random.PRNGKey(1), (batch, mel_frames, voc.n_mels))

    run = jax.jit(lambda p, m: SW.infer(p, voc, m, rng=jax.random.PRNGKey(0),
                                        folded=True))
    _sync(run(params, mel))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(params, mel))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * mel_frames * voc.hop_length / voc.sample_rate
    return {"vocoder_rtf": dt / audio_seconds, "wall_seconds": dt,
            "audio_seconds": audio_seconds}


def bench_train_step(cfg: Optional[Config] = None, batch: int = 8,
                     token_len: int = 256, mel_len: int = 512,
                     repeats: int = 3) -> Dict[str, Any]:
    from rtts.models import reformer_tts as M
    from rtts.train.losses import make_stop_target, tts_loss
    from rtts.train.optim import make_optimizer
    import optax

    cfg = cfg or base_bench_config()
    params = _build(cfg)
    optimizer = make_optimizer(cfg.experiment.optim)
    opt_state = optimizer.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, token_len),
                                3, cfg.model.vocab_size)
    tmask = jnp.ones((batch, token_len), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (batch, mel_len,
                                                    cfg.model.n_mels))
    mmask = jnp.ones((batch, mel_len), bool)

    @jax.jit
    def step(p, s, rng):
        def loss_fn(p):
            pre, post, stop = M.forward(p, cfg.model, tokens, tmask, mel,
                                        mmask, rng=rng, deterministic=False)
            return tts_loss(pre, post, stop, mel, make_stop_target(mmask),
                            mmask)[0]
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rng = jax.random.PRNGKey(3)
    params, opt_state, _ = _sync(step(params, opt_state, rng))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        params, opt_state, loss = _sync(
            step(params, opt_state, jax.random.fold_in(rng, i)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {"train_step_seconds": dt,
            "frames_per_sec_train": batch * mel_len / dt}


def longform_bench_config() -> Config:
    """BASELINE config 5: 8k-frame mel synthesis stressing LSH bucketing
    (auto num_buckets=256 at L=8192) + decode throughput."""
    import dataclasses

    from rtts.config import from_dict

    cfg = base_bench_config()
    model = dataclasses.replace(
        cfg.model, max_pos=8192,
        decoder=dataclasses.replace(
            cfg.model.decoder,
            attention=dataclasses.replace(cfg.model.decoder.attention,
                                          kind="full")))
    return dataclasses.replace(cfg, model=model)


def bench_longform(cfg: Optional[Config] = None, batch: int = 2,
                   token_len: int = 1024, max_frames: int = 8192,
                   repeats: int = 2) -> Dict[str, Any]:
    """Long-form batched text->mel: 8k-frame AR decode per utterance."""
    cfg = cfg or longform_bench_config()
    r = bench_decode(cfg, batch=batch, token_len=token_len,
                     max_frames=max_frames, repeats=repeats)
    r["rtf"] = r["decode_seconds"] / (batch * max_frames / _frame_rate(cfg))
    return r


def run_bench(cfg: Optional[Config] = None, which: str = "e2e") -> str:
    """Returns the single JSON line the driver consumes."""
    cfg = cfg or base_bench_config()
    if which == "decode":
        r = bench_decode(cfg)
        line = {"metric": "mel_frames_per_sec_per_chip",
                "value": round(r["frames_per_sec"], 2), "unit": "frames/s",
                "vs_baseline": round(
                    r["frames_per_sec"] / (_frame_rate(cfg) / TARGET_RTF), 4),
                "detail": r}
    elif which == "e2e":
        r = bench_e2e(cfg)
        line = {"metric": "text_to_wav_rtf_per_chip", "value": round(r["rtf"], 5),
                "unit": "rtf", "vs_baseline": round(TARGET_RTF / r["rtf"], 4),
                "detail": r}
    elif which == "vocoder":
        r = bench_vocoder(cfg)
        line = {"metric": "vocoder_rtf", "value": round(r["vocoder_rtf"], 5),
                "unit": "rtf",
                "vs_baseline": round(TARGET_RTF / r["vocoder_rtf"], 4),
                "detail": r}
    elif which == "longform":
        r = bench_longform()
        line = {"metric": "longform_8k_decode_frames_per_sec",
                "value": round(r["frames_per_sec"], 2), "unit": "frames/s",
                "vs_baseline": round(TARGET_RTF / r["rtf"], 4),
                "detail": r}
    elif which == "train":
        r = bench_train_step(cfg)
        # anchor: multiples of real-time audio consumed per train second
        # (>1 = the step processes mel faster than the audio plays)
        line = {"metric": "train_frames_per_sec", "unit": "frames/s",
                "value": round(r["frames_per_sec_train"], 2),
                "vs_baseline": round(
                    r["frames_per_sec_train"] / _frame_rate(cfg), 4),
                "detail": r}
    else:
        raise ValueError(f"unknown bench {which!r}")
    return json.dumps(line)
