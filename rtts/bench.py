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
import functools
import json
import time
from typing import Any, Dict, Optional, Tuple

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


# -- MFU ----------------------------------------------------------------------
# Peak dense bf16 FLOP/s per chip (public spec sheets).
_PEAK_BF16_FLOPS = {
    "TPU v6": 918e12,       # v6e
    "TPU v5p": 459e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 197e12,
    "TPU v4": 275e12,
}


def _device_peak_flops() -> Optional[float]:
    kind = jax.devices()[0].device_kind
    # longest-prefix match so "TPU v5 lite" beats "TPU v5"
    best = None
    for k, v in sorted(_PEAK_BF16_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            best = v
            break
    return best


def _compiled_flops(fn, *args) -> Optional[float]:
    """Exact FLOPs of the compiled computation via XLA cost analysis
    (verified exact for matmuls on the axon TPU), PLUS the analytic FLOPs
    of any flash-attention custom calls traced along the way — XLA cannot
    see inside a Mosaic kernel, so without the tracker MFU would drop
    exactly when the flash path engages. ``fn`` is unwrapped through
    ``__wrapped__`` so an already-jitted step retraces (a cached trace
    skips the Python that feeds the tracker). None when unavailable."""
    try:
        from rtts.ops.flash_attention import track_flops
        inner = getattr(fn, "__wrapped__", fn)
        with track_flops() as tracked:
            ca = jax.jit(inner).lower(*args).compile().cost_analysis()
        d = ca if isinstance(ca, dict) else ca[0]
        f = float(d.get("flops", 0.0)) + tracked.flops
        return f if f > 0 else None
    except Exception:
        return None


def _mfu(flops: Optional[float], seconds: float) -> Optional[float]:
    peak = _device_peak_flops()
    if flops is None or peak is None or seconds <= 0:
        return None
    return flops / seconds / peak


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


def flagship_bench_config() -> Config:
    """The advertised flagship (configs/base.yaml): d_model 512, 6+6
    layers, LSH encoder AND decoder, reversible + chunked FFN, bf16."""
    import pathlib

    from rtts.config import load_config
    from rtts.text import vocab_size

    path = pathlib.Path(__file__).resolve().parents[1] / "configs" / "base.yaml"
    return load_config(str(path) if path.exists() else None,
                       [f"model.vocab_size={vocab_size()}"])


def _build(cfg: Config):
    from rtts.models import reformer_tts as M

    params = M.init(jax.random.PRNGKey(0), cfg.model)
    return params


def _decode_flops(cfg: Config, params, batch: int, token_len: int,
                  max_frames: int, mode: str = "kv_full",
                  staged="auto", stage_min: int = 128) -> Optional[float]:
    """Analytic total FLOPs of encode + AR decode + postnet, assembled from
    exact per-piece XLA cost analysis (the while_loop trip count is known:
    stop_threshold=2.0 forces the full max_frames).

    ``staged`` mirrors decode_greedy: when staging is active the early
    steps attend over SMALLER caches, so the per-step cost is evaluated
    at each stage's buffer size and weighted by that stage's step count —
    a fixed-size model would overstate the executed FLOPs (and inflate
    MFU) by ~1/3 at the default schedule."""
    from rtts.infer.decode import (
        _auto_staged, _decode_rotations, _init_mem_kv, _init_state,
        _make_step_fn, _dtype, _stage_sizes)
    from rtts.models import reformer_tts as M
    from rtts.models.reformer_tts import postnet_apply

    mcfg = cfg.model
    tokens = jnp.ones((batch, token_len), jnp.int32)
    tmask = jnp.ones((batch, token_len), bool)
    enc = lambda p, t, m: M.encode(p, mcfg, t, m, deterministic=True)
    f_enc = _compiled_flops(enc, params, tokens, tmask)

    cdt = _dtype(mcfg.compute_dtype)
    memory = jnp.zeros((batch, token_len, mcfg.d_model), cdt)
    mem_k, mem_v = _init_mem_kv(params, mcfg, memory, cdt)
    if mode == "auto":
        from rtts.infer.decode import _auto_mode

        mode = _auto_mode(mcfg, max_frames)
    rotations, nb = (None, 0)
    if mode in ("kv_lsh", "kv_lsh_chunk"):
        rotations, nb = _decode_rotations(mcfg, jax.random.PRNGKey(9),
                                          max_frames)
    step = _make_step_fn(params, mcfg, mem_k, mem_v, tmask,
                         jax.random.PRNGKey(0), 2.0, rotations=rotations)
    a = mcfg.decoder.attention
    ring_cap = a.chunk_length * (1 + a.num_chunks_before + a.num_chunks_after)
    n_groups = max_frames // mcfg.reduction_factor
    if staged == "auto":
        staged = _auto_staged(n_groups)   # the shared decode_greedy rule
    sizes = _stage_sizes(n_groups, stage_min) if staged else (n_groups,)

    def step_flops_at(size):
        state = _init_state(
            params, mcfg, batch, size * mcfg.reduction_factor,
            lsh_cache=(mode == "kv_lsh"),
            ring_buckets=(nb if mode == "kv_lsh_chunk" else 0),
            ring_capacity=min(ring_cap, n_groups))
        return _compiled_flops(step, state)

    # per-step FLOPs are exactly affine in the cache length (attention
    # terms linear in T, everything else constant), so two compiles pin
    # the whole stage schedule — avoids one compile per stage on the
    # slow-compile tunneled backend
    f_last = step_flops_at(sizes[-1])
    if f_last is None:
        return None
    if len(sizes) == 1:
        f_decode = sizes[0] * f_last
    else:
        f_first = step_flops_at(sizes[0])
        if f_first is None:
            return None
        slope = (f_last - f_first) / (sizes[-1] - sizes[0])
        intercept = f_first - slope * sizes[0]
        f_decode = 0.0
        prev = 0
        for size in sizes:
            f_decode += (size - prev) * (intercept + slope * size)
            prev = size

    mel = jnp.zeros((batch, max_frames, mcfg.n_mels), jnp.float32)
    pn = lambda p, m: postnet_apply(p["postnet"], mcfg, m.astype(cdt),
                                    None, True, cdt)
    f_pn = _compiled_flops(pn, params, mel)

    if f_enc is None:
        return None
    return f_enc + f_decode + (f_pn or 0.0)


def _serving_params(cfg: Config, params):
    """Pre-cast matmul weights to the compute dtype OUTSIDE the jit, as
    the serving surfaces (Synthesizer, StreamingSynthesizer) do — bf16
    jit arguments halve per-step weight HBM reads (2x decode, BENCH.md)
    and avoid the per-stage re-materialization XLA applies to in-graph
    casts under staged decoding."""
    from rtts.infer.decode import _dtype, _precast_weights

    return _precast_weights(params, _dtype(cfg.model.compute_dtype))


def bench_decode(cfg: Optional[Config] = None, batch: int = 8,
                 token_len: int = 256, max_frames: int = 512,
                 repeats: int = 3, mode: str = "kv_full",
                 unroll: int = 1, staged="auto") -> Dict[str, Any]:
    """Batched greedy AR decode throughput: mel frames/sec/chip."""
    from rtts.infer.decode import decode_greedy
    from rtts.models import reformer_tts as M

    cfg = cfg or base_bench_config()
    params = _serving_params(cfg, _build(cfg))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, token_len),
                                3, cfg.model.vocab_size)
    tmask = jnp.ones((batch, token_len), bool)

    @jax.jit
    def run(p, tok, msk):
        memory = M.encode(p, cfg.model, tok, msk, deterministic=True)
        # stop_threshold > 1: force a full-length decode for stable timing
        return decode_greedy(p, cfg.model, memory, msk,
                             max_frames=max_frames, stop_threshold=2.0,
                             mode=mode, unroll=unroll, staged=staged)

    mel, lengths, _ = _sync(run(params, tokens, tmask))  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(params, tokens, tmask))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    frames = batch * max_frames
    flops = _decode_flops(cfg, params, batch, token_len, max_frames, mode,
                          staged=staged)
    return {
        "frames_per_sec": frames / dt,
        "decode_seconds": dt,
        "batch": batch,
        "max_frames": max_frames,
        "mode": mode,
        "flops": flops,
        "mfu": _mfu(flops, dt),
        "device": str(jax.devices()[0]),
    }


def bench_e2e(cfg: Optional[Config] = None, batch: int = 8,
              token_len: int = 256, max_frames: int = 512,
              repeats: int = 3, use_vocoder: bool = True,
              mode: str = "auto", unroll: int = 1,
              staged="auto") -> Dict[str, Any]:
    """text->wav RTF: wall time / audio duration produced (per chip).

    mode="auto" mirrors the Synthesizer serving default (kv_lsh_chunk for
    LSH decoders) so the headline measures the shipped configuration."""
    from rtts.infer.decode import decode_greedy
    from rtts.models import reformer_tts as M
    from rtts.models import squeezewave as SW

    cfg = cfg or base_bench_config()
    params = _serving_params(cfg, _build(cfg))
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
                                        stop_threshold=2.0, mode=mode,
                                        unroll=unroll, staged=staged)
        if vp is not None:
            audio = SW.infer(vp, cfg.vocoder, mel,
                             rng=jax.random.PRNGKey(0))
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
    flops = _decode_flops(cfg, params, batch, token_len, max_frames, mode,
                          staged=staged)
    if flops is not None and use_vocoder:
        mel0 = jnp.zeros((batch, max_frames, cfg.vocoder.n_mels), jnp.float32)
        f_voc = _compiled_flops(
            lambda p, m: SW.infer(p, cfg.vocoder, m,
                                  rng=jax.random.PRNGKey(0)),
            voc_params, mel0)
        flops = flops + f_voc if f_voc is not None else None
    return {
        "rtf": rtf,
        "wall_seconds": dt,
        "audio_seconds": audio_seconds,
        "batch": batch,
        "max_frames": max_frames,
        "mode": mode,
        "vocoder": bool(use_vocoder),
        "flops": flops,
        "mfu": _mfu(flops, dt),
        "device": str(jax.devices()[0]),
    }


def bench_serving(cfg: Optional[Config] = None, repeats: int = 3,
                  mode: str = "auto", staged="auto",
                  per_bucket: int = 32) -> Dict[str, Any]:
    """Variable-length serving batching vs pad-to-max (VERDICT r2 item 5).

    Workload: 4 buckets x ``per_bucket`` requests whose TRUE mel lengths
    are 128/256/512/1024 frames (stop_threshold 2.0 pins every request to
    its budget, so the comparison isolates shape management).  Baseline
    decodes all of them padded to 1024 in one batch; bucketed serving
    decodes each group at its own max_frames through the same jit cache
    (Synthesizer.serve_to_mel's strategy at the decode level).  Aggregate
    useful frames are identical; the win is not spending decode steps
    past each request's length — and it GROWS with workload size, because
    the per-step cost of the padded batch grows with its cache footprint
    while the bucketed batches stay lean (measured: 1.06x at 8/bucket,
    1.43x at 32/bucket — BENCH.md r3 "serving")."""
    from rtts.infer.decode import decode_greedy
    from rtts.models import reformer_tts as M

    cfg = cfg or base_bench_config()
    params = _serving_params(cfg, _build(cfg))
    budgets = [128, 256, 512, 1024]
    token_lens = {128: 64, 256: 64, 512: 64, 1024: 128}

    def make_inputs(n, tl):
        tokens = jax.random.randint(jax.random.PRNGKey(1), (n, tl),
                                    3, cfg.model.vocab_size)
        return tokens, jnp.ones((n, tl), bool)

    import functools

    @functools.partial(jax.jit, static_argnames=("max_frames",))
    def run(p, tok, msk, max_frames):
        memory = M.encode(p, cfg.model, tok, msk, deterministic=True)
        return decode_greedy(p, cfg.model, memory, msk,
                             max_frames=max_frames, stop_threshold=2.0,
                             mode=mode, staged=staged)

    # warm every shape
    bucket_inputs = {b: make_inputs(per_bucket, token_lens[b])
                     for b in budgets}
    base_inputs = make_inputs(per_bucket * len(budgets),
                              max(token_lens.values()))
    for b in budgets:
        _sync(run(params, *bucket_inputs[b], max_frames=b))
    _sync(run(params, *base_inputs, max_frames=max(budgets)))

    useful_frames = per_bucket * sum(budgets)
    t_serve, t_base = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for b in budgets:
            _sync(run(params, *bucket_inputs[b], max_frames=b))
        t_serve.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(run(params, *base_inputs, max_frames=max(budgets)))
        t_base.append(time.perf_counter() - t0)
    ts, tb = min(t_serve), min(t_base)
    return {
        "aggregate_frames_per_sec_bucketed": useful_frames / ts,
        "aggregate_frames_per_sec_pad_to_max": useful_frames / tb,
        "speedup": tb / ts,
        "bucketed_seconds": ts,
        "pad_to_max_seconds": tb,
        "workload": {str(b): per_bucket for b in budgets},
        "mode": mode,
        "device": str(jax.devices()[0]),
    }


def bench_continuous(cfg: Optional[Config] = None, repeats: int = 3,
                     per_group: int = 8, slots: int = 8,
                     segment_frames: int = 64) -> Dict[str, Any]:
    """Continuous batching (ServingEngine) vs synchronous batches at the
    SAME concurrency (VERDICT r2 "missing" #4 follow-through).

    Workload: 4 length groups x ``per_group`` requests (true lengths
    128/256/512/1024 frames, budget force-stop pins each to its length),
    SHUFFLED arrival order — the case bucketed serving can't handle
    without an oracle.  Five strategies, all decoding ``slots`` requests
    concurrently:

    - engine: slot-recycling continuous batching (admits in arrival
      order; a finished slot immediately takes the next request), host
      drives segments
    - fused: ``serve_batch`` — the whole queue scheduled inside ONE
      compiled while_loop (no host round-trips)
    - pool: ``serve_pool`` — fused scheduler per capacity class (cache
      economy of bucketing + slot recycling), one dispatch per class
    - pad_to_max: batches of ``slots`` in arrival order, every batch
      decoded to max_frames=1024 (what a shape-static server does to a
      shuffled stream)
    - bucketed_oracle: batches grouped BY LENGTH, each at its own
      max_frames (Synthesizer.serve with a perfect length predictor —
      the shape-managed lower bound for synchronous batching)

    Engine timing includes its host-side harvest/admission and the
    per-utterance postnet dispatches; per-request completion latency is
    reported for the engine (synchronous batches complete only when the
    whole batch does)."""
    from rtts.infer.decode import decode_greedy
    from rtts.infer.serving import ServingEngine
    from rtts.models import reformer_tts as M

    cfg = cfg or base_bench_config()
    params = _serving_params(cfg, _build(cfg))
    lengths_pool = [128, 256, 512, 1024]
    token_len = 128
    rng = np.random.RandomState(0)
    workload = [l for l in lengths_pool for _ in range(per_group)]
    rng.shuffle(workload)
    tokens_all = np.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (len(workload), token_len), 3,
        cfg.model.vocab_size), np.int32)
    masks_all = np.ones((len(workload), token_len), bool)
    useful_frames = sum(workload)
    max_frames = max(lengths_pool)

    # --- engine (online segment API; results stay device-resident) ------
    eng = ServingEngine(cfg, params, slots=slots, capacity_frames=max_frames,
                        segment_frames=segment_frames, token_len=token_len,
                        stop_threshold=2.0, suppress_dispatch_warning=True)

    def run_engine():
        eng.reset()
        done_t = {}
        t0 = time.perf_counter()
        ids = []
        for i, true_len in enumerate(workload):
            rid = eng.submit_tokens(tokens_all[i:i + 1], masks_all[i:i + 1],
                                    budget_frames=true_len)
            ids.append(rid)
        last = None
        while not eng.idle:
            for rid in eng.step():
                done_t[rid] = time.perf_counter()   # postnet still in flight
                last = rid
        if last is not None:
            _sync(eng.results[last][0])
        wall = time.perf_counter() - t0
        eng.results.clear()
        lat = [done_t[r] - t0 for r in ids]
        return wall, float(np.mean(lat)), float(np.max(lat))

    # --- capacity-classed pool (fused scheduler per class) ---------------
    from rtts.infer.serving import serve_pool

    def run_pool(budget_list):
        t0 = time.perf_counter()
        mels, lens = serve_pool(
            params, cfg.model, tokens_all, masks_all, budget_list,
            class_caps=tuple(lengths_pool), slots=slots,
            segment_frames=segment_frames, stop_threshold=2.0,
            rng=jax.random.PRNGKey(0))
        # serve_pool fetches lengths per class, so every class dispatch has
        # completed by here
        return time.perf_counter() - t0

    # --- fused scheduler: whole queue in one dispatch -------------------
    from rtts.infer.serving import serve_batch

    @functools.partial(jax.jit, static_argnames=("cap", "sl", "seg"))
    def run_fused(p, tok, msk, bud, cap, sl, seg):
        return serve_batch(p, cfg.model, tok, msk, bud, capacity_frames=cap,
                           slots=sl, segment_frames=seg, stop_threshold=2.0,
                           rng=jax.random.PRNGKey(0))

    fused_args = (jnp.asarray(tokens_all), jnp.asarray(masks_all),
                  jnp.asarray(workload, jnp.int32))

    def run_fused_timed():
        t0 = time.perf_counter()
        _sync(run_fused(params, *fused_args, cap=max_frames, sl=slots,
                        seg=segment_frames))
        return time.perf_counter() - t0

    # --- synchronous baselines -----------------------------------------
    @functools.partial(jax.jit, static_argnames=("mf",))
    def run_batch(p, tok, msk, mf):
        memory = M.encode(p, cfg.model, tok, msk, deterministic=True)
        return decode_greedy(p, cfg.model, memory, msk, max_frames=mf,
                             stop_threshold=2.0, mode="auto")

    def run_sync(order, frame_caps):
        t0 = time.perf_counter()
        for start in range(0, len(order), slots):
            idx = order[start:start + slots]
            if len(idx) < slots:   # pad the tail batch to the slot count
                # cycle: one slice would under-fill when tail < slots/2
                idx = (idx * ((slots // len(idx)) + 1))[:slots]
            _sync(run_batch(params, jnp.asarray(tokens_all[idx]),
                            jnp.asarray(masks_all[idx]),
                            mf=frame_caps[start // slots]))
        return time.perf_counter() - t0

    arrival = list(range(len(workload)))
    pad_caps = [max_frames] * ((len(workload) + slots - 1) // slots)
    by_len = sorted(arrival, key=lambda i: workload[i])
    oracle_caps = [max(workload[i] for i in by_len[s:s + slots])
                   for s in range(0, len(by_len), slots)]

    # warm every compile path
    run_engine()
    run_pool(workload)
    run_fused_timed()
    run_sync(arrival, pad_caps)
    run_sync(by_len, oracle_caps)

    eng_w, poo_w, fus_w, pad_w, ora_w = [], [], [], [], []
    lat_mean = lat_max = 0.0
    for _ in range(repeats):
        w, lm, lx = run_engine()
        eng_w.append(w)
        lat_mean, lat_max = lm, lx
        poo_w.append(run_pool(workload))
        fus_w.append(run_fused_timed())
        pad_w.append(run_sync(arrival, pad_caps))
        ora_w.append(run_sync(by_len, oracle_caps))
    te, tl, tf, tp, to = (min(eng_w), min(poo_w), min(fus_w), min(pad_w),
                          min(ora_w))
    scenario_a = {
        "aggregate_frames_per_sec_pool": useful_frames / tl,
        "aggregate_frames_per_sec_fused": useful_frames / tf,
        "aggregate_frames_per_sec_engine": useful_frames / te,
        "aggregate_frames_per_sec_pad_to_max": useful_frames / tp,
        "aggregate_frames_per_sec_bucketed_oracle": useful_frames / to,
        "pool_speedup_vs_pad_to_max": tp / tl,
        "pool_speedup_vs_bucketed_oracle": to / tl,
        "fused_speedup_vs_pad_to_max": tp / tf,
        "fused_speedup_vs_bucketed_oracle": to / tf,
        "speedup_vs_pad_to_max": tp / te,
        "speedup_vs_bucketed_oracle": to / te,
        "pool_seconds": tl,
        "fused_seconds": tf,
        "engine_seconds": te,
        "pad_to_max_seconds": tp,
        "bucketed_oracle_seconds": to,
        "engine_latency_mean_s": lat_mean,
        "engine_latency_max_s": lat_max,
        "workload": {str(l): per_group for l in lengths_pool},
    }

    # --- scenario B: UNPREDICTABLE stop times within one class -----------
    # Every request predicts to the top class (a length model can't tell
    # them apart), but true lengths vary 128..1024.  Sync batching must run
    # each batch to its longest member; slot recycling reclaims the decode
    # steps the short requests don't use WITHOUT knowing lengths up front.
    n_b = 4 * per_group
    true_b = (64 * rng.randint(2, max_frames // 64 + 1, size=n_b)).tolist()
    useful_b = sum(true_b)
    bud_b = jnp.asarray(true_b, jnp.int32)

    def run_fused_b():
        t0 = time.perf_counter()
        _sync(run_fused(params, *fused_args[:2], bud_b, cap=max_frames,
                        sl=slots, seg=segment_frames))
        return time.perf_counter() - t0

    # sync baselines: the batch runs until its longest TRUE length
    # (charitably emulating the stop head firing; quantized to 64)
    def caps_for(order):
        return [64 * (-(-max(true_b[i] for i in order[s:s + slots]) // 64))
                for s in range(0, len(order), slots)]

    arrival_b = list(range(n_b))
    by_len_b = sorted(arrival_b, key=lambda i: true_b[i])

    run_fused_b()
    run_sync(arrival_b, caps_for(arrival_b))
    run_sync(by_len_b, caps_for(by_len_b))
    fus_b, arr_b, ora_b = [], [], []
    for _ in range(repeats):
        fus_b.append(run_fused_b())
        arr_b.append(run_sync(arrival_b, caps_for(arrival_b)))
        ora_b.append(run_sync(by_len_b, caps_for(by_len_b)))
    tfb, tab, tob = min(fus_b), min(arr_b), min(ora_b)
    scenario_b = {
        "aggregate_frames_per_sec_fused": useful_b / tfb,
        "aggregate_frames_per_sec_sync_arrival": useful_b / tab,
        "aggregate_frames_per_sec_sync_length_oracle": useful_b / tob,
        "fused_speedup_vs_sync_arrival": tab / tfb,
        "fused_speedup_vs_length_oracle": tob / tfb,
        "fused_seconds": tfb,
        "sync_arrival_seconds": tab,
        "sync_length_oracle_seconds": tob,
        "true_length_range": [min(true_b), max(true_b)],
        "n_requests": n_b,
    }

    return {
        "scenario_a_perfect_prediction": scenario_a,
        "scenario_b_unpredictable_lengths": scenario_b,
        "pool_speedup_vs_pad_to_max": scenario_a["pool_speedup_vs_pad_to_max"],
        "fused_speedup_vs_sync_arrival":
            scenario_b["fused_speedup_vs_sync_arrival"],
        "slots": slots,
        "segment_frames": segment_frames,
        "device": str(jax.devices()[0]),
    }


def bench_latency(cfg: Optional[Config] = None,
                  concurrency: Tuple[int, ...] = (1, 8, 32),
                  repeats: int = 3,
                  chunk_sweep: Tuple[int, ...] = (32, 64, 128),
                  max_frames: int = 512) -> Dict[str, Any]:
    """Per-request latency + time-to-first-audio (VERDICT r3 item 2).

    Every other serving number in this file is aggregate throughput; this
    one measures what a WAITING caller sees:

    - ``batch`` / ``pool``: one fused computation returns every request
      together, so each request's latency IS the call wall time — reported
      per concurrency level (mixed true lengths 128/256/512, stop pinned).
    - ``engine``: the host-driven ServingEngine completes requests at
      segment boundaries — the only path with a real per-request latency
      DISTRIBUTION; p50/p95 over the request completion times.  (Its
      aggregate throughput is 0.36x the fused path on this dispatch-bound
      backend — bench_continuous — but short requests finish early instead
      of waiting for the whole batch.)
    - ``streaming``: StreamingSynthesizer time-to-first-audio per
      chunk_frames (batch 1) — the latency the streaming surface exists
      for, and the evidence for its chunk-size default: TTFA grows with
      the chunk (more decode before the first vocode) while tiny chunks
      pay per-segment dispatch; the sweep shows the knee.
    """
    from rtts.infer.serving import ServingEngine, serve_pool
    from rtts.infer.streaming import StreamingSynthesizer
    from rtts.models import reformer_tts as M
    from rtts.models import squeezewave as SW

    cfg = cfg or base_bench_config()
    params = _serving_params(cfg, _build(cfg))
    voc_params = SW.fold_weightnorm(
        SW.init(jax.random.PRNGKey(2), cfg.vocoder))
    token_len = 64
    lengths_pool = [128, 256, 512]
    hop = cfg.vocoder.hop_length
    sr = cfg.dataset.audio.sample_rate
    from rtts.infer.decode import decode_greedy

    @functools.partial(jax.jit, static_argnames=("mf",))
    def run_batch(p, tok, msk, mf):
        memory = M.encode(p, cfg.model, tok, msk, deterministic=True)
        return decode_greedy(p, cfg.model, memory, msk, max_frames=mf,
                             stop_threshold=2.0)

    per_n: Dict[str, Any] = {}
    for n in concurrency:
        lens = [lengths_pool[i % len(lengths_pool)] for i in range(n)]
        tokens = np.asarray(jax.random.randint(
            jax.random.PRNGKey(1), (n, token_len), 3, cfg.model.vocab_size),
            np.int32)
        masks = np.ones((n, token_len), bool)

        # batch (pad-to-max): everyone waits for max_frames
        _sync(run_batch(params, tokens, masks, max_frames))
        tb = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(run_batch(params, tokens, masks, max_frames))
            tb.append(time.perf_counter() - t0)

        # pool (fused continuous batching): everyone waits for the call
        def run_p():
            t0 = time.perf_counter()
            mels, out_lens = serve_pool(
                params, cfg.model, tokens, masks, lens,
                class_caps=(128, 256, 512), slots=min(8, n),
                stop_threshold=2.0, rng=jax.random.PRNGKey(0))
            _sync(mels[0])
            return time.perf_counter() - t0

        run_p()
        tp = [run_p() for _ in range(repeats)]

        # engine: per-request completion latency distribution
        eng = ServingEngine(cfg, params, slots=min(8, n),
                            capacity_frames=max_frames, segment_frames=64,
                            token_len=token_len, stop_threshold=2.0,
                            suppress_dispatch_warning=True)

        def run_e():
            eng.reset()
            ids = [eng.submit_tokens(tokens[i:i + 1], masks[i:i + 1],
                                     budget_frames=lens[i])
                   for i in range(n)]
            done_t: Dict[int, float] = {}
            t0 = time.perf_counter()
            while len(done_t) < n:
                for rid in eng.step():
                    done_t[rid] = time.perf_counter() - t0
            return np.asarray([done_t[rid] for rid in ids])

        run_e()
        lats = np.stack([run_e() for _ in range(repeats)])
        best = lats.min(axis=0)   # per-request best-of-repeats
        worst = lats.max(axis=0)
        per_n[str(n)] = {
            "lengths": lens,
            "batch_latency_s": min(tb),
            "batch_latency_band_s": [min(tb), max(tb)],
            "pool_latency_s": min(tp),
            "pool_latency_band_s": [min(tp), max(tp)],
            "engine_p50_s": float(np.percentile(best, 50)),
            "engine_p95_s": float(np.percentile(best, 95)),
            # session-swing band (VERDICT r4 #7): the same statistic over
            # the best and worst repeat — cross-repeat spread on the
            # tunneled backend is real and must ride along with the point
            "engine_p95_band_s": [float(np.percentile(best, 95)),
                                  float(np.percentile(worst, 95))],
            "engine_drain_s": float(best.max()),
        }

    # streaming TTFA sweep (batch 1, the latency-critical case).  Random
    # bench weights would fire the stop head on frame 1 (one chunk, no
    # inter-chunk cadence to measure): pin stop_threshold=2.0 so every
    # stream runs its full max_frames like the other paths here.
    ss = StreamingSynthesizer(
        dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, stop_threshold=2.0)),
        params, voc_params, max_frames=max_frames)
    text = ["speech synthesis latency probe sentence"]
    streaming: Dict[str, Any] = {}
    for ch in chunk_sweep:
        for _ in ss.stream(text, chunk_frames=ch, seed=0):
            pass                           # warm this chunk size's compiles
        ttfa, total, chunks = [], [], 0
        for _ in range(max(repeats, 5)):   # >=5 reps: the band needs mass
            t0 = time.perf_counter()
            first = None
            chunks = 0
            for audio in ss.stream(text, chunk_frames=ch, seed=0):
                if first is None:
                    first = time.perf_counter() - t0
                chunks += 1
            ttfa.append(first)
            total.append(time.perf_counter() - t0)
        streaming[str(ch)] = {
            "ttfa_s": min(ttfa),
            # TTFA swings across sessions (0.159–0.270 s observed r4);
            # publish the same-process band so the point is never quoted
            # bare (VERDICT r4 #7)
            "ttfa_band_s": [min(ttfa), max(ttfa)],
            "total_s": min(total),
            "total_band_s": [min(total), max(total)],
            "n_chunks": chunks,
            # how far ahead of real time the first chunk lands
            "first_chunk_audio_s": ch * hop / sr,
        }
    return {
        "per_concurrency": per_n,
        "streaming_ttfa": streaming,
        "max_frames": max_frames,
        "device": str(jax.devices()[0]),
    }


def bench_vocoder(cfg: Optional[Config] = None, batch: int = 8,
                  mel_frames: int = 512, repeats: int = 3) -> Dict[str, Any]:
    from rtts.models import squeezewave as SW

    cfg = cfg or base_bench_config()
    voc = cfg.vocoder
    params = SW.fold_weightnorm(SW.init(jax.random.PRNGKey(0), voc))
    mel = jax.random.normal(jax.random.PRNGKey(1), (batch, mel_frames, voc.n_mels))

    run = jax.jit(lambda p, m: SW.infer(p, voc, m,
                                        rng=jax.random.PRNGKey(0)))
    _sync(run(params, mel))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(params, mel))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * mel_frames * voc.hop_length / voc.sample_rate
    flops = _compiled_flops(lambda p, m: SW.infer(
        p, voc, m, rng=jax.random.PRNGKey(0)), params, mel)
    return {"vocoder_rtf": dt / audio_seconds, "wall_seconds": dt,
            "audio_seconds": audio_seconds,
            "flops": flops, "mfu": _mfu(flops, dt)}


def bench_vocoder_train(cfg: Optional[Config] = None, batch: int = 8,
                        repeats: int = 3) -> Dict[str, Any]:
    """SqueezeWave train step (fwd flow NLL + bwd + Adam) at the shipped
    crop length — the other half of SURVEY.md §7's train-throughput story
    (bench_train_step covers the TTS model)."""
    import optax

    from rtts.models import squeezewave as SW
    from rtts.train.optim import make_optimizer
    from rtts.train.train_vocoder import make_train_step

    cfg = cfg or base_bench_config()
    voc = cfg.vocoder
    params = SW.init(jax.random.PRNGKey(0), voc)
    optimizer = make_optimizer(cfg.experiment.optim)
    opt_state = optimizer.init(params)
    seg = voc.audio_segment_length
    frames = seg // voc.hop_length
    batch_data = {
        "mel": jax.random.normal(jax.random.PRNGKey(1),
                                 (batch, frames, voc.n_mels)),
        "audio": jax.random.normal(jax.random.PRNGKey(2),
                                   (batch, seg)) * 0.1,
    }
    step = jax.jit(make_train_step(voc, optimizer))
    params, opt_state, _ = _sync(step(params, opt_state, batch_data))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        params, opt_state, metrics = _sync(step(params, opt_state,
                                                batch_data))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * seg / voc.sample_rate
    flops = _compiled_flops(make_train_step(voc, optimizer), params,
                            opt_state, batch_data)
    return {"vocoder_train_step_seconds": dt,
            "audio_seconds_per_step": audio_seconds,
            "train_rtf": dt / audio_seconds,
            "flops": flops, "mfu": _mfu(flops, dt)}


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
    flops = _compiled_flops(step, params, opt_state, rng)
    return {"train_step_seconds": dt,
            "frames_per_sec_train": batch * mel_len / dt,
            "flops": flops, "mfu": _mfu(flops, dt)}


def longform_bench_config() -> Config:
    """BASELINE config 5: 8k-frame mel synthesis stressing LSH bucketing
    (auto num_buckets=256 at L=8192) + decode throughput.  The decoder
    keeps kind="lsh" so the O(chunk) ring-buffer decode is exercised."""
    import dataclasses

    cfg = base_bench_config()
    model = dataclasses.replace(
        cfg.model, max_pos=8192,
        decoder=dataclasses.replace(
            cfg.model.decoder,
            attention=dataclasses.replace(cfg.model.decoder.attention,
                                          kind="lsh")))
    return dataclasses.replace(cfg, model=model)


def bench_longform(cfg: Optional[Config] = None, batch: int = 2,
                   token_len: int = 1024, max_frames: int = 8192,
                   repeats: int = 2, mode: str = "auto") -> Dict[str, Any]:
    """Long-form batched text->mel: 8k-frame AR decode per utterance.

    mode="auto" routes an LSH decoder through the O(chunk) ring-buffer
    cache (kv_lsh_chunk) — per-step attention touches nh*C keys instead of
    the whole 8k prefix."""
    cfg = cfg or longform_bench_config()
    r = bench_decode(cfg, batch=batch, token_len=token_len,
                     max_frames=max_frames, repeats=repeats, mode=mode)
    r["rtf"] = r["decode_seconds"] / (batch * max_frames / _frame_rate(cfg))
    return r


def _time_loop(fn, x, extra=(), iters: int = 32, repeats: int = 5) -> float:
    """Per-iteration wall time of a shape-preserving op, amortized.

    ``fn(x, *extra)`` must return an x-shaped output; it is chained
    ``iters`` times inside ONE jit via fori_loop (output feeds the next
    input, so XLA can't elide iterations).  Amortization matters on the
    axon-tunneled TPU, where a single dispatch costs ~25 ms of round-trip
    latency — timing one call measures the tunnel, not the kernel.
    ``extra`` operands are passed as jit ARGUMENTS, not closure constants:
    embedded constants measurably distort custom-call timing on this
    backend (and model usage passes runtime values anyway)."""
    loop = jax.jit(lambda x0, *rest: jax.lax.fori_loop(
        0, iters, lambda i, xx: fn(xx, *rest), x0))
    _sync(loop(x, *extra))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(loop(x, *extra))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def bench_kernels(repeats: int = 5) -> Dict[str, Any]:
    """Pallas kernels vs the plain-XLA (jnp oracle) path at flagship shapes,
    forward and forward+backward.  speedup > 1.0 means the Pallas kernel
    wins; the table is the evidence that each kernel earns its keep."""
    from rtts.attention.lsh import (
        _sort_by_bucket, hash_vectors, lsh_attend_chunks)
    from rtts.ops.chunked_ffn import _ref_ffn, chunked_ffn_pallas
    from rtts.ops.depthwise_conv import _ref_dw, depthwise_conv1d_pallas
    from rtts.ops.lsh_attention import lsh_attend_chunks_pallas
    from rtts.nn.layers import dense_init, layer_norm_init

    on_tpu = jax.devices()[0].platform == "tpu"
    results: Dict[str, Any] = {"device": str(jax.devices()[0])}
    key = jax.random.PRNGKey(0)

    # ---- LSH chunk-attend (flagship: B8 H8 nh4 L1024 c64 d64, before=1) ----
    b, h, nh, l, c, d = 8, 8, 4, 1024, 64, 64
    nb = 2 * l // c
    qk = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
    buckets = hash_vectors(qk.astype(jnp.float32), nb, nh,
                           jax.random.PRNGKey(1), None)
    sorted_pos, _, _ = _sort_by_bucket(buckets)
    nc = nh * l // c

    def gather(x):
        xb = jnp.broadcast_to(x[:, :, None], (b, h, nh, l, d))
        return jnp.take_along_axis(xb, sorted_pos[..., None], axis=3)

    q_c = gather(qk).reshape(b, h, nc, c, d)
    k_c = q_c / jnp.maximum(jnp.linalg.norm(
        q_c.astype(jnp.float32), axis=-1, keepdims=True), 1e-6).astype(q_c.dtype)
    v_c = gather(jax.random.normal(jax.random.PRNGKey(2), (b, h, l, d),
                                   jnp.bfloat16)).reshape(b, h, nc, c, d)
    pos_c = sorted_pos.reshape(b, h, nc, c)
    val_c = jnp.ones((b, h, nc, c), bool)

    # pos_c/val_c ride as jit ARGUMENTS too (CLAUDE.md rule: closure
    # constants distort custom-call timing on this backend)
    ref_fn = lambda q, k, v, pc, vc: lsh_attend_chunks(q, k, v, pc, vc,
                                                       True, 1, 0)[0]
    pl_fn = lambda q, k, v, pc, vc: lsh_attend_chunks_pallas(
        q, k, v, pc, vc, True, 1, 0, interpret=not on_tpu)[0]
    kv = (k_c, v_c, pos_c, val_c)
    t_ref = _time_loop(ref_fn, q_c, kv, repeats=repeats)
    t_pl = _time_loop(pl_fn, q_c, kv, repeats=repeats)
    results["lsh_attend_fwd"] = {"xla_ms": t_ref * 1e3, "pallas_ms": t_pl * 1e3,
                                 "speedup": t_ref / t_pl}
    g_ref = lambda q, k, v, pc, vc: jax.grad(
        lambda a: ref_fn(a, k, v, pc, vc).astype(jnp.float32).sum())(q)
    g_pl = lambda q, k, v, pc, vc: jax.grad(
        lambda a: pl_fn(a, k, v, pc, vc).astype(jnp.float32).sum())(q)
    t_ref = _time_loop(g_ref, q_c, kv, repeats=repeats)
    t_pl = _time_loop(g_pl, q_c, kv, repeats=repeats)
    results["lsh_attend_fwdbwd"] = {"xla_ms": t_ref * 1e3,
                                    "pallas_ms": t_pl * 1e3,
                                    "speedup": t_ref / t_pl}

    # ---- fused LN+FFN (flagship: 8x1024 rows, d 512, d_ff 2048) -----------
    dm, dff = 512, 2048
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 1024, dm), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    fp = {"ln": layer_norm_init(dm), "w_in": dense_init(k1, dm, dff),
          "w_out": dense_init(k2, dff, dm)}
    ref_fn = lambda xx, p: _ref_ffn(p, xx, "gelu")
    pl_fn = lambda xx, p: chunked_ffn_pallas(p, xx, "gelu",
                                             interpret=not on_tpu)
    t_ref = _time_loop(ref_fn, x, (fp,), repeats=repeats)
    t_pl = _time_loop(pl_fn, x, (fp,), repeats=repeats)
    results["chunked_ffn_fwd"] = {"xla_ms": t_ref * 1e3,
                                  "pallas_ms": t_pl * 1e3,
                                  "speedup": t_ref / t_pl}
    g_ref = lambda xx, p: jax.grad(lambda a: ref_fn(a, p).sum())(xx)
    g_pl = lambda xx, p: jax.grad(lambda a: pl_fn(a, p).sum())(xx)
    t_ref = _time_loop(g_ref, x, (fp,), repeats=repeats)
    t_pl = _time_loop(g_pl, x, (fp,), repeats=repeats)
    results["chunked_ffn_fwdbwd"] = {"xla_ms": t_ref * 1e3,
                                     "pallas_ms": t_pl * 1e3,
                                     "speedup": t_ref / t_pl}

    # ---- depthwise conv1d (flagship SqueezeWave WN: L_sq 1024, C 128) -----
    cch, lsq, ks = 128, 1024, 3
    xd = jax.random.normal(jax.random.PRNGKey(5), (8, lsq, cch), jnp.float32)
    wd = jax.random.normal(jax.random.PRNGKey(6), (ks, 1, cch),
                           jnp.float32) * 0.1
    bd = jnp.zeros((cch,), jnp.float32)
    ref_fn = lambda xx, w, b: _ref_dw(xx, w, b)
    pl_fn = lambda xx, w, b: depthwise_conv1d_pallas(xx, w, b,
                                                     interpret=not on_tpu)
    t_ref = _time_loop(ref_fn, xd, (wd, bd), repeats=repeats)
    t_pl = _time_loop(pl_fn, xd, (wd, bd), repeats=repeats)
    results["depthwise_conv_fwd"] = {"xla_ms": t_ref * 1e3,
                                     "pallas_ms": t_pl * 1e3,
                                     "speedup": t_ref / t_pl}

    # ---- flash attention (flagship full-path: b8 h8 L1024 d512, causal) ---
    from rtts.attention.full import attention_init, shared_qk_self_attention

    ap = attention_init(jax.random.PRNGKey(7), 512, 8, 64, shared_qk=True)
    xa = jax.random.normal(jax.random.PRNGKey(8), (8, 1024, 512), jnp.float32)

    def _attn(impl):
        def f(xx, p):
            return shared_qk_self_attention(
                p, xx, mask=None, causal=True, num_heads=8,
                compute_dtype=jnp.bfloat16, impl=impl).astype(xx.dtype)
        return f

    if on_tpu:  # naive-vs-flash only meaningful on the real chip
        t_ref = _time_loop(_attn("naive"), xa, (ap,), repeats=repeats)
        t_pl = _time_loop(_attn("flash"), xa, (ap,), repeats=repeats)
        results["flash_attend_fwd"] = {"xla_ms": t_ref * 1e3,
                                       "pallas_ms": t_pl * 1e3,
                                       "speedup": t_ref / t_pl}
        g_ref = lambda xx, p: jax.grad(
            lambda a: _attn("naive")(a, p).sum())(xx)
        g_pl = lambda xx, p: jax.grad(
            lambda a: _attn("flash")(a, p).sum())(xx)
        t_ref = _time_loop(g_ref, xa, (ap,), repeats=repeats)
        t_pl = _time_loop(g_pl, xa, (ap,), repeats=repeats)
        results["flash_attend_fwdbwd"] = {"xla_ms": t_ref * 1e3,
                                          "pallas_ms": t_pl * 1e3,
                                          "speedup": t_ref / t_pl}
    return results


def run_bench(cfg: Optional[Config] = None, which: str = "e2e") -> str:
    """Returns the single JSON line the driver consumes."""
    cfg = cfg or base_bench_config()
    if cfg.model.vocab_size <= 0:
        from rtts.text import frontend_vocab_size

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            vocab_size=frontend_vocab_size(cfg.dataset.text.level)))
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
        # deliberately ignores the caller cfg: the 8k-frame scenario needs
        # its own max_pos/length config (longform_bench_config) — say so in
        # the output instead of silently substituting
        r = bench_longform()
        r["config_note"] = "fixed longform_bench_config (caller cfg ignored)"
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
    elif which == "vocoder_train":
        r = bench_vocoder_train(cfg)
        # anchor: multiples of real-time audio consumed per train second
        line = {"metric": "vocoder_train_rtf", "unit": "rtf",
                "value": round(r["train_rtf"], 5),
                "vs_baseline": round(1.0 / max(r["train_rtf"], 1e-9), 4),
                "detail": r}
    elif which == "serving":
        r = bench_serving(cfg)
        line = {"metric": "serving_bucketed_vs_pad_to_max_speedup",
                "value": round(r["speedup"], 4), "unit": "x",
                "vs_baseline": round(r["speedup"], 4),
                "detail": r}
    elif which == "continuous":
        r = bench_continuous(cfg)
        line = {"metric": "continuous_batching_vs_sync_speedup",
                "value": round(r["fused_speedup_vs_sync_arrival"], 4),
                "unit": "x",
                "vs_baseline": round(r["fused_speedup_vs_sync_arrival"], 4),
                "detail": r}
    elif which == "latency":
        r = bench_latency(cfg)
        ttfa = r["streaming_ttfa"].get("64") or next(
            iter(r["streaming_ttfa"].values()))
        line = {"metric": "streaming_time_to_first_audio_s",
                "value": round(ttfa["ttfa_s"], 4), "unit": "s",
                # >1: the first chunk lands ahead of its own audio duration
                "vs_baseline": round(
                    ttfa["first_chunk_audio_s"] / ttfa["ttfa_s"], 4),
                "detail": r}
    elif which == "kernels":
        r = bench_kernels()
        speedups = {k: v["speedup"] for k, v in r.items()
                    if isinstance(v, dict) and "speedup" in v}
        worst = min(speedups, key=speedups.get)
        line = {"metric": "pallas_vs_xla_min_speedup",
                "value": round(speedups[worst], 4), "unit": "x",
                "vs_baseline": round(speedups[worst], 4),
                "worst_kernel": worst, "detail": r}
    else:
        raise ValueError(f"unknown bench {which!r}")
    return json.dumps(line)
