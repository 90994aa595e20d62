"""SqueezeWave: a lightweight WaveGlow-lineage normalizing-flow vocoder
(SURVEY.md §3.1 #11-13, SqueezeWave paper arXiv:2004.05685).

mel -> waveform by running affine-coupling flows in reverse on Gaussian
noise.  The audio is squeezed into ``n_group`` channels (time axis shrinks
by n_group), so every conv operates on a short-and-wide tensor — on TPU
that means the 1x1 convs and pointwise stages are plain MXU matmuls and the
depthwise stages are cheap VPU work.

Structure (training direction, audio -> z):
  squeeze audio (B, T) -> (B, L, n_group), L = T / n_group
  for k in range(n_flows):
      every n_early_every flows (k>0): emit n_early_size channels to z
      Invertible1x1Conv (c x c weight; log|det| into the loss)
      affine coupling: split channels [a0 | a1];
          (log_s, t) = WN(a0, mel_cond);  a1 <- a1 * exp(log_s) + t
  WN: pointwise in-conv -> wn_layers x [depthwise conv (separable) +
      gated tanh units conditioned on upsampled mel + residual/skip] ->
      zero-initialized end conv -> (log_s, t)

Inference inverts every step algebraically (W^-1 precomputed at fold time —
never inverted on-device per step, SURVEY.md §8 hard-part 6).

Weight normalization: WN convs parametrize w = g * v / ||v|| (matching the
reference's weight_norm training); ``fold_weightnorm`` bakes it into plain
weights for inference (the reference's remove_weightnorm / convert_model).

Design deviations from the torch lineage, for TPU idiom (documented per the
build contract):
- NTC layout everywhere ((batch, length, channels)).
- mel conditioning upsampled by frame repetition (hop / n_group per frame)
  + a pointwise conv, instead of a large ConvTranspose1d: identical
  modeling capacity at these ratios, no strided-transpose tiling problem.
- one conditioning projection per flow computing all wn_layers' gates at
  once (one big MXU matmul instead of n_layers small ones).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from rtts.config import SqueezeWaveConfig
from rtts.models.reformer_tts import _dtype  # single dtype resolver
from rtts.nn.conv import conv1d, conv1d_init


# ---------------------------------------------------------------------------
# weight norm
# ---------------------------------------------------------------------------


def wn_param(key, d_in: int, d_out: int, kernel: int, groups: int = 1,
             dtype=jnp.float32) -> Dict[str, Any]:
    """Weight-normalized conv params: {v, g, b}; w = g * v / ||v||."""
    p = conv1d_init(key, d_in, d_out, kernel, groups=groups, dtype=dtype)
    v = p["w"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    return {"v": v, "g": norm[0, 0], "b": p["b"]}


def _wn_weight(p: Dict[str, Any]) -> jnp.ndarray:
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    return p["g"][None, None, :] * v / norm


def wn_conv(p, x, groups: int = 1, compute_dtype=None,
            use_pallas: bool = True):
    # folded params ({"w"}) vs weight-normed ({"v","g"}) are auto-detected
    w = p["w"] if "w" in p else _wn_weight(p)
    if (use_pallas and groups > 1 and groups == x.shape[-1]
            and w.shape[0] > 1 and jax.devices()[0].platform == "tpu"):
        from rtts.ops.depthwise_conv import depthwise_conv1d_pallas

        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return depthwise_conv1d_pallas(x, w, p["b"].astype(x.dtype))
    return conv1d({"w": w, "b": p["b"]}, x, padding="SAME", groups=groups,
                  compute_dtype=compute_dtype)


def fold_weightnorm(params) -> Any:
    """Bake w = g*v/||v|| into plain weights and precompute 1x1 inverses —
    the inference-time checkpoint transform (reference convert_model)."""

    def fold(p):
        if isinstance(p, dict):
            if "v" in p and "g" in p:
                return {"w": _wn_weight(p), "b": p["b"]}
            if "w_1x1" in p:
                w = p["w_1x1"]
                inv = jnp.linalg.inv(w.astype(jnp.float32)).astype(w.dtype)
                return {"w_1x1": w, "w_1x1_inv": inv}
            return {k: fold(v) for k, v in p.items()}
        if isinstance(p, list):
            return [fold(v) for v in p]
        return p

    return fold(params)


def is_folded(params) -> bool:
    """True iff no weight-normed conv ({"v","g"}) and no 1x1 without its
    precomputed inverse remains — i.e. inference never has to normalize or
    invert on-device (SURVEY.md §8 hard-part 6)."""

    def check(p) -> bool:
        if isinstance(p, dict):
            if "v" in p and "g" in p:
                return False
            if "w_1x1" in p and "w_1x1_inv" not in p:
                return False
            return all(check(v) for v in p.values())
        if isinstance(p, list):
            return all(check(v) for v in p)
        return True

    return check(params)


def ensure_folded(params) -> Any:
    """Fold at load: identity for already-folded checkpoints.  Serving
    surfaces call this so an unfolded checkpoint never pays the per-call
    on-device ``jnp.linalg.inv`` fallback in ``_infer_chunk``."""
    return params if is_folded(params) else fold_weightnorm(params)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _channel_schedule(cfg: SqueezeWaveConfig) -> List[Tuple[int, bool]]:
    """Per-flow (n_remaining_channels, emit_early_before_this_flow)."""
    n_rem = cfg.n_group
    sched = []
    for k in range(cfg.n_flows):
        early = k % cfg.n_early_every == 0 and k > 0
        if early:
            n_rem -= cfg.n_early_size
        sched.append((n_rem, early))
    return sched


def init(key: jax.Array, cfg: SqueezeWaveConfig) -> Dict[str, Any]:
    pdtype = _dtype(cfg.param_dtype)
    flows = []
    ks = jax.random.split(key, cfg.n_flows + 1)
    for k, (n_rem, _) in enumerate(_channel_schedule(cfg)):
        n_half = n_rem // 2
        fk = jax.random.split(ks[k], 3 + cfg.wn_layers * 3)
        # random orthogonal init for the invertible 1x1 (det = +/-1)
        w0 = jax.random.normal(fk[0], (n_rem, n_rem), jnp.float32)
        q, _ = jnp.linalg.qr(w0)
        # ensure det +1 so log|det| starts at 0 from a rotation.  Flip ONE
        # column: scaling the whole matrix by -1 flips det only for odd
        # dims (det(cQ) = c^n det(Q)), and n_rem is even here
        q = q.at[:, 0].multiply(jnp.where(jnp.linalg.det(q) < 0, -1.0, 1.0))
        wn = {
            "in": wn_param(fk[1], n_half, cfg.wn_channels, 1, dtype=pdtype),
            "cond": wn_param(fk[2], cfg.n_mels, 2 * cfg.wn_channels * cfg.wn_layers,
                             1, dtype=pdtype),
            "depth": [wn_param(fk[3 + 3 * i], cfg.wn_channels, cfg.wn_channels,
                               cfg.wn_kernel_size, groups=cfg.wn_channels,
                               dtype=pdtype)
                      for i in range(cfg.wn_layers)],
            "point": [wn_param(fk[4 + 3 * i], cfg.wn_channels, 2 * cfg.wn_channels,
                               1, dtype=pdtype)
                      for i in range(cfg.wn_layers)],
            "res_skip": [wn_param(fk[5 + 3 * i], cfg.wn_channels,
                                  cfg.wn_channels, 1, dtype=pdtype)
                         for i in range(cfg.wn_layers)],
            # zero-init end conv => flows start as identity (stable training)
            "end": {"w": jnp.zeros((1, cfg.wn_channels, 2 * n_half), pdtype),
                    "b": jnp.zeros((2 * n_half,), pdtype)},
        }
        flows.append({"inv1x1": {"w_1x1": q.astype(pdtype)}, "wn": wn})
    return {"flows": flows}


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def squeeze_audio(audio: jnp.ndarray, n_group: int) -> jnp.ndarray:
    """(B, T) -> (B, L, n_group)"""
    b, t = audio.shape
    if t % n_group != 0:
        raise ValueError(f"audio length {t} not divisible by n_group {n_group}")
    return audio.reshape(b, t // n_group, n_group)


def unsqueeze_audio(x: jnp.ndarray) -> jnp.ndarray:
    b, l, g = x.shape
    return x.reshape(b, l * g)


def upsample_mel(mel: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """(B, M, n_mels) -> (B, target_len, n_mels) by frame repetition."""
    b, m, c = mel.shape
    if target_len % m != 0:
        raise ValueError(f"squeezed length {target_len} not a multiple of mel frames {m}")
    r = target_len // m
    return jnp.repeat(mel, r, axis=1)


def _bound_log_s(log_s: jnp.ndarray, clamp: float) -> jnp.ndarray:
    """Soft-bound the coupling log-scale: clamp * tanh(log_s / clamp).

    Flow NLL is unbounded below on near-deterministic audio (the synthetic
    corpora), which lets log_s run away during warmup (measured: flagship
    vocoder NaN'd at step ~1800 with log_s_mean ~9 even at f32/LR 1e-4,
    grad-clip 1.0 — the blow-up is in the FORWARD, so clipping can't stop
    it).  The bound is applied identically in forward and inverse, so the
    flow stays exactly invertible.  clamp <= 0 disables (exact WaveGlow
    semantics, the reference behavior — SURVEY.md §3.1 #11)."""
    if clamp <= 0:
        return log_s
    return clamp * jnp.tanh(log_s / clamp)


def wn_apply(wn, audio_half: jnp.ndarray, mel_up: jnp.ndarray,
             n_layers: int, wn_channels: int,
             compute_dtype=None) -> jnp.ndarray:
    """(B, L, n_half), (B, L, n_mels) -> (B, L, 2*n_half) = [log_s | t]."""
    h = wn_conv(wn["in"], audio_half, compute_dtype=compute_dtype)
    cond_all = wn_conv(wn["cond"], mel_up, compute_dtype=compute_dtype)
    skip_total = None
    for i in range(n_layers):
        d = wn_conv(wn["depth"][i], h, groups=wn_channels,
                    compute_dtype=compute_dtype)
        a = wn_conv(wn["point"][i], d, compute_dtype=compute_dtype)
        cond = jax.lax.dynamic_slice_in_dim(
            cond_all, i * 2 * wn_channels, 2 * wn_channels, axis=-1)
        a = a + cond
        t_act = jnp.tanh(a[..., :wn_channels])
        s_act = jax.nn.sigmoid(a[..., wn_channels:])
        acts = t_act * s_act
        rs = wn_conv(wn["res_skip"][i], acts, compute_dtype=compute_dtype)
        if i < n_layers - 1:
            h = h + rs
        skip_total = rs if skip_total is None else skip_total + rs
    return conv1d(wn["end"], skip_total, padding="SAME",
                  compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# forward (training direction: audio -> z) and inverse (inference)
# ---------------------------------------------------------------------------


def forward(params, cfg: SqueezeWaveConfig, mel: jnp.ndarray,
            audio: jnp.ndarray, compute_dtype=None
            ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """mel (B, M, n_mels), audio (B, T) -> (z (B,L,n_group), log_s_list,
    log_det_w_list).  T must equal M * hop_length."""
    cdt = compute_dtype or _dtype(cfg.compute_dtype)
    x = squeeze_audio(audio, cfg.n_group).astype(jnp.float32)
    b, l, _ = x.shape
    mel_up = upsample_mel(mel, l).astype(cdt)

    z_out: List[jnp.ndarray] = []
    log_s_list: List[jnp.ndarray] = []
    log_det_list: List[jnp.ndarray] = []
    for k, (n_rem, early) in enumerate(_channel_schedule(cfg)):
        if early:
            z_out.append(x[..., : cfg.n_early_size])
            x = x[..., cfg.n_early_size:]
        fp = params["flows"][k]
        w = fp["inv1x1"]["w_1x1"].astype(jnp.float32)
        x = x @ w                                    # (B, L, c) @ (c, c)
        _, logdet = jnp.linalg.slogdet(w)
        log_det_list.append(l * logdet)
        n_half = n_rem // 2
        a0, a1 = x[..., :n_half], x[..., n_half:]
        st = wn_apply(fp["wn"], a0.astype(cdt), mel_up, cfg.wn_layers,
                      cfg.wn_channels, cdt).astype(jnp.float32)
        log_s, t = st[..., :n_half], st[..., n_half:]
        log_s = _bound_log_s(log_s, cfg.log_s_clamp)
        a1 = a1 * jnp.exp(log_s) + t
        log_s_list.append(log_s)
        x = jnp.concatenate([a0, a1], axis=-1)
    z_out.append(x)
    return jnp.concatenate(z_out, axis=-1), log_s_list, log_det_list


def infer(params, cfg: SqueezeWaveConfig, mel: jnp.ndarray,
          sigma: Optional[float] = None, rng: Optional[jax.Array] = None,
          compute_dtype=None) -> jnp.ndarray:
    """mel (B, M, n_mels) -> audio (B, M * hop_length). Runs flows in
    reverse on z ~ N(0, sigma^2).  Channel bookkeeping: the tail of z is
    the final x; early chunks were emitted (in forward order) from the
    front."""
    if sigma is None:
        sigma = cfg.sigma
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, m, _ = mel.shape
    l = m * cfg.hop_length // cfg.n_group
    z = jax.random.normal(rng, (b, l, cfg.n_group), jnp.float32) * sigma
    return _infer_chunk(params, mel, z, cfg=cfg)


# ---------------------------------------------------------------------------
# streaming inference (chunked, fused behind the AR decoder)
# ---------------------------------------------------------------------------


def receptive_field_squeezed(cfg: SqueezeWaveConfig) -> int:
    """One-sided receptive field of the flow stack in squeezed samples.

    Temporal mixing comes only from the depthwise convs (1x1 convs and the
    coupling are pointwise): wn_layers convs of kernel k per flow, n_flows
    flows in sequence."""
    # XLA SAME pads asymmetrically for even kernels (right reach k//2), so
    # use k//2 per layer — equal to (k-1)//2 for odd k, one extra for even
    per_flow = cfg.wn_layers * (cfg.wn_kernel_size // 2)
    return cfg.n_flows * per_flow


def infer_streaming(params, cfg: SqueezeWaveConfig, mel: jnp.ndarray,
                    sigma: Optional[float] = None,
                    rng: Optional[jax.Array] = None,
                    chunk_frames: int = 64) -> jnp.ndarray:
    """Chunked mel->audio: processes ``chunk_frames`` mel frames at a time
    with enough overlap context that kept samples are EXACTLY the full-pass
    output (conv locality; verified in tests).  This is the low-latency
    serving path — audio for the first chunk is ready while later mel
    frames are still being decoded.

    The noise tensor is drawn once for the whole utterance so chunk
    boundaries see the same z as a single pass would.
    """
    if sigma is None:
        sigma = cfg.sigma
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, m, _ = mel.shape
    r = cfg.hop_length // cfg.n_group          # squeezed samples per frame
    if r < 1 or cfg.hop_length % cfg.n_group != 0:
        raise ValueError("hop_length must be a positive multiple of n_group")
    # overlap in mel frames covering the squeezed receptive field
    ctx = -(-receptive_field_squeezed(cfg) // r)
    l_total = m * r
    z_full = jax.random.normal(rng, (b, l_total, cfg.n_group),
                               jnp.float32) * sigma

    chunk_fn = jax.jit(functools.partial(_infer_chunk, cfg=cfg))
    outs = []
    start = 0
    while start < m:
        end = min(start + chunk_frames, m)
        lo = max(0, start - ctx)
        hi = min(m, end + ctx)
        mel_c = mel[:, lo:hi]
        z_c = z_full[:, lo * r:hi * r]
        audio_c = chunk_fn(params, mel_c, z_c)
        keep_lo = (start - lo) * cfg.hop_length
        keep_hi = keep_lo + (end - start) * cfg.hop_length
        outs.append(audio_c[:, keep_lo:keep_hi])
        start = end
    return jnp.concatenate(outs, axis=1)


def _infer_chunk(params, mel_c, z_c, *, cfg: SqueezeWaveConfig):
    """Inverse flow pass on one chunk with an externally supplied z."""
    cdt = _dtype(cfg.compute_dtype)
    b, mc, _ = mel_c.shape
    l = mc * (cfg.hop_length // cfg.n_group)
    mel_up = upsample_mel(mel_c, l).astype(cdt)
    sched = _channel_schedule(cfg)
    n_final = sched[-1][0]
    n_early_total = cfg.n_group - n_final
    x = z_c[..., n_early_total:]
    early_chunks = [
        z_c[..., i * cfg.n_early_size:(i + 1) * cfg.n_early_size]
        for i in range(n_early_total // cfg.n_early_size)
    ]
    for k in range(cfg.n_flows - 1, -1, -1):
        n_rem, early = sched[k]
        fp = params["flows"][k]
        n_half = n_rem // 2
        a0, a1 = x[..., :n_half], x[..., n_half:]
        st = wn_apply(fp["wn"], a0.astype(cdt), mel_up, cfg.wn_layers,
                      cfg.wn_channels, cdt).astype(jnp.float32)
        log_s, t = st[..., :n_half], st[..., n_half:]
        log_s = _bound_log_s(log_s, cfg.log_s_clamp)
        a1 = (a1 - t) * jnp.exp(-log_s)
        x = jnp.concatenate([a0, a1], axis=-1)
        if "w_1x1_inv" in fp["inv1x1"]:
            w_inv = fp["inv1x1"]["w_1x1_inv"].astype(jnp.float32)
        else:
            w_inv = jnp.linalg.inv(fp["inv1x1"]["w_1x1"].astype(jnp.float32))
        x = x @ w_inv
        if early:
            x = jnp.concatenate([early_chunks.pop(), x], axis=-1)
    return unsqueeze_audio(x)
