"""Probe: 8k-longform LSH sort-gather variants (VERDICT r3 item 1).

The one-hot MXU permutation wins 2.6x at 537 MB but decays (1.14x at
1.1 GB, 1.07x at 2.1 GB) and the 8.6 GB 8k operand was never measured
(auto rule keeps 8k on take_along_axis).  This probe measures, at the
longform_8k dims (b2 h8 d64 nh4 L8192 c64, packed qk+v width 128 bf16):

  take          shipped take_along_axis row gather
  oh_full       one einsum, full (bh, nh*L, L) one-hot   [8.6 GB]
  oh_round      lax.map over hash rounds, (bh, L, L) one-hot each [2.1 GB]
  oh_chunk4k    lax.map over destination chunks of 4096   [1.1 GB]
  oh_chunk2k    ... of 2048                               [537 MB]
  width sweep   take_along_axis at row widths 64/128/256/512 cols
                (is the 9 GB/s effective bandwidth row-transaction-bound?)

fwd = gather only; fwd+bwd = gather + its cotangent (scatter-add for
take, transposed matmul for one-hot) via jax.grad of a quadratic loss.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/rtts_jax_cache \
      python scripts/probe_gather8k.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, H, NH, L, D = 2, 8, 4, 8192, 64
W = 2 * D          # packed qk+v row width
BH = B * H
S = NH * L


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])
    return x


def time_loop(fn, x, extra=(), iters=8, repeats=4):
    loop = jax.jit(lambda x0, *rest: jax.lax.fori_loop(
        0, iters, lambda i, xx: fn(xx, *rest), x0))
    _sync(loop(x, *extra))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(loop(x, *extra))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


# --- gather variants: packed (BH, L, W) , idx (BH, S) -> (BH, S, W) ----------

def g_take(packed, idx):
    return jnp.take_along_axis(packed, idx[..., None], axis=1)


def g_oh_full(packed, idx):
    oh = (idx[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
          ).astype(packed.dtype)
    return jnp.einsum("bsl,blw->bsw", oh, packed)


def g_oh_round(packed, idx):
    idx_r = idx.reshape(BH, NH, L).transpose(1, 0, 2)    # (NH, BH, L)

    def one(ir):
        oh = (ir[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
              ).astype(packed.dtype)
        return jnp.einsum("bsl,blw->bsw", oh, packed)

    out = jax.lax.map(one, idx_r)                        # (NH, BH, L, W)
    return out.transpose(1, 0, 2, 3).reshape(BH, S, W)


def g_oh_chunk(packed, idx, sc):
    idx_c = idx.reshape(BH, S // sc, sc).transpose(1, 0, 2)  # (K, BH, sc)

    def one(ic):
        oh = (ic[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
              ).astype(packed.dtype)
        return jnp.einsum("bsl,blw->bsw", oh, packed)

    out = jax.lax.map(one, idx_c)                        # (K, BH, sc, W)
    return out.transpose(1, 0, 2, 3).reshape(BH, S, W)


def main():
    print(f"devices: {jax.devices()}  dims b{B} h{H} nh{NH} L{L} d{D}")
    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (BH, L, W), jnp.bfloat16)
    # realistic permutation: per-(bh, round) random perm of L
    rows = []
    for i in range(BH):
        per = [np.random.RandomState(1000 + i * NH + r).permutation(L)
               for r in range(NH)]
        rows.append(np.concatenate(per))
    idx = jnp.asarray(np.stack(rows), jnp.int32)         # (BH, S)

    variants = {
        "take": g_take,
        "oh_round": g_oh_round,
        "oh_chunk4k": functools.partial(g_oh_chunk, sc=4096),
        "oh_chunk2k": functools.partial(g_oh_chunk, sc=2048),
        "oh_full": g_oh_full,
    }
    out_bytes = BH * S * W * 2
    print(f"gather output {out_bytes / 1e6:.0f} MB")
    results = {}
    for name, fn in variants.items():
        # fwd: keep a data dependency on EVERY output row (sum over rounds
        # folds (BH,S,W) back to packed shape for loop chaining)
        def fwd(p, ix, f=fn):
            g = f(p, ix).reshape(BH, NH, L, W)
            return p + 0.001 * g.sum(axis=1).astype(p.dtype)

        def fwdbwd(p, ix, f=fn):
            loss = lambda q: (f(q, ix).astype(jnp.float32) ** 2).sum()
            return p - 0.001 * jax.grad(loss)(p).astype(p.dtype)

        try:
            t_f = time_loop(fwd, packed, (idx,))
            t_fb = time_loop(fwdbwd, packed, (idx,))
            results[name] = (t_f, t_fb)
            print(f"{name:12s} fwd {t_f * 1e3:8.2f} ms "
                  f"({out_bytes / t_f / 1e9:6.1f} GB/s)   "
                  f"fwd+bwd {t_fb * 1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # width sweep: is take_along_axis row-transaction-bound?
    print("\nwidth sweep (take_along_axis, same S rows):")
    for w in (64, 128, 256, 512):
        pw = jax.random.normal(key, (BH, L, w), jnp.bfloat16)

        def fwd_w(p, ix):
            g = jnp.take_along_axis(p, ix[..., None], axis=1)
            return p + 0.001 * g.reshape(BH, NH, L, w).sum(axis=1).astype(
                p.dtype)

        t = time_loop(fwd_w, pw, (idx,))
        by = BH * S * w * 2
        print(f"  width {w:4d} ({by / 1e6:6.0f} MB): {t * 1e3:7.2f} ms "
              f"({by / t / 1e9:6.1f} GB/s)")


if __name__ == "__main__" and not ({"--fusion", "--core", "--train8k", "--sweep8k", "--mem8k"}
                                   & set(sys.argv)):
    main()


# --- follow-up probe: transaction-bound fusion hypothesis --------------------
# The width sweep shows gather cost is flat in row width => row count is
# the currency.  The shipped take path spends FOUR gathers per sublayer:
#   fwd:  packed qk+v (width 128 bf16), validity mask (width 1 bool)
#   undo: out (width 64 bf16), lse (width 1 f32)
# Fusions probed here: mask folded into packed (width 129), out+lse packed
# f32 (width 65) — halving the transaction count at ~unchanged bytes.

def probe_fusion():
    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (BH, L, W), jnp.bfloat16)
    out_like = jax.random.normal(key, (BH, S, D), jnp.bfloat16)
    lse_like = jax.random.normal(key, (BH, S), jnp.float32)
    maskcol = (jax.random.uniform(key, (BH, L, 1)) > 0.1)
    rows = []
    for i in range(BH):
        per = [np.random.RandomState(2000 + i * NH + r).permutation(L)
               for r in range(NH)]
        rows.append(np.concatenate(per))
    idx = jnp.asarray(np.stack(rows), jnp.int32)          # (BH, S) sort idx
    undo = jnp.asarray(np.argsort(np.stack(rows), axis=1)[:, :L], jnp.int32)

    def t(label, fn, x, extra=()):
        tt = time_loop(fn, x, extra)
        print(f"  {label:34s} {tt * 1e3:7.2f} ms")
        return tt

    print("\nfusion probe (row-transaction hypothesis):")
    # width-1 gathers: the hidden cost
    def g_mask(p, ix):
        got = jnp.take_along_axis(maskcol.astype(p.dtype), ix[..., None],
                                  axis=1)
        return p + 0.001 * got.reshape(BH, NH, L, 1).sum(axis=1)

    def g_lse(p, ix):
        got = jnp.take_along_axis(lse_like, ix[:, :L], axis=1)
        return p + 0.001 * got[..., None].astype(p.dtype)

    t("mask gather width-1 (S rows)", g_mask, packed, (idx,))
    def g_lse_full(p, ix):
        got = jnp.take_along_axis(
            jnp.broadcast_to(lse_like[:, :L], (BH, L)), ix, axis=1)
        return p + 0.001 * got.reshape(BH, NH, L)[..., None].sum(1).astype(p.dtype)
    t("lse gather width-1 (S rows)", g_lse_full, packed, (idx,))

    # fused packed+mask (width 129) vs separate
    pm = jnp.concatenate([packed, maskcol.astype(jnp.bfloat16)], axis=-1)

    def g_pm(p, ix):
        got = jnp.take_along_axis(p, ix[..., None], axis=1)
        return p + 0.001 * got.reshape(BH, NH, L, W + 1).sum(axis=1).astype(
            p.dtype)

    t("fused packed+mask width-129", g_pm, pm, (idx,))

    # undo: separate out + lse vs fused f32 width-65 (undo has L rows/round
    # x NH rounds = S rows either way)
    out_undo_idx = idx  # same row-count/statistics as the real undo
    def g_out(p, ix):
        got = jnp.take_along_axis(out_like, ix[..., None], axis=1)
        return p + 0.001 * got.reshape(BH, NH, L, D).sum(
            axis=(1, -1))[..., None].astype(p.dtype)
    t("undo out width-64 bf16", g_out, packed, (out_undo_idx,))
    fused_ol = jnp.concatenate([out_like.astype(jnp.float32),
                                lse_like[..., None]], axis=-1)
    def g_ol(p, ix):
        got = jnp.take_along_axis(fused_ol, ix[..., None], axis=1)
        return p + 0.001 * got.reshape(BH, NH, L, D + 1).sum(
            axis=(1, -1))[..., None].astype(p.dtype)
    t("undo out+lse fused f32 width-65", g_ol, packed, (out_undo_idx,))

    # fwd+bwd of the undo pair: two scatters vs one
    def fb_sep(p, ix):
        def loss(q):
            o = jnp.take_along_axis(q, ix[..., None], axis=1)
            l2 = jnp.take_along_axis(
                jnp.broadcast_to(q[..., 0], (BH, L)).astype(jnp.float32),
                ix[:, :L], axis=1)
            return (o.astype(jnp.float32) ** 2).sum() + (l2 ** 2).sum()
        return p - 0.001 * jax.grad(loss)(p).astype(p.dtype)

    def fb_fused(p, ix):
        def loss(q):
            o = jnp.take_along_axis(
                jnp.concatenate([q.astype(jnp.float32),
                                 q[..., :1].astype(jnp.float32)], -1),
                ix[..., None], axis=1)
            return (o ** 2).sum()
        return p - 0.001 * jax.grad(loss)(p).astype(p.dtype)

    t("fwd+bwd separate out & lse", fb_sep, packed, (idx,))
    t("fwd+bwd fused out+lse", fb_fused, packed, (idx,))


if __name__ == "__main__" and "--fusion" in sys.argv:
    probe_fusion()


# --- core A/B: old 4-gather tail vs the shipped fused core -------------------

def _core_old(qk, v, cfg, mask, causal, rng):
    """Round-3 lsh_attention_core tail: separate mask gather + separate
    out/lse undo gathers (the pre-fusion shape), sharing hash/sort/attend
    with the shipped code so the A/B isolates the gather fusions."""
    from rtts.attention.lsh import (
        _len_norm, _sort_by_bucket, auto_num_buckets, hash_vectors,
        lsh_attend_chunks)

    b, h, l, d = qk.shape
    c = cfg.chunk_length
    nh = cfg.num_hashes
    nb = cfg.num_buckets or auto_num_buckets(l, c)
    buckets = hash_vectors(qk, nb, nh, rng, mask)
    sorted_pos, undo_idx, _ = _sort_by_bucket(buckets)
    bh = b * h
    idx = sorted_pos.reshape(bh, nh * l)
    packed = jnp.concatenate([qk, v], axis=-1).reshape(bh, l, 2 * d)
    g = jnp.take_along_axis(packed, idx[..., None], axis=1)
    g = g.reshape(b, h, nh, l, 2 * d)
    qk_s, v_s = g[..., :d], g[..., d:]
    mb = jnp.broadcast_to(mask[:, None, None, :], (b, h, nh, l))
    valid_s = jnp.take_along_axis(mb, sorted_pos, axis=3)     # width-1 gather
    nc = nh * l // c
    q_c = qk_s.reshape(b, h, nc, c, d)
    k_c = (_len_norm(qk_s) * (d ** -0.5)).reshape(b, h, nc, c, d)
    v_c = v_s.reshape(b, h, nc, c, d)
    pos_c = sorted_pos.reshape(b, h, nc, c)
    val_c = valid_s.reshape(b, h, nc, c)
    out_c, lse_c = lsh_attend_chunks(q_c, k_c, v_c, pos_c, val_c, causal,
                                     cfg.num_chunks_before,
                                     cfg.num_chunks_after,
                                     cfg.mask_value, cfg.self_mask_value)
    out_flat = out_c.reshape(b, h, nh, l, d)
    lse_flat = lse_c.reshape(b, h, nh, l)
    lse_r = jnp.take_along_axis(lse_flat, undo_idx, axis=3)   # width-1 gather
    out_r = jnp.take_along_axis(out_flat, undo_idx[..., None], axis=3)
    w = jnp.exp(lse_r - jax.nn.logsumexp(lse_r, axis=2, keepdims=True))
    return jnp.einsum("bhnl,bhnld->bhld", w.astype(out_r.dtype), out_r)


def probe_core():
    from rtts.attention.lsh import lsh_attention_core
    from rtts.config import AttentionConfig

    cfg = AttentionConfig(kind="lsh", num_heads=H, head_dim=D, num_hashes=NH,
                          chunk_length=64, num_chunks_before=1,
                          use_pallas=False, sort_gather="take")
    key = jax.random.PRNGKey(0)
    qk = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1), (B, H, L, D),
                          jnp.bfloat16)
    mask = jnp.arange(L)[None, :] < jnp.asarray([L, L - 500])[:, None]
    rng = jax.random.PRNGKey(7)

    def new_fwd(x, vv):
        out, _ = lsh_attention_core(x, vv, cfg, mask, True, rng)
        return out.astype(x.dtype), vv

    def old_fwd(x, vv):
        return _core_old(x, vv, cfg, mask, True, rng).astype(x.dtype), vv

    def new_fb(x, vv):
        g = jax.grad(lambda a: (lsh_attention_core(a, vv, cfg, mask, True,
                                                   rng)[0]
                                .astype(jnp.float32) ** 2).sum())(x)
        return x - 0.001 * g.astype(x.dtype), vv

    def old_fb(x, vv):
        g = jax.grad(lambda a: (_core_old(a, vv, cfg, mask, True, rng)
                                .astype(jnp.float32) ** 2).sum())(x)
        return x - 0.001 * g.astype(x.dtype), vv

    def tl(fn, iters=4, repeats=4):
        loop = jax.jit(lambda x0, v0: jax.lax.fori_loop(
            0, iters, lambda i, cr: fn(*cr), (x0, v0)))
        _sync(loop(qk, v))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(loop(qk, v))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters

    # numerics check first (f32 combine vs bf16 combine: refusion class)
    o_new, _ = new_fwd(qk, v)
    o_old, _ = old_fwd(qk, v)
    diff = float(jnp.max(jnp.abs(o_new.astype(jnp.float32)
                                 - o_old.astype(jnp.float32))))
    print(f"core A/B at b{B} h{H} nh{NH} L{L} c64 (take mode); "
          f"max |new-old| = {diff:.3e}")
    t_of, t_nf = tl(old_fwd), tl(new_fwd)
    t_ob, t_nb = tl(old_fb), tl(new_fb)
    print(f"  fwd     old {t_of * 1e3:7.2f} ms  new {t_nf * 1e3:7.2f} ms  "
          f"speedup {t_of / t_nf:.2f}x")
    print(f"  fwd+bwd old {t_ob * 1e3:7.2f} ms  new {t_nb * 1e3:7.2f} ms  "
          f"speedup {t_ob / t_nb:.2f}x")


if __name__ == "__main__" and "--core" in sys.argv:
    probe_core()


# --- train-step A/B: legacy core monkeypatched into the full 8k step ---------

def probe_train8k():
    """Full longform_8k train step (fwd+bwd+Adam), shipped fused core vs
    the r3 4-gather tail — same process, same data, the VERDICT item-1
    'done' metric."""
    import dataclasses

    from rtts.attention import lsh as lsh_mod
    from rtts.config import load_config
    from rtts.models import reformer_tts as M
    from rtts.train.losses import make_stop_target, tts_loss
    from rtts.train.optim import make_optimizer
    from rtts.text import vocab_size
    import optax

    cfg = load_config("configs/longform_8k.yaml",
                      [f"model.vocab_size={vocab_size()}"])
    mcfg = cfg.model
    batch, mel_len, token_len = 2, 8192, 256
    params = M.init(jax.random.PRNGKey(0), mcfg)
    opt = make_optimizer(cfg.experiment.optim)
    opt_state = opt.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, token_len),
                                3, mcfg.vocab_size)
    tmask = jnp.ones((batch, token_len), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (batch, mel_len, mcfg.n_mels))
    mmask = jnp.ones((batch, mel_len), bool)

    def step(p, s, rng):
        def loss_fn(pp):
            pre, post, stop = M.forward(pp, mcfg, tokens, tmask, mel, mmask,
                                        rng=rng, deterministic=False)
            l, _ = tts_loss(pre, post, stop, mel, make_stop_target(mmask),
                            mmask, mcfg.stop_pos_weight)
            return l
        g = jax.grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    def legacy_core(qk, v, acfg, mask, causal, rng, buckets=None,
                    attend_fn=None, dropout_rng=None):
        m = mask if mask is not None else jnp.ones(
            (qk.shape[0], qk.shape[2]), bool)
        out = _core_old(qk, v, acfg, m, causal, rng)
        return out, (buckets if buckets is not None
                     else jnp.zeros((0,), jnp.int32))

    def time_step(label):
        jstep = jax.jit(step, donate_argnums=(0, 1))
        rng = jax.random.PRNGKey(3)
        p, s = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy,
                                                            opt_state)
        p, s = jstep(p, s, rng)
        _sync(p)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            p, s = jstep(p, s, rng)
            _sync(p)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"  {label:12s} {dt * 1e3:8.1f} ms/step  "
              f"{batch * mel_len / dt:10,.0f} frames/s", flush=True)
        return dt

    print(f"train step A/B: longform_8k b{batch} x {mel_len}")
    orig = lsh_mod.lsh_attention_core
    t_new = time_step("fused (new)")
    lsh_mod.lsh_attention_core = legacy_core
    try:
        t_old = time_step("r3 4-gather")
    finally:
        lsh_mod.lsh_attention_core = orig
    print(f"  speedup {t_old / t_new:.3f}x")


if __name__ == "__main__" and "--train8k" in sys.argv:
    probe_train8k()


# --- step-level sweep: where do the 573 ms actually go? ----------------------

def probe_sweep8k():
    """Same-process longform_8k train-step sweep over the knobs that could
    own the non-gather cost: the fused Pallas chunk-attend (retired at
    flagship shapes, never re-measured at 8k), FFN chunking, residual
    scheme."""
    import dataclasses

    from rtts.config import load_config
    from rtts.models import reformer_tts as M
    from rtts.train.losses import make_stop_target, tts_loss
    from rtts.train.optim import make_optimizer
    from rtts.text import vocab_size
    import optax

    base = load_config("configs/longform_8k.yaml",
                       [f"model.vocab_size={vocab_size()}"])
    batch, mel_len, token_len = 2, 8192, 256

    def run(label, overrides):
        from rtts.config import apply_overrides, from_dict, to_dict, Config

        cfg = from_dict(Config, apply_overrides(to_dict(base), overrides))
        mcfg = cfg.model
        params = M.init(jax.random.PRNGKey(0), mcfg)
        opt = make_optimizer(cfg.experiment.optim)
        opt_state = opt.init(params)
        tokens = jax.random.randint(jax.random.PRNGKey(1),
                                    (batch, token_len), 3, mcfg.vocab_size)
        tmask = jnp.ones((batch, token_len), bool)
        mel = jax.random.normal(jax.random.PRNGKey(2),
                                (batch, mel_len, mcfg.n_mels))
        mmask = jnp.ones((batch, mel_len), bool)

        def step(p, s, rng):
            def loss_fn(pp):
                pre, post, stop = M.forward(pp, mcfg, tokens, tmask, mel,
                                            mmask, rng=rng,
                                            deterministic=False)
                l, _ = tts_loss(pre, post, stop, mel,
                                make_stop_target(mmask), mmask,
                                mcfg.stop_pos_weight)
                return l
            g = jax.grad(loss_fn)(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s

        try:
            jstep = jax.jit(step, donate_argnums=(0, 1))
            rng = jax.random.PRNGKey(3)
            p, s = jstep(params, opt_state, rng)
            _sync(p)
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                p, s = jstep(p, s, rng)
                _sync(p)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"  {label:34s} {dt * 1e3:8.1f} ms/step  "
                  f"{batch * mel_len / dt:10,.0f} f/s", flush=True)
        except Exception as e:
            print(f"  {label:34s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)

    print(f"longform_8k step sweep, b{batch} x {mel_len}:")
    run("shipped (rev, ffn512, jnp attend)", [])
    run("pallas chunk-attend", ["model.encoder.attention.use_pallas=true",
                                "model.decoder.attention.use_pallas=true"])
    run("ffn unchunked", ["model.encoder.ffn_chunk_size=0",
                          "model.decoder.ffn_chunk_size=0"])
    run("plain residuals", ["model.encoder.reversible=false",
                            "model.decoder.reversible=false"])
    run("plain + ffn unchunked", ["model.encoder.reversible=false",
                                  "model.decoder.reversible=false",
                                  "model.encoder.ffn_chunk_size=0",
                                  "model.decoder.ffn_chunk_size=0"])
    run("pallas + plain + unchunked",
        ["model.encoder.attention.use_pallas=true",
         "model.decoder.attention.use_pallas=true",
         "model.encoder.reversible=false",
         "model.decoder.reversible=false",
         "model.encoder.ffn_chunk_size=0",
         "model.decoder.ffn_chunk_size=0"])
    run("nh2 (vs shipped nh4)",
        ["model.encoder.attention.num_hashes=2",
         "model.decoder.attention.num_hashes=2"])


if __name__ == "__main__" and "--sweep8k" in sys.argv:
    probe_sweep8k()


# --- memory calibration: actual compiled transients, plain vs rev ------------

def probe_mem8k():
    """Compiled temp_size of the longform LSH train step, plain vs
    reversible, at (b2, 8k) and (b1, 16k) — calibrates
    config._plain_transient_mb's LSH term against reality (the r3 estimate
    said 8.9 GB for b2x8k plain; the step visibly fits)."""
    import dataclasses

    from rtts.config import apply_overrides, from_dict, to_dict, Config, load_config
    from rtts.models import reformer_tts as M
    from rtts.train.losses import make_stop_target, tts_loss
    from rtts.train.optim import make_optimizer
    from rtts.text import vocab_size
    import optax

    base = load_config("configs/longform_8k.yaml",
                       [f"model.vocab_size={vocab_size()}"])

    def temp_mb(batch, mel_len, overrides):
        cfg = from_dict(Config, apply_overrides(
            to_dict(base), overrides + [f"model.max_pos={mel_len}"]))
        mcfg = cfg.model
        params = M.init(jax.random.PRNGKey(0), mcfg)
        opt = make_optimizer(cfg.experiment.optim)
        opt_state = opt.init(params)
        token_len = 256
        tokens = jnp.ones((batch, token_len), jnp.int32)
        tmask = jnp.ones((batch, token_len), bool)
        mel = jnp.zeros((batch, mel_len, mcfg.n_mels))
        mmask = jnp.ones((batch, mel_len), bool)

        def step(p, s, rng):
            def loss_fn(pp):
                pre, post, stop = M.forward(pp, mcfg, tokens, tmask, mel,
                                            mmask, rng=rng,
                                            deterministic=False)
                l, _ = tts_loss(pre, post, stop, mel,
                                make_stop_target(mmask), mmask,
                                mcfg.stop_pos_weight)
                return l
            g = jax.grad(loss_fn)(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s

        try:
            lowered = jax.jit(step, donate_argnums=(0, 1)).lower(
                params, opt_state, jax.random.PRNGKey(3))
            mem = lowered.compile().memory_analysis()
            return mem.temp_size_in_bytes / 1e6
        except Exception as e:
            return f"FAILED {type(e).__name__}: {str(e)[:120]}"

    plain = ["model.encoder.reversible=false", "model.decoder.reversible=false",
             "model.encoder.ffn_chunk_size=0", "model.decoder.ffn_chunk_size=0"]
    for b, L in ((2, 8192), (1, 16384)):
        print(f"b{b} x {L}: plain+unchunked temp "
              f"{temp_mb(b, L, plain)} MB | rev+ffn512 temp "
              f"{temp_mb(b, L, [])} MB", flush=True)


if __name__ == "__main__" and "--mem8k" in sys.argv:
    probe_mem8k()
