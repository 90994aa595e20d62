"""Decode-mode fidelity evaluation on a TRAINED checkpoint (PARITY.md
"Serving parity" methodology, now a reusable script instead of a /tmp
one-off — VERDICT r2 item 7).

For each decode mode (faithful ``recompute`` + the cached serving modes)
this reports masked mel-L1 against ground truth, mel-L1 against the
faithful recompute trajectory, and stop-length deltas; ``--kv-dtype``
re-runs the cached modes with the f8 KV cache for the fidelity-cost table.

Usage:
  python scripts/eval_decode_fidelity.py -c configs/parity_deep.yaml \
      --ckpt runs/parity_deep/checkpoints [--batch 2] [--kv-dtype float8_e4m3fn]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir (latest step used) or step dir")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--modes", default="recompute,kv_full,kv_lsh,kv_lsh_chunk")
    ap.add_argument("--kv-dtype", default=None,
                    help="re-run cached modes with this kv_cache_dtype too")
    ap.add_argument("--stop-threshold", type=float, default=None)
    ap.add_argument("--window", default=None,
                    help="wb,wf — monotonic cross-attention window for the "
                         "cached modes (decode_greedy attn_window)")
    ap.add_argument("--vocoder-ckpt", default=None,
                    help="SqueezeWave checkpoint dir; adds waveform-domain "
                         "MR-STFT scalars per decode mode (vocoded "
                         "prediction vs ground-truth audio — VERDICT r4 "
                         "item 3)")
    ap.add_argument("--waveform", action="store_true",
                    help="waveform scalars without a vocoder checkpoint "
                         "(Griffin-Lim render; absolute values carry the "
                         "phase-reconstruction floor)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from rtts.config import load_config
    from rtts.data.dataset import Manifest, TextMelDataset, split_manifest
    from rtts.infer.decode import decode_greedy, decode_greedy_recompute
    from rtts.models import reformer_tts as M
    from rtts.train.checkpoint import latest_checkpoint, restore_checkpoint
    from rtts.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config, args.override)
    if cfg.model.vocab_size <= 0:
        from rtts.text import frontend_vocab_size

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            vocab_size=frontend_vocab_size(cfg.dataset.text.level)))

    ckpt = pathlib.Path(args.ckpt)
    if not (ckpt / "leaves.npz").exists():
        latest = latest_checkpoint(ckpt)
        if latest is None:
            raise SystemExit(f"no checkpoint under {ckpt}")
        ckpt = pathlib.Path(latest)

    params0 = M.init(jax.random.PRNGKey(0), cfg.model)
    restored, step = restore_checkpoint(ckpt, {"params": params0})
    params = restored["params"]
    print(f"checkpoint: {ckpt} (step {step})")

    man = Manifest.load(
        pathlib.Path(cfg.dataset.data_dir) / cfg.dataset.manifest)
    train_man, _ = split_manifest(man, cfg.dataset.val_fraction,
                                  cfg.dataset.split_seed)
    ds = TextMelDataset(train_man, cfg.dataset)
    items = [ds[i] for i in range(min(args.batch, len(ds)))]
    batch = ds.collate(items)
    tokens = jnp.asarray(batch["tokens"])
    tmask = jnp.asarray(batch["token_mask"])
    mel_gt = batch["mel"]
    gt_mask = batch["mel_mask"]
    max_frames = mel_gt.shape[1]
    print(f"batch {tokens.shape[0]} x {max_frames} frames "
          f"(gt lengths {gt_mask.sum(1).tolist()})")

    window = (tuple(int(x) for x in args.window.split(","))
              if args.window else None)

    def run_mode(mode, kv_dtype="compute"):
        mcfg = dataclasses.replace(cfg.model, kv_cache_dtype=kv_dtype)
        st = args.stop_threshold
        fn_args = dict(max_frames=max_frames, rng=jax.random.PRNGKey(0),
                       stop_threshold=st)
        @jax.jit
        def go(p, tok, msk):
            memory = M.encode(p, mcfg, tok, msk, deterministic=True)
            if mode == "recompute":
                return decode_greedy_recompute(p, mcfg, memory, msk, **fn_args)
            return decode_greedy(p, mcfg, memory, msk, mode=mode,
                                 attn_window=window, **fn_args)

        r = go(params, tokens, tmask)
        return np.asarray(r.mel_post), np.asarray(r.lengths)

    # waveform renderer for the MR-STFT scalars: vocoder when given, else
    # Griffin-Lim on CPU (complex FFT is unsupported on some TPU backends)
    render = None
    if args.vocoder_ckpt:
        from rtts.models import squeezewave as SW
        from rtts.models.squeezewave import ensure_folded

        vckpt = pathlib.Path(args.vocoder_ckpt)
        if not (vckpt / "leaves.npz").exists():
            vl = latest_checkpoint(vckpt)
            if vl is None:
                raise SystemExit(f"no vocoder checkpoint under {vckpt}")
            vckpt = pathlib.Path(vl)
        vparams0 = SW.init(jax.random.PRNGKey(0), cfg.vocoder)
        vparams = ensure_folded(
            restore_checkpoint(vckpt, {"params": vparams0})[0]["params"])
        voc_jit = jax.jit(lambda p, mel: SW.infer(
            p, cfg.vocoder, mel, rng=jax.random.PRNGKey(0)))

        def render(mel2d):
            return np.asarray(voc_jit(vparams, jnp.asarray(mel2d)[None])[0])
    elif args.waveform:
        from rtts.audio.griffin import mel_to_audio

        def render(mel2d):
            with jax.default_device(jax.devices("cpu")[0]):
                return np.asarray(mel_to_audio(jnp.asarray(mel2d),
                                               cfg.dataset.audio, n_iter=8))

    gt_audio = None
    if render is not None:
        gt_audio = [ds.store.load(train_man.clips[i]["clip"])["audio"]
                    for i in range(len(items))]

    def waveform_row(mel, lens):
        """Per-item render of the predicted frames, scored vs GT audio."""
        from rtts.train.quality import multi_resolution_stft_distance

        scs, mrs = [], []
        for i in range(mel.shape[0]):
            wav = render(mel[i][:max(int(lens[i]), 1)])
            d = multi_resolution_stft_distance(wav, gt_audio[i])
            scs.append(d["spectral_convergence"])
            mrs.append(d["mr_stft"])
        return {"mr_stft_vs_gt": float(np.mean(mrs)),
                "spectral_convergence_vs_gt": float(np.mean(scs))}

    def l1(a, b, mask):
        m = mask[..., None]
        return float(np.abs((a - b) * m).sum() / (m.sum() * a.shape[-1]))

    def mcd(a, b, mask):
        from rtts.train.quality import mel_cepstral_distortion

        return float(mel_cepstral_distortion(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(mask)))

    gt_len = gt_mask.sum(1)
    modes = args.modes.split(",")
    results = {}
    ref_mel, ref_len = None, None
    for mode in modes:
        mel, lens = run_mode(mode)
        row = {"mel_l1_vs_gt": l1(mel, mel_gt, gt_mask),
               "mcd_vs_gt": mcd(mel, mel_gt, gt_mask),
               "stop_len_mae_vs_gt": float(np.abs(lens - gt_len).mean()),
               "lengths": lens.tolist()}
        if render is not None:
            row.update(waveform_row(mel, lens))
        if mode == "recompute":
            ref_mel, ref_len = mel, lens
        elif ref_mel is not None:
            rmask = (np.arange(max_frames)[None, :] < ref_len[:, None])
            row["mel_l1_vs_recompute"] = l1(mel, ref_mel, rmask)
            row["stop_delta_max"] = int(np.abs(lens - ref_len).max())
        results[mode] = row
        print(f"{mode:14s} L1_gt={row['mel_l1_vs_gt']:.4f} "
              f"MCD_gt={row['mcd_vs_gt']:.3f} "
              f"stopMAE_gt={row['stop_len_mae_vs_gt']:.1f} "
              + (f"MRSTFT_gt={row['mr_stft_vs_gt']:.3f} "
                 if "mr_stft_vs_gt" in row else "")
              + (f"L1_rec={row.get('mel_l1_vs_recompute'):.4f} "
                 f"stopD={row.get('stop_delta_max')}"
                 if "mel_l1_vs_recompute" in row else ""))

    if args.kv_dtype:
        print(f"\n-- kv_cache_dtype={args.kv_dtype} --")
        for mode in modes:
            if mode == "recompute":
                continue
            mel8, lens8 = run_mode(mode, kv_dtype=args.kv_dtype)
            base = results[mode]
            row = {"mel_l1_vs_gt": l1(mel8, mel_gt, gt_mask),
                   "lengths": lens8.tolist()}
            row["rel_cost_vs_gt_pct"] = (
                100.0 * (row["mel_l1_vs_gt"] - base["mel_l1_vs_gt"])
                / max(base["mel_l1_vs_gt"], 1e-9))
            row["stop_delta_vs_bf16"] = int(
                np.abs(lens8 - np.asarray(base["lengths"])).max())
            results[f"{mode}@{args.kv_dtype}"] = row
            print(f"{mode:14s} L1_gt={row['mel_l1_vs_gt']:.4f} "
                  f"rel_cost={row['rel_cost_vs_gt_pct']:+.3f}% "
                  f"stopD={row['stop_delta_vs_bf16']}")

    print("\n" + json.dumps({"step": step, "max_frames": max_frames,
                             "results": results}))


if __name__ == "__main__":
    main()
