"""CLI (SURVEY.md §3.1 #1): a click command group with a global config
option and one verb per pipeline stage, mirroring the reference's surface:

    python -m rtts.cli [-c CONFIG.yaml] [-o key.path=value ...] VERB

Verbs: download, generate-corpus, preprocess, train-tts, train-vocoder,
predict, serve, export, bench.
"""

from __future__ import annotations

import pathlib

import click

from rtts.config import Config, load_config


@click.group()
@click.option("-c", "--config", "config_path", type=click.Path(exists=True),
              default=None, help="YAML config file")
@click.option("-o", "--override", "overrides", multiple=True,
              help="dot-path override, e.g. model.d_model=256")
@click.option("--platform", default=None,
              type=click.Choice(["cpu", "tpu", "axon"]),
              help="force a jax platform (default: environment's, i.e. TPU)")
@click.pass_context
def cli(ctx, config_path, overrides, platform):
    """rtts — TPU-native Reformer-TTS."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    ctx.obj = load_config(config_path, list(overrides))
    # multi-host init must precede first backend use; no-op single-process
    from rtts.parallel.mesh import initialize_distributed

    initialize_distributed(ctx.obj.experiment.mesh)


@cli.command()
@click.option("--index-url", required=True, help="transcript index URL")
@click.option("--out", "out_dir", default=None)
@click.option("--media/--no-media", "fetch_media", default=True,
              help="also download the media files referenced by pages")
@click.pass_obj
def download(cfg: Config, index_url, out_dir, fetch_media):
    """Scrape transcripts + media (requires network)."""
    from rtts.data.download import download_corpus

    out = out_dir or cfg.dataset.data_dir
    path = download_corpus(index_url, out, fetch_media=fetch_media)
    click.echo(f"wrote {path}")


@cli.command("generate-corpus")
@click.option("--out", "out_dir", default=None)
@click.option("-n", "--num-utterances", default=24)
@click.option("--long-recording", is_flag=True,
              help="one long wav + timed transcript (exercises the "
                   "cut-by-transcript-timing preprocessing stage)")
@click.pass_obj
def generate_corpus_cmd(cfg: Config, out_dir, num_utterances, long_recording):
    """Generate the synthetic speech-like corpus (offline stand-in)."""
    out = out_dir or cfg.dataset.data_dir
    if long_recording:
        from rtts.data.corpus import generate_long_recording

        tpath = generate_long_recording(out, num_utterances,
                                        cfg.dataset.audio.sample_rate)
        click.echo(f"generated long recording + timed transcript {tpath}")
        return
    from rtts.data.corpus import generate_corpus

    utts = generate_corpus(out, num_utterances, cfg.dataset.audio.sample_rate)
    click.echo(f"generated {len(utts)} utterances under {out}")


@cli.command()
@click.option("--transcripts", default=None,
              help="path to transcripts.txt (default: <data_dir>/transcripts.txt)")
@click.pass_obj
def preprocess(cfg: Config, transcripts):
    """wav + transcripts -> per-clip token/mel arrays + manifest."""
    from rtts.data.preprocess import preprocess_corpus

    tpath = transcripts or str(pathlib.Path(cfg.dataset.data_dir) / "transcripts.txt")
    mpath = preprocess_corpus(cfg.dataset, tpath)
    click.echo(f"wrote manifest {mpath}")


@cli.command("train-tts")
@click.option("--workdir", default="runs/tts")
@click.option("--max-steps", default=None, type=int)
@click.pass_obj
def train_tts_cmd(cfg: Config, workdir, max_steps):
    """Train the ReformerTTS acoustic model."""
    from rtts.train.train_tts import train_tts

    metrics = train_tts(cfg, workdir, max_steps)
    click.echo(f"done: {metrics}")


@cli.command("train-vocoder")
@click.option("--workdir", default="runs/vocoder")
@click.option("--max-steps", default=None, type=int)
@click.pass_obj
def train_vocoder_cmd(cfg: Config, workdir, max_steps):
    """Train the SqueezeWave vocoder."""
    from rtts.train.train_vocoder import train_vocoder

    metrics = train_vocoder(cfg, workdir, max_steps)
    click.echo(f"done: {metrics}")


def _load_synthesizer(cfg: Config, tts_ckpt, vocoder_ckpt, max_frames, mode):
    """Build a Synthesizer from (optional) checkpoint dirs — shared by the
    ``predict`` and ``serve`` verbs."""
    import dataclasses

    import jax

    from rtts.infer.synthesize import Synthesizer
    from rtts.models import reformer_tts as M
    from rtts.models import squeezewave as SW
    from rtts.text import frontend_vocab_size
    from rtts.train.checkpoint import latest_checkpoint, restore_checkpoint

    model_cfg = cfg.model
    if model_cfg.vocab_size <= 0:
        model_cfg = dataclasses.replace(
            model_cfg,
            vocab_size=frontend_vocab_size(cfg.dataset.text.level))
    params = M.init(jax.random.PRNGKey(0), model_cfg)
    if tts_ckpt:
        path = latest_checkpoint(tts_ckpt) or tts_ckpt
        restored, step = restore_checkpoint(path, {"params": params})
        params = restored["params"]
        click.echo(f"loaded TTS step {step} from {path}")
    voc_params = None
    if vocoder_ckpt:
        vp = SW.init(jax.random.PRNGKey(0), cfg.vocoder)
        path = latest_checkpoint(vocoder_ckpt) or vocoder_ckpt
        restored, step = restore_checkpoint(path, {"params": vp})
        voc_params = SW.fold_weightnorm(restored["params"])
        click.echo(f"loaded vocoder step {step} from {path}")

    cfg2 = dataclasses.replace(cfg, model=model_cfg)
    return Synthesizer(cfg2, params, voc_params, max_frames=max_frames,
                       mode=mode)


@cli.command()
@click.option("--text", required=True, multiple=True,
              help="text to synthesize (repeatable)")
@click.option("--tts-ckpt", default=None, help="TTS checkpoint dir")
@click.option("--vocoder-ckpt", default=None, help="vocoder checkpoint dir")
@click.option("--from-export", "export_dir", default=None,
              type=click.Path(exists=True),
              help="serve from an `rtts export` directory instead of "
                   "checkpoints (no model code / config needed)")
@click.option("--out", "out_dir", default="synth_out")
@click.option("--max-frames", default=1024)
@click.option("--seed", default=0)
@click.option("--mode", default="auto",
              type=click.Choice(["kv_full", "kv_lsh", "kv_lsh_chunk",
                                 "auto"]),
              help="AR decode cache strategy")
@click.pass_obj
def predict(cfg: Config, text, tts_ckpt, vocoder_ckpt, export_dir, out_dir,
            max_frames, seed, mode):
    """Text -> wav using trained checkpoints (Griffin-Lim if no vocoder)."""
    from rtts.audio.wav import write_wav

    if export_dir:
        from rtts.infer.export import ExportedSynthesizer

        syn = ExportedSynthesizer(export_dir)
        sample_rate = syn.manifest["audio"]["sample_rate"]
    else:
        syn = _load_synthesizer(cfg, tts_ckpt, vocoder_ckpt, max_frames, mode)
        sample_rate = cfg.dataset.audio.sample_rate
    wavs = syn(list(text), seed=seed)
    out = pathlib.Path(out_dir)
    for i, w in enumerate(wavs):
        p = out / f"sample_{i}.wav"
        write_wav(p, w, sample_rate)
        click.echo(f"wrote {p} ({len(w)} samples)")


@cli.command("export")
@click.option("--tts-ckpt", default=None, help="TTS checkpoint dir")
@click.option("--vocoder-ckpt", default=None, help="vocoder checkpoint dir")
@click.option("--out", "out_dir", default="export_out")
@click.option("--max-frames", default=1024)
@click.option("--batch-sizes", default="1",
              help="comma-separated batch sizes to export, e.g. 1,8")
@click.option("--token-len", default=None, type=int,
              help="static token budget (default: dataset.text.max_len)")
@click.option("--mode", default="auto",
              type=click.Choice(["kv_full", "kv_lsh", "kv_lsh_chunk",
                                 "auto"]),
              help="AR decode cache strategy baked into the artifact")
@click.pass_obj
def export_cmd(cfg: Config, tts_ckpt, vocoder_ckpt, out_dir, max_frames,
               batch_sizes, token_len, mode):
    """Serialize the serving graphs to StableHLO deployment artifacts.

    Weights bake into the artifacts; `predict --from-export DIR` (or
    ``rtts.infer.export.ExportedSynthesizer``) serves from the directory
    with no checkpoint or model code."""
    from rtts.infer.export import export_synthesizer

    syn = _load_synthesizer(cfg, tts_ckpt, vocoder_ckpt, max_frames, mode)
    sizes = tuple(int(b) for b in str(batch_sizes).split(",") if b)
    manifest = export_synthesizer(syn, out_dir, batch_sizes=sizes,
                                  token_len=token_len)
    click.echo(f"wrote {len(manifest['artifacts'])} artifacts + manifest "
               f"to {out_dir} (batch sizes {manifest['batch_sizes']}, "
               f"token_len {manifest['token_len']}, "
               f"max_frames {manifest['max_frames']})")


@cli.command()
@click.option("--texts-file", type=click.Path(exists=True), default=None,
              help="file with one request per line")
@click.option("--text", multiple=True, help="inline request (repeatable)")
@click.option("--tts-ckpt", default=None, help="TTS checkpoint dir")
@click.option("--vocoder-ckpt", default=None, help="vocoder checkpoint dir")
@click.option("--out", "out_dir", default="serve_out")
@click.option("--max-frames", default=1024,
              help="hard per-request frame cap (largest capacity class)")
@click.option("--strategy", default="continuous",
              type=click.Choice(["continuous", "bucketed"]),
              help="continuous = slot-recycling capacity-classed pool "
                   "(serve_pool); bucketed = synchronous length buckets")
@click.option("--slots", default=8, help="concurrent decode slots per class")
@click.option("--frames-per-token", default=8.0,
              help="length-prediction heuristic (frames per text token)")
@click.option("--seed", default=0)
@click.pass_obj
def serve(cfg: Config, texts_file, text, tts_ckpt, vocoder_ckpt, out_dir,
          max_frames, strategy, slots, frames_per_token, seed):
    """Batch-serve many texts -> wavs with variable-length batching.

    The offline counterpart of the serving engine (SURVEY.md §4.3): reads
    the whole request list, routes each request to a capacity class by
    predicted length, and decodes with continuous slot recycling
    (``Synthesizer.serve_continuous`` — measured 1.57x over pad-to-max on
    mixed-length traffic, BENCH.md) or synchronous length buckets
    (``Synthesizer.serve``)."""
    from rtts.audio.wav import write_wav

    texts = list(text)
    if texts_file:
        with open(texts_file) as f:
            texts += [line.strip() for line in f if line.strip()]
    if not texts:
        raise click.UsageError("no requests: pass --texts-file and/or --text")
    syn = _load_synthesizer(cfg, tts_ckpt, vocoder_ckpt, max_frames, "auto")
    if strategy == "continuous":
        wavs = syn.serve_continuous(texts, seed=seed, slots=slots,
                                    frames_per_token=frames_per_token)
    else:
        wavs = syn.serve(texts, seed=seed,
                         frames_per_token=frames_per_token)
    out = pathlib.Path(out_dir)
    for i, w in enumerate(wavs):
        p = out / f"sample_{i}.wav"
        write_wav(p, w, cfg.dataset.audio.sample_rate)
        click.echo(f"wrote {p} ({len(w)} samples)")


@cli.command()
@click.option("--which", default="decode",
              type=click.Choice(["decode", "e2e", "vocoder", "train",
                                 "vocoder_train",
                                 "longform", "serving", "continuous",
                                 "latency", "kernels", "all"]))
@click.pass_obj
def bench(cfg: Config, which):
    """Run the benchmark harness and print JSON line(s)."""
    from rtts.bench import run_bench
    from rtts.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    modes = (["decode", "e2e", "vocoder", "train", "vocoder_train",
              "longform", "serving",
              "continuous", "latency", "kernels"]
             if which == "all" else [which])
    for m in modes:
        click.echo(run_bench(cfg, m))


def main():
    cli(obj=None)


if __name__ == "__main__":
    main()
