"""CLI surface tests via click's runner (SURVEY.md §3.1 #1)."""

import pathlib

from click.testing import CliRunner

from rtts.cli import cli


def test_help_lists_verbs():
    r = CliRunner().invoke(cli, ["--help"])
    assert r.exit_code == 0
    for verb in ["download", "generate-corpus", "preprocess", "train-tts",
                 "train-vocoder", "predict", "serve", "export", "bench"]:
        assert verb in r.output


def test_generate_and_preprocess(tmp_path):
    runner = CliRunner()
    data = str(tmp_path / "data")
    r = runner.invoke(cli, ["-o", f"dataset.data_dir={data}",
                            "generate-corpus", "--out", data, "-n", "3"])
    assert r.exit_code == 0, r.output
    assert (pathlib.Path(data) / "transcripts.txt").exists()
    r = runner.invoke(cli, ["-o", f"dataset.data_dir={data}", "preprocess"])
    assert r.exit_code == 0, r.output
    assert (pathlib.Path(data) / "manifest.json").exists()


def test_config_file_and_override(tmp_path):
    cfgfile = tmp_path / "c.yaml"
    cfgfile.write_text("model:\n  d_model: 48\n")
    # an invalid override must fail loudly
    r = CliRunner().invoke(cli, ["-c", str(cfgfile), "-o", "model.bogus=1",
                                 "generate-corpus", "--out", str(tmp_path)])
    assert r.exit_code != 0
    assert "bogus" in str(r.exception)


def test_download_offline_error_is_actionable(tmp_path):
    r = CliRunner().invoke(cli, ["download", "--index-url",
                                 "http://example.invalid/x",
                                 "--out", str(tmp_path)])
    assert r.exit_code != 0
    assert "generate_corpus" in str(r.exception)


def test_serve_verb_writes_wavs(tmp_path):
    """End-to-end `serve` verb: texts file -> one wav per request via the
    continuous-batching pool (random init, Griffin-Lim fallback)."""
    tf = tmp_path / "texts.txt"
    tf.write_text("hello there\n\na second longer request for the pool\n")
    out = tmp_path / "out"
    tiny = [
        "model.d_model=32", "model.n_mels=20", "model.dec_prenet_hidden=16",
        "model.postnet_channels=16", "model.max_pos=256",
        "model.compute_dtype=float32", "model.stop_threshold=2.0",
        "dataset.audio.n_mels=20",
    ]
    for stack in ("encoder", "decoder"):
        tiny += [f"model.{stack}.num_layers=1", f"model.{stack}.d_model=32",
                 f"model.{stack}.d_ff=64", f"model.{stack}.attention.kind=full",
                 f"model.{stack}.attention.num_heads=2",
                 f"model.{stack}.attention.head_dim=16"]
    tiny += ["model.encoder.causal=false", "model.decoder.causal=true"]
    args = []
    for o in tiny:
        args += ["-o", o]
    r = CliRunner().invoke(cli, args + [
        "serve", "--texts-file", str(tf), "--text", "an inline one",
        "--out", str(out), "--max-frames", "64", "--slots", "2",
        "--frames-per-token", "2.0"])
    assert r.exit_code == 0, r.output
    wavs = sorted(out.glob("sample_*.wav"))
    assert len(wavs) == 3          # 2 file lines (blank skipped) + 1 inline

    # no requests at all -> usage error
    r = CliRunner().invoke(cli, args + ["serve"])
    assert r.exit_code != 0


def test_export_verb_and_predict_from_export(tmp_path):
    """`export` writes StableHLO artifacts + manifest; `predict
    --from-export` serves wavs from the directory with NO config/overrides
    (self-contained).  No --vocoder-ckpt was given, so this also exercises
    the TTS-only export's Griffin-Lim fallback from the manifest's STFT
    params."""
    tiny = [
        "model.d_model=32", "model.n_mels=20", "model.dec_prenet_hidden=16",
        "model.postnet_channels=16", "model.max_pos=256",
        "model.compute_dtype=float32", "model.stop_threshold=2.0",
        "dataset.audio.n_mels=20", "dataset.text.max_len=64",
        "vocoder.n_mels=20", "vocoder.n_flows=2", "vocoder.n_group=16",
        "vocoder.n_early_every=4", "vocoder.n_early_size=4",
        "vocoder.wn_layers=2", "vocoder.wn_channels=16",
        "vocoder.hop_length=16", "vocoder.audio_segment_length=256",
    ]
    for stack in ("encoder", "decoder"):
        tiny += [f"model.{stack}.num_layers=1", f"model.{stack}.d_model=32",
                 f"model.{stack}.d_ff=64",
                 f"model.{stack}.attention.kind=full",
                 f"model.{stack}.attention.num_heads=2",
                 f"model.{stack}.attention.head_dim=16"]
    tiny += ["model.encoder.causal=false", "model.decoder.causal=true"]
    args = []
    for o in tiny:
        args += ["-o", o]
    exp_dir = tmp_path / "export"
    runner = CliRunner()
    r = runner.invoke(cli, args + [
        "export", "--out", str(exp_dir), "--max-frames", "16"])
    assert r.exit_code == 0, r.output
    assert (exp_dir / "manifest.json").exists()
    assert list(exp_dir.glob("tts_b*.stablehlo"))

    out = tmp_path / "wavs"
    # NOTE: no -o overrides here — the export directory is self-contained
    r = runner.invoke(cli, ["predict", "--from-export", str(exp_dir),
                            "--text", "hello world", "--out", str(out)])
    assert r.exit_code == 0, r.output
    assert len(sorted(out.glob("sample_*.wav"))) == 1
