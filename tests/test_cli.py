"""CLI surface tests via click's runner (SURVEY.md §3.1 #1)."""

import pathlib

from click.testing import CliRunner

from rtts.cli import cli


def test_help_lists_verbs():
    r = CliRunner().invoke(cli, ["--help"])
    assert r.exit_code == 0
    for verb in ["download", "generate-corpus", "preprocess", "train-tts",
                 "train-vocoder", "predict", "bench"]:
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
