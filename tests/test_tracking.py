"""Hosted experiment-tracker adapter (SURVEY.md §3.1 #18, §6.5).

The reference logged runs to a hosted tracker; rtts' adapter is optional
and offline-degradable.  No SDK or network exists in this environment, so
these tests exercise the factory resolution, the offline no-op degradation,
and the MetricLogger forwarding through the dotted-path hook.
"""

import json
import sys
import types

import pytest

from rtts.config import Config, apply_overrides, from_dict
from rtts.utils.metrics import MetricLogger
from rtts.utils.tracking import make_tracker


class FakeTracker:
    def __init__(self, run_name, config=None):
        self.run_name = run_name
        self.config = config
        self.logged = []
        self.artifacts = []
        self.finished = False

    def log(self, step, metrics):
        self.logged.append((step, dict(metrics)))

    def log_artifact(self, path, name=None):
        self.artifacts.append((path, name))

    def finish(self):
        self.finished = True


@pytest.fixture
def fake_module():
    mod = types.ModuleType("_rtts_fake_tracker")
    mod.factory = FakeTracker
    sys.modules["_rtts_fake_tracker"] = mod
    yield "_rtts_fake_tracker:factory"
    del sys.modules["_rtts_fake_tracker"]


def test_off_by_default_and_none_spec():
    assert make_tracker(None, "run") is None
    assert make_tracker("", "run") is None
    cfg = from_dict(Config, {})
    assert cfg.experiment.logging.tracker is None


def test_unknown_name_is_a_config_error():
    with pytest.raises(ValueError, match="unknown tracker"):
        make_tracker("mlflow", "run")


def test_missing_sdk_degrades_to_none_with_warning():
    # neptune/wandb are not installed here — exactly the offline posture
    # the adapter must survive
    with pytest.warns(UserWarning, match="unavailable"):
        assert make_tracker("neptune", "run") is None
    with pytest.warns(UserWarning, match="unavailable"):
        assert make_tracker("wandb", "run") is None


def test_dotted_path_factory_receives_run_and_config(fake_module):
    tr = make_tracker(fake_module, "exp7", config={"model": {"d_model": 64}})
    assert isinstance(tr, FakeTracker)
    assert tr.run_name == "exp7"
    assert tr.config == {"model": {"d_model": 64}}


def test_metric_logger_forwards_scalars_artifacts_and_finish(
        fake_module, tmp_path):
    tr = make_tracker(fake_module, "run")
    logger = MetricLogger(str(tmp_path / "m.jsonl"), echo=False, tracker=tr)
    logger.log(10, {"loss": 1.5, "note": "text"}, prefix="train/")
    logger.log_artifact(tmp_path / "mel.png", name="mel")
    logger.close()

    assert tr.logged[0][0] == 10
    assert tr.logged[0][1]["train/loss"] == 1.5
    assert tr.logged[0][1]["train/note"] == "text"  # adapters filter dtype
    assert tr.artifacts == [(str(tmp_path / "mel.png"), "mel")]
    assert tr.finished
    # local sink unaffected by the hosted one
    rec = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert rec["train/loss"] == 1.5


def test_broken_tracker_never_kills_logging(tmp_path):
    class Broken:
        def log(self, step, metrics):
            raise RuntimeError("hosted service down")

        def log_artifact(self, path, name=None):
            raise RuntimeError("down")

        def finish(self):
            raise RuntimeError("down")

    logger = MetricLogger(str(tmp_path / "m.jsonl"), echo=False,
                          tracker=Broken())
    logger.log(1, {"loss": 2.0})
    logger.log_artifact(tmp_path / "x.wav")
    logger.close()  # none of the above may raise
    assert json.loads((tmp_path / "m.jsonl").read_text())["loss"] == 2.0


def test_tracker_configurable_via_override():
    data = apply_overrides(
        {}, ["experiment.logging.tracker=_rtts_fake_tracker:factory"])
    cfg = from_dict(Config, data)
    assert cfg.experiment.logging.tracker == "_rtts_fake_tracker:factory"
