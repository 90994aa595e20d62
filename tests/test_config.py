import dataclasses

import pytest

from rtts.config import (
    Config,
    apply_overrides,
    from_dict,
    load_config,
    save_config,
    to_dict,
)


def test_default_config_builds():
    cfg = Config()
    assert cfg.model.n_mels == 80
    assert cfg.vocoder.n_flows == 12
    assert cfg.dataset.audio.sample_rate == 22050


def test_from_dict_nested():
    cfg = from_dict(Config, {"model": {"d_model": 128, "encoder": {"num_layers": 2}}})
    assert cfg.model.d_model == 128
    assert cfg.model.encoder.num_layers == 2
    # untouched fields keep defaults
    assert cfg.model.decoder.num_layers == 6


def test_from_dict_rejects_unknown_keys():
    with pytest.raises(KeyError):
        from_dict(Config, {"model": {"not_a_field": 1}})


def test_from_dict_type_checks():
    with pytest.raises(TypeError):
        from_dict(Config, {"model": {"d_model": "big"}})


def test_overrides_dot_paths():
    data = apply_overrides({}, ["model.d_model=64", "experiment.optim.learning_rate=3e-4",
                                "model.encoder.reversible=false"])
    cfg = from_dict(Config, data)
    assert cfg.model.d_model == 64
    assert cfg.experiment.optim.learning_rate == pytest.approx(3e-4)
    assert cfg.model.encoder.reversible is False


def test_yaml_round_trip(tmp_path):
    cfg = from_dict(Config, {"model": {"d_model": 96}, "experiment": {"name": "rt"}})
    p = tmp_path / "cfg.yaml"
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg


def test_config_frozen():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.model = None  # type: ignore[misc]
