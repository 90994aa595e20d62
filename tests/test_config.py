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


def test_union_fields_are_type_checked():
    """num_buckets: Union[int, List[int], None] — a bad value must fail at
    load time, not deep inside jit tracing."""
    ok = from_dict(Config, {"model": {"encoder": {"attention": {
        "num_buckets": [4, 4]}}}})
    assert ok.model.encoder.attention.num_buckets == [4, 4]
    ok2 = from_dict(Config, {"model": {"encoder": {"attention": {
        "num_buckets": 64}}}})
    assert ok2.model.encoder.attention.num_buckets == 64
    with pytest.raises(TypeError):
        from_dict(Config, {"model": {"encoder": {"attention": {
            "num_buckets": "64"}}}})


def test_bool_rejected_for_numeric_fields():
    """bool is an int subclass; `num_layers: true` must not mean 1."""
    with pytest.raises(TypeError):
        from_dict(Config, {"model": {"encoder": {"num_layers": True}}})
    with pytest.raises(TypeError):
        from_dict(Config, {"experiment": {"optim": {"learning_rate": True}}})


def test_override_through_null_and_scalar_nodes():
    # a null intermediate is replaced by a mapping
    data = apply_overrides({"model": None}, ["model.d_model=256"])
    assert data["model"]["d_model"] == 256
    # a scalar intermediate is a loud error, not AttributeError
    with pytest.raises(ValueError, match="not a mapping"):
        apply_overrides({"model": 3}, ["model.d_model=256"])
