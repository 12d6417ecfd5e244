import pytest
import yaml

from mucon_tpu.config import ConfigNode, get_cfg_defaults, update_config


def test_defaults_schema_matches_reference():
    cfg = get_cfg_defaults()
    # spot-check the option tree against the reference schema
    # (/root/reference/src/configs/mucon/default.py)
    assert cfg.experiment_name == "mucon_default"
    assert cfg.trainer.num_epochs == 150
    assert cfg.trainer.scheduler.step.milestones == [70]
    assert cfg.trainer.scheduler.step.gamma == 0.1
    assert cfg.trainer.clip_grad_norm_value == 100.0
    assert cfg.model.loss.mul_mucon == 1.0
    assert cfg.model.loss.mul_smoothing == 0.1
    assert cfg.model.loss.length_width == 2.0
    assert cfg.model.ft.stages == [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
    assert cfg.model.ft.pooling_layers == [1, 2, 4, 8]
    assert cfg.model.fs.encoder.hidden_size == 128
    assert cfg.model.loss.mucon.type == "flint"
    assert cfg.model.loss.mucon.template == "box"
    assert cfg.evaluator.viterbi.multi_length is False


def test_merge_from_list_coercion():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(
        ["dataset.split", "3", "trainer.learning_rate", "0.1",
         "model.ft.pooling", "False", "model.loss.mucon.template", "gaussian"]
    )
    assert cfg.dataset.split == 3
    assert cfg.trainer.learning_rate == 0.1
    assert cfg.model.ft.pooling is False
    assert cfg.model.loss.mucon.template == "gaussian"


def test_merge_list_override():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["model.ft.stages", "[1, 2, 4]"])
    assert cfg.model.ft.stages == [1, 2, 4]


def test_unknown_key_raises():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["nope.nope", "1"])


def test_freeze_semantics():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.dataset.split = 2
    cfg.defrost()
    cfg.dataset.split = 2
    assert cfg.dataset.split == 2


def test_yaml_roundtrip(tmp_path):
    cfg = get_cfg_defaults()
    cfg.dataset.split = 4
    p = tmp_path / "config.yaml"
    cfg.dump_to_file(str(p))

    cfg2 = get_cfg_defaults()
    cfg2.merge_from_file(str(p))
    assert cfg2.dataset.split == 4
    assert cfg2.to_dict() == cfg.to_dict()


def test_update_config_composition(tmp_path):
    p = tmp_path / "override.yaml"
    with open(p, "w") as f:
        yaml.safe_dump({"trainer": {"num_epochs": 3}}, f)
    cfg = update_config(
        get_cfg_defaults(),
        file_configs=[str(p)],
        set_configs=["dataset.split", "2"],
    )
    assert cfg.trainer.num_epochs == 3
    assert cfg.dataset.split == 2
    assert cfg.is_frozen()


def test_clone_is_independent():
    cfg = get_cfg_defaults()
    cfg.freeze()
    c2 = cfg.clone()
    c2.dataset.split = 2
    assert cfg.dataset.split == 1
