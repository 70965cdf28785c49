"""Tests for the Hydra-compatible config system."""

import pytest

from ocrl_tpu.config import compose, MissingMandatoryValue


def test_compose_train_ocr_slate():
    cfg = compose("train_ocr", ["ocr=slate", "dataset=random-N5C4S4S2"])
    assert cfg.ocr.name == "SLATE"
    assert cfg.ocr.dvae.vocab_size == 4096
    assert cfg.ocr.slotattr.num_slots == 5
    assert cfg.ocr.learning.lr_dvae == pytest.approx(3e-4)
    assert cfg.batch_size == 24
    assert cfg.eval_interval == 1000
    assert cfg.dataset.name == "RandomN5C4S4S2"
    assert cfg.dataset.obs_size == 64
    # interpolation resolved
    assert "SLATE-RandomN5C4S4S2" in cfg.run_dir


def test_missing_mandatory_group_raises():
    with pytest.raises(MissingMandatoryValue):
        compose("train_ocr", ["ocr=slate"])  # dataset missing


def test_dotted_overrides_and_additions():
    cfg = compose(
        "train_ocr",
        [
            "ocr=slate",
            "dataset=random-N5C4S4S2",
            "ocr.slotattr.num_slots=6",
            "ocr.use_bcdec=True",
            "batch_size=48",
            "+extra.flag=hello",
        ],
    )
    assert cfg.ocr.slotattr.num_slots == 6
    assert cfg.ocr.use_bcdec is True
    assert cfg.batch_size == 48
    assert cfg.extra.flag == "hello"


def test_group_with_own_defaults():
    cfg = compose(
        "train_sb3",
        [
            "ocr=slate",
            "pooling=transformer",
            "sb3=ppo",
            "sb3_acnet=mlp",
            "env=target-N4C4S3S1",
        ],
    )
    # pooling/transformer composes on pooling/_base
    assert cfg.pooling.learn_aux_loss is False
    assert cfg.pooling.ocr_checkpoint.run_id == ""
    assert cfg.pooling.d_model == 128
    assert cfg.sb3.algo_kwargs.n_steps == 2048
    assert cfg.sb3_acnet.shared_net.dims == [64, 64]
    assert cfg.env.env == "TargetEnv"
    assert cfg.env.target == ["blue", "square", 0.15]
    assert cfg.env.mode == "hard"


def test_env_preset_family_complete():
    # OOD variants, obj-comp variants and unseen-combi splits all compose
    for name, key, value in [
        ("odd-one-out-N4C2S2S1-oc", "obj_comp", True),
        ("odd-one-out-N4C2S2S1-ood-ocr-color2", "COLORS", ["cyan", "pink"]),
        ("odd-one-out-N4C3S1S1-ood-unseen-combi-train1", "unseen_combi_mode", "train"),
        ("push-N3C4S1S1", "distance_to_wall", 0.15),
        ("maze-N4C4S4S2", "agent_pos", None),
        ("random-N5C4S4S2", "wo_agent", True),
    ]:
        cfg = compose(
            "train_sb3",
            ["ocr=gt", "pooling=mlp", "sb3=ppo", "sb3_acnet=mlp", f"env={name}"],
        )
        assert cfg.env[key] == value, name


def test_slotattention_preset_builds_on_slate():
    cfg = compose("train_ocr", ["ocr=slotattention", "dataset=random-N5C4S4S2"])
    assert cfg.ocr.name == "SLATE"
    assert cfg.ocr.use_bcdec is True


def test_open_dict_style_mutation():
    cfg = compose("train_ocr", ["ocr=naturecnn", "dataset=random-N5C4S4S2"])
    cfg.ocr.cnn_feat_size = 4  # runtime mutation like open_dict
    assert cfg.ocr.cnn_feat_size == 4
