from inverse_audio_synthesis_tpu.utils.config import load_config


def test_defaults_composition():
    cfg = load_config()
    assert cfg.dim == 1024
    assert cfg.embeddim == 8192
    assert cfg.nparams == 78
    assert cfg.vicreg.batch_size == 16  # full.yaml
    assert cfg.vicreg.mlp == "8192-8192-%d"
    assert cfg.audio_to_params.batch_size == 1024
    assert cfg.torchsynth.rate == 44100
    assert cfg.torchsynth.buffer_size_seconds == 4.0


def test_group_override():
    cfg = load_config(overrides=["vicreg=fast"])
    assert cfg.vicreg.batch_size == 1024
    assert cfg.vicreg.mlp == "256-256-%d"
    assert cfg.vicreg.do_pretrain is True


def test_value_overrides():
    cfg = load_config(
        overrides=[
            "vicreg.optim.name=sgd",
            "vicreg.optim.args.lr=0.1",
            "dim=64",
            "log=wand",
        ]
    )
    assert cfg.vicreg.optim.name == "sgd"
    assert cfg.vicreg.optim.args.lr == 0.1
    assert cfg.dim == 64
    assert cfg.log == "wand"


def test_yaml_roundtrip():
    cfg = load_config()
    assert "embeddim: 8192" in cfg.to_yaml()
    assert cfg.get_dotted("vicreg.optim.args.base_lr") == 3.2
    assert cfg.get_dotted("nope.nope", "fallback") == "fallback"


def test_unknown_override_key_raises():
    """Strict like hydra: a typo'd override must error, not silently create a dead
    key (reference surface: pretrain.py:51 + README.harmonai:32-33 — hydra rejects
    unknown keys in struct mode)."""
    import pytest

    with pytest.raises(KeyError, match="batchsize"):
        load_config(overrides=["vicreg.batchsize=64"])  # typo for batch_size
    with pytest.raises(KeyError):
        load_config(overrides=["no_such_top_level=1"])


def test_plus_prefix_creates_new_key():
    """Hydra's append syntax: '+key=value' deliberately adds a key."""
    cfg = load_config(overrides=["+vicreg.my_new_flag=7", "+toplevel.nested=a"])
    assert cfg.vicreg.my_new_flag == 7
    assert cfg.toplevel.nested == "a"
