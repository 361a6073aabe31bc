"""Config system semantics (reference config.py:252-344)."""

import os

import pytest
import yaml

from vm_asr_tpu.core import default_config, load_config


def test_defaults_match_reference_schema():
    c = default_config()
    assert c.DATA.BATCH_SIZE == 24
    assert c.DATA.STFT.N_FFT == 1024
    assert c.MODEL.VSSM.SSM_D_STATE == 1
    assert c.MODEL.VSSM.SSM_FORWARDTYPE == "v5"
    assert c.TRAIN.OPTIMIZER.NAME == "adamw"
    assert c.MONITOR == "min lsd"


def test_yaml_merge_and_derived_updates(tmp_path):
    cfg = tmp_path / "exp.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "MODEL": {"NAME": "DualStreamInteractiveMambaUNet",
                          "VSSM": {"DIMS": 16}},
                "DATA": {"TARGET_SR": 16000, "BATCH_SIZE": 36},
            }
        )
    )
    c = load_config(str(cfg))
    assert c.MODEL.VSSM.DIMS == 16
    # derived updates keyed on TARGET_SR (reference config.py:313-320)
    assert c.DATA.STFT.HOP_LENGTH == 80
    assert c.DATA.RANDOM_RESAMPLE == [2000, 16000]
    # MULTIFILTER off truncates the LPF list (reference config.py:330-332)
    assert len(c.DATA.LPF.LPF_TRAIN) == 1


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"DATA": {"BATCH_SIZE": 99}}))
    child = tmp_path / "child.yaml"
    child.write_text(
        yaml.safe_dump({"BASE": ["base.yaml"], "DATA": {"TARGET_SR": 48000}})
    )
    c = load_config(str(child))
    assert c.DATA.BATCH_SIZE == 99
    assert c.DATA.TARGET_SR == 48000


def test_merge_from_list_coercion():
    c = default_config()
    c.merge_from_list(["DATA.BATCH_SIZE", "7", "TRAIN.BASE_LR", "0.01",
                       "DATA.SHUFFLE", "false"])
    assert c.DATA.BATCH_SIZE == 7
    assert c.TRAIN.BASE_LR == 0.01
    assert c.DATA.SHUFFLE is False


def test_freeze():
    c = default_config()
    c.freeze()
    with pytest.raises(AttributeError):
        c.DATA.BATCH_SIZE = 1


def test_shipped_configs_parse():
    here = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in sorted(os.listdir(here)):
        c = load_config(os.path.join(here, name))
        assert c.MODEL.NAME == "DualStreamInteractiveMambaUNet", name
        if "48k" in name:
            assert c.DATA.STFT.HOP_LENGTH == 240
