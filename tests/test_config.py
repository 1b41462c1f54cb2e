"""Config precedence / validation tests (semantics ported from
/root/reference/tests/test_config.py:50-202)."""

from __future__ import annotations

import pytest

from pdf_toolkit_spark.config import DEFAULTS, deep_merge, effective_config, validate_keys
from pdf_toolkit_spark.errors import UserError


def test_defaults_pass_validation():
    cfg = effective_config()
    assert cfg == DEFAULTS


def test_precedence_defaults_then_yaml_then_overrides():
    cfg = effective_config(
        yaml_cfg={"split_ratio": 1.5, "pad_px": 10},
        overrides={"pad_px": 7},
    )
    assert cfg["split_ratio"] == 1.5  # yaml beats default
    assert cfg["pad_px"] == 7         # override beats yaml
    assert cfg["mode"] == "auto"      # default survives


def test_deep_merge_is_recursive_and_overlay_wins():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    overlay = {"a": {"y": 9}, "c": 4}
    merged = deep_merge(base, overlay)
    assert merged == {"a": {"x": 1, "y": 9}, "b": 3, "c": 4}
    assert base["a"]["y"] == 2  # inputs untouched


def test_unknown_key_fails_fast():
    with pytest.raises(UserError, match="Unknown keys"):
        effective_config(overrides={"not_a_knob": 1})
    with pytest.raises(UserError):
        validate_keys({"zz": 1}, {"a"}, "ctx")


def test_strict_bool_validation():
    with pytest.raises(UserError, match="boolean"):
        effective_config(overrides={"dry_run": "yes"})


@pytest.mark.parametrize(
    "key,value",
    [
        ("mode", "sideways"),
        ("split_ratio", 0),
        ("gutter_search_frac", 1.5),
        ("gutter_trim_px", -1),
        ("outer_margin_mode", "maybe"),
        ("outer_margin_frac", 0.3),
        ("outer_margin_auto_max_frac", 0.26),
        ("outer_margin_auto_search_frac", 0.51),
        ("outer_margin_dark_threshold", 256),
        ("outer_margin_min_run_px", 0),
        ("x_step", 0),
        ("y_step", -2),
        ("crop_threshold", -1),
        ("pad_px", -1),
        ("edge_inset_px", -3),
        ("symmetry_strategy", "diagonal"),
        ("min_area_frac", 0),
        ("pages_per_chunk", 0),
    ],
)
def test_range_checks_reject(key, value):
    with pytest.raises(UserError):
        effective_config(overrides={key: value})


def test_cross_field_constraints():
    with pytest.raises(UserError, match="y0_frac"):
        effective_config(overrides={"outer_margin_auto_y0_frac": 0.9, "outer_margin_auto_y1_frac": 0.5})
    with pytest.raises(UserError, match="20%"):
        effective_config(overrides={"outer_margin_auto_y0_frac": 0.5, "outer_margin_auto_y1_frac": 0.6})
    with pytest.raises(UserError, match="release_frac"):
        effective_config(overrides={"outer_margin_release_frac": 0.7})


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("split_ratio: 2.0\nmode: crop\n")
    from pdf_toolkit_spark.config import load_yaml

    cfg = effective_config(yaml_cfg=load_yaml(p))
    assert cfg["split_ratio"] == 2.0
    assert cfg["mode"] == "crop"


def test_yaml_must_be_mapping(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("- just\n- a list\n")
    from pdf_toolkit_spark.config import load_yaml

    with pytest.raises(UserError, match="mapping"):
        load_yaml(p)
