"""config.json inheritance on the sample/eval CLIs.

Regression for the round-4 flagship-eval bug: a model trained with
`--diff_objective pred_x0` was evaluated through a model built with the
default pred_noise, so `model_predictions` misread every network output
(reference analogue: the flag surface of srcs/sample.py, which has no
persisted config and relies on the user repeating every flag).  The
trainer persists load-bearing hyperparameters (save_run_config) and
`apply_run_config` must inherit them for any flag the user did not pass
explicitly — with explicit CLI flags winning.
"""

import json

from ladiffcodec_tpu.sample import get_parser, apply_run_config
from ladiffcodec_tpu.utils.checkpoint import load_run_config, save_run_config


def _write_cfg(tmp_path, **kv):
    exp = tmp_path / "exp"
    (exp / "model_best").mkdir(parents=True)
    (exp / "config.json").write_text(json.dumps(kv))
    return str(exp / "model_best")


def test_inherits_objective_scale_std(tmp_path):
    ckpt = _write_cfg(
        tmp_path, diff_objective="pred_x0", global_scale=1.3, data_std=0.065
    )
    parser = get_parser()
    argv = ["--model_path", ckpt]
    args = parser.parse_args(argv)
    assert args.diff_objective == "pred_noise"  # CLI default pre-inherit
    apply_run_config(args, parser, argv)
    assert args.diff_objective == "pred_x0"
    assert args.global_scale == 1.3
    assert args.data_std == 0.065


def test_explicit_flag_beats_config(tmp_path):
    ckpt = _write_cfg(tmp_path, diff_objective="pred_x0", global_scale=1.3)
    parser = get_parser()
    argv = ["--model_path", ckpt, "--diff_objective", "pred_v"]
    args = parser.parse_args(argv)
    apply_run_config(args, parser, argv)
    assert args.diff_objective == "pred_v"  # explicit wins
    assert args.global_scale == 1.3  # non-explicit still inherited


def test_none_in_config_keeps_cli_default(tmp_path):
    ckpt = _write_cfg(tmp_path, data_std=None, diff_objective="pred_x0")
    parser = get_parser()
    argv = ["--model_path", ckpt]
    args = parser.parse_args(argv)
    default_std = args.data_std
    apply_run_config(args, parser, argv)
    assert args.data_std == default_std  # None = trainer left it unset
    assert args.diff_objective == "pred_x0"


def test_missing_config_is_noop(tmp_path):
    exp = tmp_path / "exp"
    (exp / "model_best").mkdir(parents=True)  # no config.json anywhere
    parser = get_parser()
    argv = ["--model_path", str(exp / "model_best")]
    args = parser.parse_args(argv)
    before = vars(args).copy()
    apply_run_config(args, parser, argv)
    assert vars(args) == before


def test_save_load_roundtrip(tmp_path):
    save_run_config(
        {"global_scale": 1.3, "diff_objective": "pred_x0"}, str(tmp_path), "e1"
    )
    # found from the exp dir AND from a checkpoint subdir
    assert load_run_config(tmp_path / "e1")["global_scale"] == 1.3
    (tmp_path / "e1" / "model_best").mkdir()
    assert (
        load_run_config(tmp_path / "e1" / "model_best")["diff_objective"]
        == "pred_x0"
    )
