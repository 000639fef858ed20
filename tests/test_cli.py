"""CLI-level unit tests (subprocess end-to-end CLI coverage lives in
test_fault_injection.py)."""

from graphqembed_tpu.cli.train import dispatch_steps_per


def test_dispatch_steps_per():
    """The eval/ckpt/convergence quantization boundary (see the helper's
    docstring): 100 at production budgets, max_iter//20 below 2000, never 0,
    and a full budget is always >= 20 dispatches (no multi-segment
    overshoot)."""
    assert dispatch_steps_per(10_000_000) == 100
    assert dispatch_steps_per(2000) == 100
    assert dispatch_steps_per(1999) == 99
    assert dispatch_steps_per(300) == 15
    assert dispatch_steps_per(20) == 1
    assert dispatch_steps_per(1) == 1   # 1-step dispatches: fine, just slow
    for m in (1, 7, 19, 300, 1999, 2000, 10**6):
        sp = dispatch_steps_per(m)
        assert 1 <= sp <= 100
        assert sp <= max(1, m // 20) or m < 20  # never overshoots by >5%


def test_bf16_flags_reach_config(tmp_path):
    """--bf16 (and the granular dtype flags) reach GQEConfig and train a
    tiny device-pipeline run end-to-end: params come back bf16-stored, the
    serialized config records the precision, metrics are written."""
    import json

    from graphqembed_tpu.cli.train import main

    md = tmp_path / "run"
    rc = main([
        "--synthetic", "--synthetic_scale", "0.3", "--n_train_queries", "60",
        "--n_val_queries", "20", "--embed_dim", "16", "--batch_size", "16",
        "--max_iter", "40", "--max_burn_in", "10", "--val_every", "20",
        "--pipeline", "device", "--bf16", "--model_dir", str(md),
    ])
    assert rc == 0
    cfg = json.loads((md / "config.json").read_text())
    assert cfg["storage_dtype"] == "bfloat16"
    assert cfg["compute_dtype"] == "bfloat16"
    assert (md / "metrics.json").exists()


def test_storage_bf16_rejected_on_host_pipeline():
    import pytest

    from graphqembed_tpu.cli.train import main

    with pytest.raises(SystemExit, match="stochastic-rounding"):
        main(["--synthetic", "--pipeline", "host",
              "--storage_dtype", "bfloat16"])


def test_onthefly_cli_e2e(tmp_path):
    """`--pipeline onthefly` end-to-end through the CLI entrypoint: flag
    plumbing (bf16 storage + hard_neg_frac + steps accounting) reaches the
    pool-free driver, metrics/config land on disk, and the run reports
    every structure's loss."""
    import json

    from graphqembed_tpu.cli.train import main

    md = tmp_path / "run"
    rc = main([
        "--synthetic", "--synthetic_scale", "0.3", "--n_train_queries", "20",
        "--n_val_queries", "20", "--embed_dim", "16", "--batch_size", "16",
        "--max_iter", "80", "--max_burn_in", "20", "--val_every", "40",
        "--pipeline", "onthefly", "--bf16", "--hard_neg_frac", "0.75",
        "--model_dir", str(md),
    ])
    assert rc == 0
    cfg = json.loads((md / "config.json").read_text())
    assert cfg["storage_dtype"] == "bfloat16"
    assert cfg["hard_neg_frac"] == 0.75
    metrics = json.loads((md / "metrics.json").read_text())
    assert metrics["steps"] >= 80
    assert metrics["best_val_auc"] > 0.3


def test_opt_flag(tmp_path):
    """--opt sgd (the reference's optimizer flag) reaches all pipelines; the
    bf16-storage + sgd combination is rejected (SR kernel is Adam-only)."""
    import json

    import pytest

    from graphqembed_tpu.cli.train import main

    md = tmp_path / "run"
    rc = main([
        "--synthetic", "--synthetic_scale", "0.3", "--n_train_queries", "40",
        "--n_val_queries", "10", "--embed_dim", "16", "--batch_size", "16",
        "--max_iter", "30", "--max_burn_in", "10", "--val_every", "1000",
        "--pipeline", "device", "--opt", "sgd", "--model_dir", str(md),
    ])
    assert rc == 0
    assert json.loads((md / "metrics.json").read_text())["steps"] >= 30
    with pytest.raises(SystemExit, match="adam"):
        main(["--synthetic", "--pipeline", "device",
              "--storage_dtype", "bfloat16", "--opt", "sgd"])
