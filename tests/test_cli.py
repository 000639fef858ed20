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
