"""Eval-protocol constants pinned to the SHIPPED reference call sites."""

import inspect


def test_tto_defaults_match_shipped_eval_call():
    """eval.py:258-263: tto_steps=100, decay_start=30, lr 3e-4 -> 1e-6."""
    from mobgs_tpu.eval.tto import make_tto
    sig = inspect.signature(make_tto)
    assert sig.parameters["steps"].default == 100
    assert sig.parameters["decay_start"].default == 30
    assert sig.parameters["lr_q"].default == 3e-4
    assert sig.parameters["lr_p"].default == 3e-4
    assert sig.parameters["lr_final"].default == 1e-6
