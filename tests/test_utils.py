"""Profiling, logging, determinism and OOM-downshift utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.utils import (
    ThroughputMeter,
    deterministic_check,
    get_logger,
    stage_timer,
    with_oom_downshift,
)


def test_throughput_meter():
    m = ThroughputMeter()
    m.add("extract", 2.0, audio_seconds=100.0, items=10)
    m.add("extract", 2.0, audio_seconds=100.0, items=10)
    assert m.stages["extract"].audio_sec_per_sec == pytest.approx(50.0)
    assert "extract" in m.report()
    d = m.as_dict()
    assert d["extract"]["items"] == 20


def test_stage_timer_syncs():
    m = ThroughputMeter()
    x = jnp.ones((100, 100))
    with stage_timer(m, "matmul", audio_seconds=1.0, sync=x):
        y = x @ x
    assert m.stages["matmul"].seconds > 0


def test_deterministic_jit():
    f = jax.jit(lambda x: jnp.cumsum(jnp.sin(x) * 1e3))
    x = jnp.asarray(np.random.default_rng(0).normal(size=1000), jnp.float32)
    assert deterministic_check(lambda: f(x), runs=3)


def test_model_forward_deterministic():
    from robust_speech_analysis_framework_tpu.models import CNNLSTM

    model = CNNLSTM(input_dim=8, cnn_out_channels=4, lstm_hidden_dim=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    assert deterministic_check(lambda: fwd(variables, x), runs=3)


def test_oom_downshift():
    calls = []

    def fn(batch):
        calls.append(len(batch))
        if len(batch) > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory while allocating")
        return [x * 10 for x in batch]

    out = with_oom_downshift(fn, [1, 2, 3, 4, 5, 6, 7, 8])
    assert out == [10, 20, 30, 40, 50, 60, 70, 80]
    assert max(calls[1:]) <= 4  # splits happened


def test_oom_downshift_propagates_other_errors():
    def fn(batch):
        raise ValueError("not an oom")

    with pytest.raises(ValueError):
        with_oom_downshift(fn, [1, 2, 3])


def test_logger():
    log = get_logger("rsaf.test")
    log.info("hello")
    assert log.name == "rsaf.test"
