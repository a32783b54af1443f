"""Disk-backed jax.export fold-program cache: round trip + fallbacks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_speech_analysis_framework_tpu.train import aot_cache


@pytest.fixture()
def export_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(
        aot_cache, "_cache_dir", lambda: str(tmp_path / "exports")
    )
    return tmp_path / "exports"


def _build():
    return jax.jit(lambda a, b: (a @ b, jnp.sum(a)))


def test_round_trip_serves_identical_results(export_dir):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)), jnp.float32)
    b = jnp.asarray(np.eye(4), jnp.float32)
    key = aot_cache.fold_cache_key("toy", ("s",), (a, b))
    traced = []

    def build():
        traced.append(1)
        return _build()

    fn1 = aot_cache.load_or_export(build, key, (a, b), tag="t")
    out1 = fn1(a, b)
    assert traced == [1]
    assert len(list(export_dir.glob("t_*.jexp"))) == 1

    # a "fresh process": same key, artifact on disk -> no re-trace
    fn2 = aot_cache.load_or_export(build, key, (a, b), tag="t")
    out2 = fn2(a, b)
    assert traced == [1]  # build never called again
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


def test_corrupt_artifact_falls_back_to_tracing(export_dir, caplog):
    a = jnp.ones((2, 2))
    key = aot_cache.fold_cache_key("toy", ("c",), (a, a))
    fn = aot_cache.load_or_export(_build, key, (a, a), tag="t")
    fn(a, a)
    (artifact,) = export_dir.glob("t_*.jexp")
    artifact.write_bytes(b"garbage")
    import logging

    with caplog.at_level(logging.WARNING):
        fn2 = aot_cache.load_or_export(_build, key, (a, a), tag="t")
    out = fn2(a, a)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(a @ a))
    assert any("unusable" in r.message for r in caplog.records)


def test_multi_device_args_bypass_cache(export_dir):
    from jax.sharding import NamedSharding, PartitionSpec

    from robust_speech_analysis_framework_tpu.parallel import make_mesh

    mesh = make_mesh(8, mp=1)
    a = jax.device_put(
        jnp.ones((8, 4)), NamedSharding(mesh, PartitionSpec("dp", None))
    )
    b = jnp.ones((4, 4))
    key = aot_cache.fold_cache_key("toy", ("m",), (a, b))
    fn = aot_cache.load_or_export(_build, key, (a, b), tag="t")
    fn(a, b)
    assert not os.path.isdir(export_dir) or not list(export_dir.glob("*"))


def test_key_separates_shapes_and_source():
    a = jnp.ones((2, 3))
    b = jnp.ones((3, 3))
    k1 = aot_cache.fold_cache_key("m", ("s",), (a, b))
    k2 = aot_cache.fold_cache_key("m", ("s",), (jnp.ones((4, 3)), b))
    k3 = aot_cache.fold_cache_key("other-model", ("s",), (a, b))
    assert len({k1, k2, k3}) == 3


def test_missing_cache_dir_uses_plain_jit(monkeypatch):
    monkeypatch.setattr(aot_cache, "_cache_dir", lambda: None)
    a = jnp.ones((2, 2))
    fn = aot_cache.load_or_export(_build, "k", (a, a), tag="t")
    out = fn(a, a)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(a @ a))
