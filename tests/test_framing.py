"""ops.framing: corpus buffer, deferred collection, Pallas window gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.ops.framing import (
    CorpusBuffer,
    Deferred,
    _gather_frames_shifted,
    _gather_frames_xla,
    collect,
    corpus_buffer,
)


def test_corpus_buffer_layout(rng):
    xs = [rng.normal(size=n) for n in (1000, 37, 4096)]
    buf = corpus_buffer(xs, pad=128, align=8)
    cat = np.asarray(buf.x_cat)
    for i, x in enumerate(xs):
        off = int(buf.offsets[i])
        assert off % 8 == 0
        np.testing.assert_allclose(cat[off : off + len(x)],
                                   x.astype(np.float32), rtol=1e-6)
        # at least `pad` zeros after every file
        assert np.all(cat[off + len(x) : off + len(x) + 128] == 0)


def test_deferred_collect_overlaps_and_finalizes():
    d1 = Deferred(jnp.arange(4.0), lambda h: np.asarray(h).sum())
    d2 = Deferred.ready("done")
    r1, r2 = collect([d1, d2])
    assert r1 == 6.0 and r2 == "done"


@pytest.mark.slow
def test_shifted_gather_matches_dynamic_slice(rng):
    """The TPU row-gather + shift-select path is bit-identical to the
    dynamic-slice vmap (pure XLA, so verifiable on any backend)."""
    x = jnp.asarray(rng.normal(size=10000).astype(np.float32))
    for n, win in ((53, 480), (37, 17), (16, 481), (7, 128), (1, 33)):
        starts = jnp.asarray(rng.integers(0, 9000, size=n).astype(np.int32))
        a = _gather_frames_shifted(x, starts, win)
        b = _gather_frames_xla(x, starts, win)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
