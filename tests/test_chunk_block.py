"""chunk_block: the axon guard that bounds the per-call sampler batch
(NOTES_ROUND4: batch >= 250 hard-crashes the axon TPU worker)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu.runners.runner import chunk_block


def make_recording_block(calls):
    def block(params, key, init, cond=None, cond_mask=None):
        calls.append({
            "n": init.shape[0],
            "key": np.asarray(jax.random.key_data(key)).tolist(),
            "cond_n": None if cond is None else cond.shape[0],
            "mask_n": None if cond_mask is None else cond_mask.shape[0],
        })
        # output depends on the rows so concatenation order is checked
        return init + 1.0

    return block


def test_small_batch_passes_through():
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=128)
    init = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    out = block(None, jax.random.PRNGKey(0), init)
    assert len(calls) == 1 and calls[0]["n"] == 16
    np.testing.assert_allclose(out, np.asarray(init) + 1.0)


def test_batch_250_splits_into_equal_125s():
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=128)
    init = jnp.arange(250 * 2, dtype=jnp.float32).reshape(250, 2)
    cond = jnp.arange(250 * 4, dtype=jnp.float32).reshape(250, 4)
    mask = jnp.ones((250,), jnp.int32)
    out = block(None, jax.random.PRNGKey(7), init, cond, mask)
    assert [c["n"] for c in calls] == [125, 125]  # one compiled shape only
    assert [c["cond_n"] for c in calls] == [125, 125]
    assert [c["mask_n"] for c in calls] == [125, 125]
    # distinct folded keys per chunk
    assert calls[0]["key"] != calls[1]["key"]
    # rows come back in order
    np.testing.assert_allclose(out, np.asarray(init) + 1.0)


def test_ragged_batch_two_shapes_at_most():
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=100)
    init = jnp.zeros((251, 2))
    out = block(None, jax.random.PRNGKey(0), init)
    sizes = [c["n"] for c in calls]
    assert sum(sizes) == 251
    assert max(sizes) <= 100
    assert len(set(sizes)) <= 2  # at most two distinct chunk shapes
    assert out.shape == (251, 2)


def test_none_cond_handling():
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=64)
    out = block(None, jax.random.PRNGKey(0), jnp.zeros((130, 2)))
    assert all(c["cond_n"] is None and c["mask_n"] is None for c in calls)
    assert out.shape == (130, 2)


def test_env_override(monkeypatch):
    calls = []
    monkeypatch.setenv("MCVD_MAX_SAMPLER_BATCH", "10")
    block = chunk_block(make_recording_block(calls), max_rows=128)
    block(None, jax.random.PRNGKey(0), jnp.zeros((30, 2)))
    assert [c["n"] for c in calls] == [10, 10, 10]

def test_multiple_keeps_chunks_shardable():
    """Chunks stay multiples of the mesh data axis (multi-process eval
    places rows with P('data'), which rejects non-divisible batches):
    250 rows on an 8-wide data axis must NOT split into [125, 125]."""
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=128, multiple=8)
    init = jnp.arange(248 * 2, dtype=jnp.float32).reshape(248, 2)
    out = block(None, jax.random.PRNGKey(0), init)
    sizes = [c["n"] for c in calls]
    assert sum(sizes) == 248
    assert all(s % 8 == 0 for s in sizes)
    assert max(sizes) <= 128
    assert len(set(sizes)) <= 2
    np.testing.assert_allclose(out, np.asarray(init) + 1.0)


def test_multiple_exceeding_cap_wins():
    """The sharding unit is a hard floor: chunks of `multiple` rows even
    when multiple > max_rows."""
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=100, multiple=128)
    block(None, jax.random.PRNGKey(0), jnp.zeros((256, 2)))
    assert [c["n"] for c in calls] == [128, 128]


def test_non_multiple_batch_dispatches_whole():
    """A batch that is not a multiple of the sharding unit cannot be split
    below it; it is dispatched whole (the sharding layer owns the error)."""
    calls = []
    block = chunk_block(make_recording_block(calls), max_rows=100, multiple=8)
    block(None, jax.random.PRNGKey(0), jnp.zeros((250, 2)))
    assert [c["n"] for c in calls] == [250]
