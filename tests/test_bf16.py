"""BF16 inference variant: accuracy proximity, size halving, artifact I/O."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantnet.core.types import tree_nbytes
from quantnet.models import convnet
from quantnet.quantize import bf16


@pytest.fixture(scope="module")
def model():
    return convnet.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def batch():
    return jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3), jnp.float32)


def test_bf16_close_to_fp32(model, batch):
    params, state = model
    ref, _ = convnet.apply(params, state, batch, train=False)
    bp, bs = bf16.quantize(params, state)
    got, _ = convnet.apply(bp, bs, batch, train=False)
    # logits live in roughly [-5, 5]; bf16 has ~3 decimal digits
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15, rtol=0.05)
    assert got.dtype == jnp.float32  # f32 accumulate/output


def test_bf16_halves_size(model):
    params, state = model
    bp, _ = bf16.quantize(params, state)
    ratio = tree_nbytes(params) / tree_nbytes(bp)
    assert 1.9 < ratio < 2.2  # BN fold changes param count slightly


def test_bf16_weights_are_bf16(model):
    bp, _ = bf16.quantize(*model)
    leaves = jax.tree_util.tree_leaves(bp)
    float_leaves = [l for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)]
    assert float_leaves and all(l.dtype == jnp.bfloat16 for l in float_leaves)


def test_bf16_artifact_roundtrip(model, tmp_path):
    from quantnet.train import checkpoint as ckpt

    bp, bs = bf16.quantize(*model)
    path = str(tmp_path / "bf16")
    ckpt.save_artifact(path, {"params": bp, "state": bs}, {"scheme": "bf16"})
    tree, meta = ckpt.load_artifact(path)
    assert meta["scheme"] == "bf16"
    restored = tree["params"]
    orig_leaves = jax.tree_util.tree_leaves(bp)
    new_leaves = jax.tree_util.tree_leaves(restored)
    for a, b in zip(orig_leaves, new_leaves):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_bf16_jits_and_is_nan_free(model, batch):
    bp, bs = bf16.quantize(*model)
    logits, _ = jax.jit(lambda p, s, x: convnet.apply(p, s, x, train=False))(
        bp, bs, batch
    )
    assert np.isfinite(np.asarray(logits)).all()
