"""Tensor-parallel ``mp`` axis: K-direction sharding equivalence.

New TPU-native capability (SURVEY.md §2.3 — the reference is single-GPU).
With a (dp, mp) mesh installed via ``set_activation_mesh``, SS2D shards its
K=4 cross-scan directions over ``mp`` (shard_map around the scan, sharding
constraints on the directional projections). Outputs must match the
dp-only run bit-for-near-bit: the partition changes layout, not maths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.models.unet import DualStreamInteractiveMambaUNet
from vm_asr_tpu.parallel import make_mesh, set_activation_mesh, shard_batch


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    set_activation_mesh(None)


def _tiny_model():
    return DualStreamInteractiveMambaUNet(
        depths=(1, 1, 1, 1), dims=4, n_fft=64, hop_length=16, win_length=64,
        drop_path_rate=0.0,
    )


def test_forward_equivalence_mp_vs_dp():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    model = _tiny_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 1, 16 * 63)).astype(np.float32))
    hf = jnp.asarray([5, 6, 7, 8])
    params = model.init(jax.random.PRNGKey(0), x, hf)

    fwd = jax.jit(lambda v, a, h: model.apply(v, a, h, deterministic=True))
    y_ref = np.asarray(fwd(params, x, hf))

    mesh = make_mesh(dp=2, mp=2, devices=jax.devices()[:4])
    set_activation_mesh(mesh)
    fwd_mp = jax.jit(lambda v, a, h: model.apply(v, a, h, deterministic=True))
    xs = shard_batch({"x": x, "hf": hf}, mesh)
    y_mp = np.asarray(fwd_mp(params, xs["x"], xs["hf"]))

    np.testing.assert_allclose(y_mp, y_ref, rtol=1e-5, atol=1e-5)


def test_grad_equivalence_mp_vs_dp():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    model = _tiny_model()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 1, 16 * 63)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((4, 1, 16 * 63)).astype(np.float32))
    hf = jnp.asarray([5, 6, 7, 8])
    params = model.init(jax.random.PRNGKey(0), x, hf)

    def loss(v, a, t, h):
        out = model.apply(v, a, h, deterministic=True)
        return jnp.mean((out - t) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, x, y, hf)

    mesh = make_mesh(dp=2, mp=2, devices=jax.devices()[:4])
    set_activation_mesh(mesh)
    xs = shard_batch({"x": x, "y": y, "hf": hf}, mesh)
    g_mp = jax.jit(jax.grad(loss))(params, xs["x"], xs["y"], xs["hf"])

    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    mp_leaves = jax.tree_util.tree_leaves(g_mp)
    for a, b in zip(ref_leaves, mp_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
