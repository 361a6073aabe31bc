"""Model construction/forward tests: shapes, param counts, GAN critics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.models import (
    SS2D,
    DualStreamInteractiveMambaUNet,
    MambaUNet,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    VSSBlock,
)


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def test_ss2d_forward(rng):
    m = SS2D(d_model=8, d_state=1, scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_vssblock_grads(rng):
    m = VSSBlock(hidden_dim=8, drop_path=0.0, scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def _tiny_kwargs():
    """Miniature config: n_fft=128 → 64×W spectral image."""
    return dict(
        dims=4,
        depths=(1, 1, 1, 1),
        n_fft=128,
        hop_length=32,
        win_length=128,
        scan_impl="ref",
    )


def test_mamba_unet_tiny_forward(rng):
    t = 63 * 32  # → 64 frames
    model = MambaUNet(**_tiny_kwargs())
    x = jnp.asarray(rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1)
    hf = jnp.asarray([20])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, hf)
    y = jax.jit(model.apply)(params, x, hf)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("interact", ["dual", "p2m", "m2p", "single"])
def test_dual_stream_tiny_forward(interact, rng):
    t = 63 * 32
    model = DualStreamInteractiveMambaUNet(interact=interact, **_tiny_kwargs())
    x = jnp.asarray(rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1)
    hf = jnp.asarray([20])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, hf)
    y = jax.jit(model.apply)(params, x, hf)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_dual_stream_low_freq_replacement(rng):
    t = 63 * 32
    model = DualStreamInteractiveMambaUNet(
        low_freq_replacement=True, **_tiny_kwargs()
    )
    x = jnp.asarray(rng.standard_normal((2, 1, t)).astype(np.float32) * 0.1)
    hf = jnp.asarray([10, 30])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, hf)
    y = jax.jit(model.apply)(params, x, hf)
    assert y.shape == x.shape


@pytest.mark.parametrize(
    "fix,expected",
    [
        # The reference counts 3.01 M params (README.md:8), but ~764k of them
        # are the phase-stream decoders that its concat-skip forward never
        # uses (decoder-routing bug, reference model.py:1148). Our functional
        # model only materialises parameters that are actually applied:
        # default (reference-faithful routing) → 2.246 M live params;
        # corrected routing → the full 3.01 M.
        (False, 2_246_064),
        (True, 3_010_352),
    ],
)
def test_production_param_count(fix, expected):
    model = DualStreamInteractiveMambaUNet(
        dims=16,
        depths=(2, 2, 2, 2),
        n_fft=1024,
        hop_length=240,
        win_length=1024,
        concat_skip=True,
        output_version="v3",
        interact="dual",
        phase_decoder_fix=fix,
        scan_impl="ref",
    )
    x = jnp.zeros((1, 1, 122640), jnp.float32)
    hf = jnp.zeros((1,), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, hf)
    total = n_params(shapes)
    assert total == expected, f"param count {total} != {expected}"


def test_mpd_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32))
    m = MultiPeriodDiscriminator(hidden=4)
    variables = m.init(jax.random.PRNGKey(0), x, x)
    (y_r, y_g, f_r, f_g), _ = m.apply(
        variables, x, x, update_stats=True, mutable=["batch_stats"]
    )
    assert len(y_r) == 5 and len(y_g) == 5
    assert all(len(f) == 6 for f in f_r)
    assert all(np.isfinite(np.asarray(s)).all() for s in y_r + y_g)


def test_msd_forward(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 4000)).astype(np.float32))
    # hidden must satisfy the grouped-conv divisibility (groups up to 16)
    m = MultiScaleDiscriminator(hidden=16)
    variables = m.init(jax.random.PRNGKey(0), x, x)
    (y_r, y_g, f_r, f_g), _ = m.apply(
        variables, x, x, update_stats=True, mutable=["batch_stats"]
    )
    assert len(y_r) == 3
    assert all(len(f) == 8 for f in f_r)


def test_disc_batched_real_fake_matches_separate(rng):
    """The frozen-stats (generator-loss) pass batches real+fake through one
    conv stack (models.discriminator._real_fake_pass); outputs must match
    two separate passes to float-lowering tolerance (XLA tiles the batch-4
    conv differently from batch-2: observed max rel diff ~1e-7)."""
    y = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32))
    # MSD needs hidden ≥ 16 (grouped-conv divisibility, groups up to 16)
    for cls, hidden in ((MultiPeriodDiscriminator, 4),
                        (MultiScaleDiscriminator, 16)):
        m = cls(hidden=hidden)
        variables = m.init(jax.random.PRNGKey(0), y, y_hat)
        s_r, s_g, f_r, f_g = m.apply(variables, y, y_hat, update_stats=False)
        # real-only / fake-only calls take the unbatched path
        r_r, _, fr_r, _ = m.apply(variables, y, None, update_stats=False)
        g_r, _, fg_r, _ = m.apply(variables, y_hat, None, update_stats=False)
        close = lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        for a, b in zip(s_r, r_r):
            close(a, b)
        for a, b in zip(s_g, g_r):
            close(a, b)
        for fa, fb in zip(f_r, fr_r):
            for a, b in zip(fa, fb):
                close(a, b)
        for fa, fb in zip(f_g, fg_r):
            for a, b in zip(fa, fb):
                close(a, b)
