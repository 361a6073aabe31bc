"""Losses/metrics parity vs torch golden implementations
(reference model/loss.py, model/metric.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vm_asr_tpu import losses, metrics


def torch_stft_mag(x, fft, hop, win):
    w = torch.hann_window(win)
    s = torch.stft(x, fft, hop, win, window=w, return_complex=True)
    sr = torch.view_as_real(s)
    return torch.sqrt(
        torch.clamp(sr[..., 0] ** 2 + sr[..., 1] ** 2, min=1e-7)
    ).transpose(2, 1)


def torch_mrstft(x, y, factor=0.5):
    cfgs = [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]
    sc_tot, mag_tot = 0.0, 0.0
    for fft, hop, win in cfgs:
        xm = torch_stft_mag(x, fft, hop, win)
        ym = torch_stft_mag(y, fft, hop, win)
        sc_tot += torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
        mag_tot += torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm))
    return factor * sc_tot / 3, factor * mag_tot / 3


def test_multi_resolution_stft_loss_vs_torch(rng):
    x = rng.standard_normal((2, 12000)).astype(np.float32) * 0.2
    y = (x + 0.05 * rng.standard_normal((2, 12000))).astype(np.float32)
    sc_t, mag_t = torch_mrstft(torch.from_numpy(x), torch.from_numpy(y))
    sc_j, mag_j = losses.multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(sc_j), float(sc_t), rtol=2e-3)
    np.testing.assert_allclose(float(mag_j), float(mag_t), rtol=2e-3)


def test_snr_vs_torch(rng):
    out = rng.standard_normal((3, 8000)).astype(np.float32)
    tgt = (out + 0.1 * rng.standard_normal((3, 8000))).astype(np.float32)
    ot, tt = torch.from_numpy(out), torch.from_numpy(tgt)
    ref = (
        20
        * torch.log10(
            torch.norm(tt, dim=-1) / torch.norm(ot - tt, dim=-1).clamp(min=1e-8)
        )
    ).mean()
    got = metrics.snr(jnp.asarray(out), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def torch_logpow(x):
    w = torch.hann_window(2048)
    s = torch.stft(x, 2048, 512, window=w, return_complex=True)
    mag = torch.sqrt(s.real.pow(2) + s.imag.pow(2))
    return torch.log10(mag.square().clamp(1e-8))


def test_lsd_vs_torch(rng):
    out = rng.standard_normal((2, 16000)).astype(np.float32)
    tgt = (out + 0.2 * rng.standard_normal((2, 16000))).astype(np.float32)
    sp = torch_logpow(torch.from_numpy(out))
    st = torch_logpow(torch.from_numpy(tgt))
    ref = (sp - st).square().mean(dim=1).sqrt().mean()
    got = metrics.lsd(jnp.asarray(out), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-3)


@pytest.mark.parametrize("high", [True, False])
def test_lsd_bands_vs_torch(high, rng):
    out = rng.standard_normal((2, 16000)).astype(np.float32)
    tgt = (out + 0.2 * rng.standard_normal((2, 16000))).astype(np.float32)
    hf = np.array([100, 400])
    sp = torch_logpow(torch.from_numpy(out))
    st = torch_logpow(torch.from_numpy(tgt))
    vals = []
    for i in range(2):
        sl = slice(hf[i], None) if high else slice(None, hf[i])
        vals.append(
            (sp[i, sl, :] - st[i, sl, :]).square().mean(dim=0).sqrt().mean().item()
        )
    ref = float(np.mean(vals))
    fn = metrics.lsd_hf if high else metrics.lsd_lf
    got = float(fn(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(hf)))
    np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_gan_losses():
    real = [jnp.ones((2, 10)), jnp.full((2, 5), 0.8)]
    gen = [jnp.zeros((2, 10)), jnp.full((2, 5), 0.3)]
    d = losses.discriminator_loss(real, gen, "lsgan")
    np.testing.assert_allclose(float(d), (0.0 + 0.0) + (0.04 + 0.09), rtol=1e-5)
    g = losses.generator_adversarial_loss(gen, "lsgan")
    np.testing.assert_allclose(float(g), 1.0 + 0.49, rtol=1e-5)
    # wgan
    d = losses.discriminator_loss(real, gen, "wgan")
    np.testing.assert_allclose(float(d), (-1.0 + 0.0) + (-0.8 + 0.3), rtol=1e-5)


def test_feature_matching_loss():
    f_r = [[jnp.ones((2, 3)), jnp.zeros((2, 3))]]
    f_g = [[jnp.zeros((2, 3)), jnp.zeros((2, 3))]]
    got = losses.feature_matching_loss(f_r, f_g)
    np.testing.assert_allclose(float(got), 0.5, rtol=1e-6)
