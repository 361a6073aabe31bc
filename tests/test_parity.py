"""Forward-equivalence parity vs the reference PyTorch model.

The heavy lifting lives in vm_asr_tpu/compat/parity_check.py: it builds
the *reference* model (model/model.py:1006-1552) on CPU with its CUDA
scan and Triton cross-scan swapped for pure-torch equivalents, ports the
randomly-initialised weights through compat.torch_port, and compares
waveform outputs in float64 (so only the shared fp32 scan interior
contributes noise).

Run in a subprocess: the check flips the process-global jax x64 /
platform flags, which must not leak into other tests.
"""

import json
import os
import subprocess
import sys

import pytest

from vm_asr_tpu.compat.ref_loader import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(model: str, pin_stft: bool = False) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "-m", "vm_asr_tpu.compat.parity_check",
           "--model", model, "--size", "tiny"]
    if pin_stft:
        cmd.append("--pin-stft")
    out = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_dual_stream_forward_parity():
    r = _run("dual")
    # float64 run: anything beyond the fp32 scan interior (~1e-5) is a
    # wiring bug. Observed: ~6e-8.
    assert r["rel"] < 1e-5, r


def test_gradient_parity_full_gan_loss():
    """Training-step gradient parity: the FULL generator GAN loss (L1 +
    multi-res STFT + MPD adversarial + feature matching, reference
    trainer/trainer.py:318-438) and one discriminator step, every
    parameter gradient compared in float64 (parity_check.run_grad_parity)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "vm_asr_tpu.compat.parity_check", "--grads",
         "--size", "tiny"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    # The floor is fp32-interior noise, not f64 precision: both frameworks
    # compute A = -exp(A_logs) and the scan interior in fp32 by reference
    # semantics (vmamba.py:1322,1481), and torch/XLA fp32 transcendentals
    # differ by ulps — the same floor behind the 5.6e-8 forward parity.
    # Backprop through ~30 scan layers amplifies it ~100×. Observed:
    # gen_tree_rel 6.2e-6, disc_tree_rel 2.4e-7, worst leaf 5e-5 (on
    # leaves whose own grads are ~1e-8 — noise over a small scale).
    assert r["gen_worst_rel"] < 5e-4, r
    assert r["disc_worst_rel"] < 5e-4, r
    assert r["gen_tree_rel"] < 3e-5, r
    assert r["disc_tree_rel"] < 3e-6, r
    assert abs(r["gen_loss_ref"] - r["gen_loss_flax"]) < 1e-4 * abs(
        r["gen_loss_ref"]
    ), r


def test_single_stream_forward_parity():
    r = _run("mamba")
    # the single-stream normalisation amplifies the scan noise slightly;
    # observed ~7e-6.
    assert r["rel"] < 1e-4, r


def test_latent_variant_forward_parity():
    # The 5-dim latent bottleneck variant (reference model.py:299-332).
    # pin-stft: its 128-pt-FFT geometry hits the boundary-frame ±π
    # convention noise, so both sides run from identical spectrograms.
    r = _run("dual5", pin_stft=True)
    assert r["rel"] < 1e-5, r


@pytest.mark.parametrize("kind", ["mpd", "msd"])
def test_discriminator_forward_parity(kind):
    # HiFi-GAN discriminators vs the reference (spectral-norm effective
    # weights transferred; power iterations converged on both sides —
    # residual error is the σ-estimate convergence, ~1e-5).
    r = _run(kind)
    assert r["rel"] < 1e-3, r
    assert r["fmap_max_abs"] < 1e-3, r


def test_load_torch_checkpoint_roundtrip(tmp_path):
    """The user-facing .pth import path: a reference-style checkpoint blob
    ({name, epoch, state_dict, ...}, base_trainer.py:130-179) converts into
    a flax params tree with the expected roots and shapes."""
    import subprocess
    import textwrap

    script = textwrap.dedent("""
        import jax
        # The JAX_PLATFORMS env var is not enough here: the environment's
        # sitecustomize pins jax_platforms programmatically, which overrides
        # the env and dials the remote TPU tunnel (hangs when it is down).
        jax.config.update("jax_platforms", "cpu")
        import json, sys, torch
        from vm_asr_tpu.compat.ref_loader import build_reference_model
        from vm_asr_tpu.compat.torch_port import load_torch_checkpoint

        torch.manual_seed(0)
        m = build_reference_model(
            "DualStreamInteractiveMambaUNet",
            patch_size=4, in_chans=1, depths=[1, 1, 1, 1], dims=[8, 16, 32, 64],
            ssm_d_state=1, ssm_ratio=2.0, ssm_dt_rank="auto",
            ssm_act_layer="silu", ssm_conv=3, ssm_conv_bias=True,
            ssm_drop_rate=0.0, ssm_init="v0", forward_type="v5",
            mlp_ratio=4.0, mlp_act_layer="gelu", mlp_drop_rate=0.0, gmlp=False,
            drop_path_rate=0.1, patch_norm=True, norm_layer="LN",
            patchembed_version="v2", downsample_version="v1",
            upsample_version="v1", output_version="v3", concat_skip=True,
            interact="dual", n_fft=64, hop_length=16, win_length=64,
            spectro_scale="log2", low_freq_replacement=True,
        )
        path = sys.argv[1]
        torch.save({"name": "G", "epoch": 3, "state_dict": m.state_dict(),
                    "monitor_best": 0.5}, path)
        tree = load_torch_checkpoint(path)
        assert set(tree) == {"core_mag", "core_phase"}, sorted(tree)
        k = tree["core_mag"]["patch_embed"]["conv1"]["kernel"]
        assert k.shape == (3, 3, 1, 4), k.shape
        print(json.dumps({"ok": True}))
    """)
    out = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "ckpt-best-G.pth")],
        cwd=REPO, env=dict(os.environ, JAX_PLATFORMS="cpu"),
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["ok"]
