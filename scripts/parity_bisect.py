"""Stage-by-stage parity bisect vs the reference model (dev tool).

Walks the dual-stream forward one stage at a time on both sides with
ported weights, printing per-stage max-abs diffs — pinpoints which
module family diverges when tests/test_parity.py fails.

    JAX_PLATFORMS=cpu python scripts/parity_bisect.py --size tiny|prod
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from vm_asr_tpu.compat.parity_check import SIZES  # noqa: E402
from vm_asr_tpu.compat.ref_loader import build_reference_model  # noqa: E402
from vm_asr_tpu.compat.torch_port import state_dict_to_flax  # noqa: E402
from vm_asr_tpu.dsp import wav2spectro  # noqa: E402
from vm_asr_tpu.models.unet import DualStreamInteractiveMambaUNet  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="tiny", choices=list(SIZES))
    args = ap.parse_args()
    cfg = SIZES[args.size]

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    from vm_asr_tpu.compat.parity_check import model_kwarg_pair

    common_ref, common_flax = model_kwarg_pair(cfg, low_freq_replacement=False)
    ref = build_reference_model(
        "DualStreamInteractiveMambaUNet", interact="dual", **common_ref
    )
    params = state_dict_to_flax(ref.state_dict(), dtype=jnp.float64)
    fx = DualStreamInteractiveMambaUNet(interact="dual", **common_flax)

    t = cfg["samples"]
    x = torch.randn(1, 1, t)
    alt = torch.pow(torch.tensor(-1.0), torch.arange(t, dtype=torch.float64))
    x = x + (x.abs().max() + 1.0) * alt
    x[..., : cfg["n_fft"]] = 0
    x[..., -cfg["n_fft"]:] = 0
    xj = jnp.asarray(x.numpy())

    def D(a, b, tag):
        a = np.asarray(a)
        b = b.detach().numpy() if hasattr(b, "detach") else np.asarray(b)
        print(f"{tag}: diff {np.abs(a - b).max():.3e} scale {np.abs(b).max():.3e}",
              flush=True)

    def fapply(fn, *a):
        return fx.apply({"params": params}, *a, method=fn)

    with torch.no_grad():
        mag_t, phase_t = ref._mag_phase(x)
    mag_j, phase_j = wav2spectro(
        xj[:, 0, :], cfg["n_fft"], cfg["hop_length"], cfg["win_length"], "log2"
    )
    D(mag_j, mag_t[:, 0], "stft mag")
    D(phase_j, phase_t[:, 0], "stft phase")

    magc_t, phac_t = mag_t[..., 1:, :], phase_t[..., 1:, :]
    magc_j, phac_j = mag_j[:, 1:][..., None], phase_j[:, 1:][..., None]

    with torch.no_grad():
        m_t = ref.patch_embed_mag(magc_t)
        p_t = ref.patch_embed_phase(phac_t)
    m_j = fapply(lambda mdl, v: mdl.core_mag.embed(v), magc_j)
    p_j = fapply(lambda mdl, v: mdl.core_phase.embed(v), phac_j)
    D(m_j, m_t, "embed mag")
    D(p_j, p_t, "embed phase")

    skips_t, skips_j = [(m_t, p_t)], [(m_j, p_j)]
    n = len(cfg["depths"])
    for i in range(n):
        with torch.no_grad():
            m_t2 = ref.layers_encoder_mag[i](m_t)
            p_t2 = ref.layers_encoder_phase[i](p_t)
        m_j2 = fapply(lambda mdl, v, I=i: mdl.core_mag.encode(I, v), m_j)
        p_j2 = fapply(lambda mdl, v, I=i: mdl.core_phase.encode(I, v), p_j)
        D(m_j2, m_t2, f"enc{i} mag")
        D(p_j2, p_t2, f"enc{i} phase")
        if i < n - 1:
            skips_t.append((m_t2, p_t2))
            skips_j.append((m_j2, p_j2))
        m_t = m_t2 + p_t2
        p_t = p_t2 + m_t
        m_j = jnp.asarray(m_t.numpy())   # resync to keep per-stage isolation
        p_j = jnp.asarray(p_t.numpy())

    for i in range(n):
        if i != 0:
            ms_t, ps_t = skips_t.pop()
            ms_j, ps_j = jnp.asarray(ms_t.numpy()), jnp.asarray(ps_t.numpy())
            with torch.no_grad():
                m_t2 = ref.layers_decoder_mag[i](torch.cat([m_t, ms_t], -1))
                p_t2 = ref.layers_decoder_mag[i](torch.cat([p_t, ps_t], -1))
            m_j2 = fapply(lambda mdl, v, I=i: mdl.core_mag.decode(I, v),
                          jnp.concatenate([m_j, ms_j], -1))
            p_j2 = fapply(lambda mdl, v, I=i: mdl.core_mag.decode(I, v),
                          jnp.concatenate([p_j, ps_j], -1))
        else:
            with torch.no_grad():
                m_t2 = ref.layers_decoder_mag[i](m_t)
                p_t2 = ref.layers_decoder_phase[i](p_t)
            m_j2 = fapply(lambda mdl, v, I=i: mdl.core_mag.decode(I, v), m_j)
            p_j2 = fapply(lambda mdl, v, I=i: mdl.core_phase.decode(I, v), p_j)
        D(m_j2, m_t2, f"dec{i} mag")
        D(p_j2, p_t2, f"dec{i} phase")
        m_t = m_t2 + p_t2
        p_t = p_t2 + m_t
        m_j = jnp.asarray(m_t.numpy())
        p_j = jnp.asarray(p_t.numpy())

    ms_t, ps_t = skips_t.pop()
    ms_j, ps_j = jnp.asarray(ms_t.numpy()), jnp.asarray(ps_t.numpy())
    with torch.no_grad():
        om_t = ref.output_layer_mag(torch.cat([m_t, ms_t], -1))
        op_t = ref.output_layer_phase(torch.cat([p_t, ps_t], -1))
    om_j = fapply(lambda mdl, v: mdl.core_mag.output(v),
                  jnp.concatenate([m_j, ms_j], -1))
    op_j = fapply(lambda mdl, v: mdl.core_phase.output(v),
                  jnp.concatenate([p_j, ps_j], -1))
    D(om_j[..., 0], om_t[:, 0], "output mag")
    D(op_j[..., 0], op_t[:, 0], "output phase")


if __name__ == "__main__":
    main()
