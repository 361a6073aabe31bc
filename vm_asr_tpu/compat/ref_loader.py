"""Load the reference PyTorch VM-ASR model on CPU (no CUDA / Triton).

The reference's selective scan is a CUDA extension
(kernels/selective_scan/csrc/...) and its cross-scan/merge are Triton
kernels (model/csm_triton.py). Neither runs on CPU, so this loader:

1. installs import stubs for absent packages (``stubs.install_stubs``),
2. imports the reference ``model`` package from ``/root/reference``,
3. swaps, *before model construction*, the module-level names that
   SS2D.__initv2__ captures into its forward partials
   (model/vmamba.py:771-850):

   - ``SelectiveScanCore/Oflex/Mamba`` → a pure-torch chunked scan with
     identical semantics (the algebra of
     kernels/selective_scan/csrc/selective_scan/cus/selective_scan_fwd_kernel.cuh),
   - ``CrossScanTriton/CrossMergeTriton`` → the reference's own
     pure-torch ``CrossScan/CrossMerge`` (model/vmamba.py:27-74).

The resulting model is forward- and backward-capable on CPU and serves
as the golden oracle for the parity test (tests/test_parity.py) and as
the weight source for ``torch_port``.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Optional

from .stubs import install_stubs

DEFAULT_REFERENCE_ROOT = os.environ.get("VM_ASR_REFERENCE", "/root/reference")


def reference_available(root: Optional[str] = None) -> bool:
    root = root or DEFAULT_REFERENCE_ROOT
    return os.path.isfile(os.path.join(root, "model", "vmamba.py"))


# ---------------------------------------------------------------------------
# Pure-torch selective scan (chunked closed form)
# ---------------------------------------------------------------------------

def selective_scan_torch(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=True, chunk=128
):
    """CPU selective scan with the CUDA extension's exact semantics.

    Shapes (cus/selective_scan.cpp:166-215): u, delta ``(b, k·d, L)``;
    A ``(k·d, n)``; B, C ``(b, k, n, L)``; D, delta_bias ``(k·d,)``.
    Recurrence: ``h_t = exp(Δ_t A) h_{t-1} + Δ_t B_t u_t``,
    ``y_t = C_t·h_t + D u_t`` with ``Δ = softplus(delta + bias)``.

    Instead of a Python loop over L, each chunk is solved in closed form:
    with ``cum_t = Σ_{r≤t} Δ_r A`` (all terms ≤ 0 since A < 0),
    ``h_t = exp(cum_t)·h_0 + Σ_{s≤t} exp(cum_t − cum_s)·Δ_s B_s u_s`` —
    every exponent is ≤ 0, so the pairwise weight matrix is stable.
    Maths in fp32 regardless of input dtype, matching both the CUDA
    kernel (fp32 accumulation) and this framework's scan kernels.
    """
    import torch
    import torch.nn.functional as F

    in_dtype = u.dtype
    b, kd, L = u.shape
    if B.dim() == 3:
        B = B.unsqueeze(1)
    if C.dim() == 3:
        C = C.unsqueeze(1)
    k = B.shape[1]
    d = kd // k
    n = A.shape[1]

    dt = delta.float()
    if delta_bias is not None:
        dt = dt + delta_bias.view(1, kd, 1).float()
    if delta_softplus:
        dt = F.softplus(dt)

    uf = u.float()
    Bf = B.float().unsqueeze(2).expand(b, k, d, n, L).reshape(b, kd, n, L)
    Cf = C.float().unsqueeze(2).expand(b, k, d, n, L).reshape(b, kd, n, L)

    la = dt.unsqueeze(2) * A.float().view(1, kd, n, 1)  # (b, kd, n, L), ≤ 0
    inp = (dt * uf).unsqueeze(2) * Bf  # Δ·B·u

    h0 = uf.new_zeros((b, kd, n))
    ys = []
    for s in range(0, L, chunk):
        e = min(s + chunk, L)
        c = e - s
        cum = torch.cumsum(la[..., s:e], dim=-1)  # (b, kd, n, c)
        expo = cum.unsqueeze(-1) - cum.unsqueeze(-2)  # (..., t, s): ≤ 0 on tril
        mask = torch.tril(torch.ones(c, c, dtype=torch.bool, device=u.device))
        w = torch.exp(expo.masked_fill(~mask, float("-inf")))
        h = torch.einsum("bdnts,bdns->bdnt", w, inp[..., s:e])
        h = h + torch.exp(cum) * h0.unsqueeze(-1)
        h0 = h[..., -1]
        ys.append(torch.einsum("bdnt,bdnt->bdt", Cf[..., s:e], h))
    y = torch.cat(ys, dim=-1)
    if D is not None:
        y = y + D.float().view(1, kd, 1) * uf
    return y.to(in_dtype)


class TorchRefScan:
    """Drop-in for SelectiveScanCore/Oflex/Mamba.apply (vmamba.py:273-393).

    Plain differentiable torch ops — no autograd.Function needed; the
    trailing (nrows, backnrows, ssoflex) tuning args are ignored.
    """

    @staticmethod
    def apply(u, delta, A, B, C, D=None, delta_bias=None,
              delta_softplus=True, *tuning_args):
        return selective_scan_torch(u, delta, A, B, C, D, delta_bias,
                                    delta_softplus)


# ---------------------------------------------------------------------------
# Import + patch
# ---------------------------------------------------------------------------

_cached: Dict[str, Any] = {}


def load_reference_modules(root: Optional[str] = None):
    """Import the reference ``model`` package, patched for CPU. Returns the
    ``model.model`` module (MambaUNet, DualStreamInteractiveMambaUNet, ...)."""
    root = root or DEFAULT_REFERENCE_ROOT
    if "model_mod" in _cached:
        return _cached["model_mod"]
    if not reference_available(root):
        raise FileNotFoundError(f"reference tree not found at {root}")

    install_stubs()
    if root not in sys.path:
        sys.path.insert(0, root)

    import model.model as ref_model  # noqa: import resolves inside `root`
    import model.vmamba as ref_vmamba

    # SS2D.__initv2__ captures these module-level names into partials at
    # construction time (vmamba.py:771-850) — patch before building models.
    ref_vmamba.CrossScanTriton = ref_vmamba.CrossScan
    ref_vmamba.CrossMergeTriton = ref_vmamba.CrossMerge
    ref_vmamba.SelectiveScanCore = TorchRefScan
    ref_vmamba.SelectiveScanOflex = TorchRefScan
    ref_vmamba.SelectiveScanMamba = TorchRefScan

    _cached["model_mod"] = ref_model
    return ref_model


def build_reference_model(name: str = "DualStreamInteractiveMambaUNet",
                          root: Optional[str] = None, **kwargs):
    """Construct a reference model class by name with reference-native
    kwargs (see reference model/__init__.py:8-67), in eval mode."""
    mod = load_reference_modules(root)
    model = getattr(mod, name)(**kwargs)
    model.eval()
    return model
