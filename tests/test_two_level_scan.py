"""Two-level (work-reduced) in-chunk scan vs the single-level Hillis–Steele
(VERDICT r04 item 5a). Pure-jnp equivalence plus an end-to-end fused-kernel
run (interpret mode) with VM_ASR_SCAN_SUBCHUNK set in a subprocess — the
knob is read once at import, like VM_ASR_SCAN_BWD.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from vm_asr_tpu.ops.linear_recurrence import (
    _chunk_scan_flat,
    _chunk_scan_two_level,
)
from vm_asr_tpu.ops.selective_scan_fused import (
    _chunk_scan_rev_flat,
    _chunk_scan_rev_two_level,
)


@pytest.mark.parametrize("sub", [8, 32, 128])
def test_two_level_forward_matches(sub, rng):
    a = jnp.asarray(rng.uniform(0.1, 1.0, (512, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((512, 8)).astype(np.float32))
    p0, s0 = _chunk_scan_flat(a, b)
    p1, s1 = _chunk_scan_two_level(a, b, sub)
    np.testing.assert_allclose(p0, p1, rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(s0, s1, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("sub", [8, 32, 128])
def test_two_level_reverse_matches(sub, rng):
    a = jnp.asarray(rng.uniform(0.1, 1.0, (512, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((512, 8)).astype(np.float32))
    p0, s0 = _chunk_scan_rev_flat(a, b)
    p1, s1 = _chunk_scan_rev_two_level(a, b, sub)
    np.testing.assert_allclose(p0, p1, rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(s0, s1, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("knobs,expect", [
    # legacy shared knob sets both
    ({"VM_ASR_SCAN_SUBCHUNK": "32"}, (32, 32)),
    # the production split: two-level fwd, two-level bwd at different sizes
    ({"VM_ASR_SCAN_SUBCHUNK_FWD": "16", "VM_ASR_SCAN_SUBCHUNK_BWD": "32"},
     (16, 32)),
    # two-level fwd only, flat bwd
    ({"VM_ASR_SCAN_SUBCHUNK_FWD": "16"}, (16, 0)),
    # the production default (no env): fwd 16 / bwd flat, per the r5 sweep
    ({}, (16, 0)),
])
def test_fused_kernel_with_subchunk_env(knobs, expect):
    """Fused fwd+bwd (interpret) under the two-level scan env knobs matches
    the XLA-replay reference — run in a subprocess so the import-time knobs
    and jit caches are isolated."""
    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from vm_asr_tpu.ops.linear_recurrence import _SUBCHUNK_FWD, _SUBCHUNK_BWD
assert (_SUBCHUNK_FWD, _SUBCHUNK_BWD) == EXPECT, (_SUBCHUNK_FWD, _SUBCHUNK_BWD)
from vm_asr_tpu.ops.selective_scan_fused import selective_scan_fused, _fused_bwd_xla, _fused_fwd

r = np.random.default_rng(0)
B, L, K, D = 1, 1024, 2, 64
KD = K * D
u = jnp.asarray(r.standard_normal((B, L, KD)).astype(np.float32))
dts = jnp.asarray(r.standard_normal((B, L, KD)).astype(np.float32) * 0.1)
bs = jnp.asarray(r.standard_normal((B, L, K)).astype(np.float32))
cs = jnp.asarray(r.standard_normal((B, L, K)).astype(np.float32))
a_neg = -jnp.exp(jnp.asarray(r.standard_normal(KD).astype(np.float32) * 0.2))
bias = jnp.asarray(r.standard_normal(KD).astype(np.float32) * 0.1)
dsk = jnp.asarray(r.standard_normal(KD).astype(np.float32))

f = lambda *xs: jnp.sum(selective_scan_fused(*xs, K, True) ** 2)
val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4, 5, 6))(
    u, dts, bs, cs, a_neg, bias, dsk)

# reference grads through the XLA-replay backward
y, res = _fused_fwd(u, dts, bs, cs, a_neg, bias, dsk, K, True)
dy = 2.0 * y
ref = _fused_bwd_xla(K, True, res, dy)
for g, rg in zip(grads, ref):
    np.testing.assert_allclose(np.asarray(g), np.asarray(rg),
                               rtol=5e-4, atol=5e-4)
print("OK")
"""
    code = code.replace("EXPECT", repr(expect))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for k in ("VM_ASR_SCAN_SUBCHUNK", "VM_ASR_SCAN_SUBCHUNK_FWD",
              "VM_ASR_SCAN_SUBCHUNK_BWD"):
        env.pop(k, None)
    env.update(knobs)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK" in out.stdout
