"""Tester / Inferencer end-to-end on the synthetic corpus (tiny model)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.core import default_config
from vm_asr_tpu.data import DataPipeline, DegradingSampler, SyntheticVCTK, save_wav
from vm_asr_tpu.models import get_model
from vm_asr_tpu.train.inferencer import Inferencer
from vm_asr_tpu.train.tester import Tester


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval")
    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = 0.126  # 2016 samples/segment
    c.DATA.STFT.N_FFT = 128
    c.DATA.STFT.HOP_LENGTH = 32
    c.DATA.STFT.WIN_LENGTH = 128
    c.MODEL.NAME = "DualStreamInteractiveMambaUNet"
    c.MODEL.VSSM.DIMS = 4
    c.MODEL.VSSM.DEPTHS = [1, 1, 1, 1]
    c.TAG = "8000_16000"
    c.EVAL_MODE = True
    c.TENSORBOARD.ENABLE = False
    c.OUTPUT = str(tmp / "run")
    c.DTYPE.COMPUTE = "float32"
    c.AMP_ENABLE = False
    gen = get_model(c)["generator"]
    seg = int(c.DATA.SEGMENT * c.DATA.TARGET_SR)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, seg), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    return c, gen, params, tmp


def test_tester_csv_and_wavs(setup):
    c, gen, params, tmp = setup
    # long clips (2.5 segments) exercise the unfold/fold path
    ds = SyntheticVCTK(n_items=2, sr=16000, duration=0.3, training=False)
    # training=False → full-length clips padded to a segment multiple, so the
    # Tester's unfold/fold path is the one the product actually takes.
    sampler = DegradingSampler(ds, c, training=False, input_sr=8000)
    loader = DataPipeline(sampler, batch_size=1, shuffle=False, drop_last=False,
                          num_workers=1)
    out_dir = str(tmp / "results")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        tester = Tester(c, gen, params, loader, output_dir=out_dir)
        log = tester.evaluate()
    finally:
        os.chdir(cwd)
    for k in ("snr", "lsd", "lsd_hf", "lsd_lf", "rtf", "rtf_reciprocal",
              "rtf_compute", "rtf_compute_reciprocal"):
        assert k in log and np.isfinite(log[k])
    csv_path = tmp / "results_16kHz.csv"
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    # reference column prefix is byte-compatible; the compute-RTF
    # decomposition (TEST.COMPUTE_RTF, VERDICT r04 item 8) appends after
    assert lines[0] == (
        "SAMPLE_RATE,SNR,LSD,LSD_HF,LSD_LF,RTF,RTF_RECIPROCAL"
        ",RTF_COMPUTE,RTF_COMPUTE_RECIPROCAL"
    )
    assert len(lines) == 2
    wavs = os.listdir(out_dir)
    assert any(w.endswith("_up.wav") for w in wavs)
    assert any(w.endswith("_orig.wav") for w in wavs)
    assert any(w.endswith("_down.wav") for w in wavs)


def test_tester_bounded_compiles_across_lengths(setup, tmp_path):
    """Evaluating ≥20 distinct clip lengths must reuse a bounded program
    set (≤5 XLA compiles) — the reference evaluates arbitrary lengths with
    no recompilation (reference tester.py:106-140); per-segment-count
    compiles would make a real 824-file VCTK eval compile-bound."""
    from vm_asr_tpu.data.pipeline import Batch

    c, gen, params, tmp = setup
    seg = int(c.DATA.SEGMENT * c.DATA.TARGET_SR)
    rng = np.random.default_rng(0)

    batches = []
    for m in range(1, 22):  # 21 distinct lengths: 1..21 segments
        t = m * seg
        x = rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1
        batches.append(Batch(
            wave_input=x,
            wave_target=x.copy(),
            highcut=np.asarray([33], np.int32),
            names=[f"len{m}.wav"],
            pad_lengths=np.asarray([0], np.int32),
        ))

    class FakeLoader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    c2 = c.clone()
    c2.defrost()
    c2.TEST.SAVE_RESULT = False
    c2.freeze()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        tester = Tester(c2, gen, params, FakeLoader(),
                        output_dir=str(tmp_path / "res"))
        log = tester.evaluate()
    finally:
        os.chdir(cwd)
    assert np.isfinite(log["lsd"])
    assert tester.forward._cache_size() <= 5, tester.forward._cache_size()


def test_bucketed_forward_matches_direct():
    """bucketed_forward must return exactly what one big forward would."""
    from vm_asr_tpu.train.steps import bucketed_forward, segment_buckets

    def raw(params, x, hf):
        return x * params + hf[:, None, None].astype(x.dtype)

    def raw_oracle(params, x, hf):
        return x * params + hf[:, None, None].astype(x.dtype)

    # NOTE: two distinct function objects — jax.jit of the same function
    # shares one lowering cache, which would mix the oracle's raw-S shapes
    # into fwd's count.
    fwd = jax.jit(raw)            # fed only bucket-shaped chunks
    direct = jax.jit(raw_oracle)  # oracle, sees the raw S shapes

    rng = np.random.default_rng(1)
    for s in (1, 2, 3, 5, 8, 11, 16, 23):
        x = jnp.asarray(rng.standard_normal((s, 1, 32)).astype(np.float32))
        hf = jnp.asarray(rng.integers(1, 60, (s,)).astype(np.int32))
        got = bucketed_forward(fwd, 2.0, x, hf)
        want = direct(2.0, x, hf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        assert all(b in (1, 2, 4, 8) for b in segment_buckets(s))
    # every length reuses the same ≤4 bucket programs
    assert fwd._cache_size() <= 4, fwd._cache_size()


def test_get_loaders_eval_full_length(setup):
    """`--eval` must see un-truncated clips padded to a segment *multiple*
    (reference data_loaders.py:371-389) so the Tester's unfold/fold runs."""
    from vm_asr_tpu.data.pipeline import get_loaders

    c, gen, params, tmp = setup
    ds = SyntheticVCTK(n_items=2, sr=16000, duration=0.3, training=False)
    loader = get_loaders(c, dataset=ds)
    seg = int(c.DATA.SEGMENT * c.DATA.TARGET_SR)
    batch = next(iter(loader))
    t = batch.wave_input.shape[-1]
    # 0.3 s @ 16 kHz = 4800 samples → padded to 3 × 2016-sample segments
    assert t > seg and t % seg == 0
    assert batch.wave_target.shape[-1] == t


def test_inferencer_file_and_dir(setup, rng):
    c, gen, params, tmp = setup
    in_dir = tmp / "wavs"
    in_dir.mkdir(exist_ok=True)
    # one short (→ single forward) and one long (→ chunked) file
    save_wav(str(in_dir / "short.wav"),
             rng.standard_normal(1500).astype(np.float32) * 0.1, 16000)
    save_wav(str(in_dir / "long.wav"),
             rng.standard_normal(5000).astype(np.float32) * 0.1, 16000)
    inf = Inferencer(c, gen, params, output_dir=str(tmp / "inf"))
    out = inf.infer_file(str(in_dir / "short.wav"))
    assert out is not None and np.isfinite(np.asarray(out)).all()
    processed = inf.infer_directory(str(in_dir))
    assert len(processed) == 2
    for p in processed:
        assert os.path.exists(p)
