"""Native FLAC decoder (native/src/flac_decoder.cpp) vs the pure-Python
reference encoder (tests/flac_ref.py): losslessness over the subframe /
residual / channel-assignment matrix, plus the flac→wav corpus conversion
path (reference data_loaders.py:151-246)."""

import os

import numpy as np
import pytest

from vm_asr_tpu.data import native
from tests.flac_ref import encode_flac

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (native/build.sh)"
)


def _signal(n, channels=1, seed=0, amp=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    base = amp * np.sin(2 * np.pi * 220.0 * t)
    out = np.stack(
        [base + rng.normal(0, 500, n) * (c + 1) for c in range(channels)]
    )
    return np.round(out).astype(np.int64)


def _roundtrip(samples, sr=48000, bps=16, **kw):
    blob = encode_flac(samples, sr, bps=bps, **kw)
    audio, got_sr = native.decode_flac(blob)
    assert got_sr == sr
    scale = float(1 << (bps - 1))
    pcm = np.round(audio * scale).astype(np.int64)
    np.testing.assert_array_equal(pcm, np.atleast_2d(samples))


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4", "lpc2", "lpc8"])
def test_mono_subframe_modes(mode):
    _roundtrip(_signal(1000), mode=mode)


def test_constant_subframe():
    s = np.full((1, 512), -1234, np.int64)
    _roundtrip(s, mode="constant")


@pytest.mark.parametrize("channel_mode",
                         ["independent", "left_side", "mid_side"])
def test_stereo_channel_modes(channel_mode):
    _roundtrip(_signal(800, channels=2), mode="fixed2",
               channel_mode=channel_mode)


def test_rice_partitions_and_escape():
    s = _signal(1024)
    _roundtrip(s, mode="fixed1", partition_order=2, rice_param=6)
    _roundtrip(s, mode="fixed1", partition_order=1, escape=True)


def test_non_multiple_blocksize_tail():
    # 1000 samples at blocksize 256 → 4 blocks, last one padded; the
    # decoder must truncate to STREAMINFO's total_samples.
    _roundtrip(_signal(1000), mode="verbatim", blocksize=256)


def test_bps24():
    s = (_signal(600) * 64).astype(np.int64)
    _roundtrip(s, bps=24, mode="fixed2")


def test_corrupt_rejected():
    with pytest.raises(ValueError):
        native.decode_flac(b"not a flac stream at all")


def test_convert_flac_corpus(tmp_path):
    from vm_asr_tpu.data.vctk import convert_flac_corpus, load_wav

    sr = 48000
    flac_root = tmp_path / "flac"
    labels = tmp_path / "silences.txt"
    rows = []
    for speaker, utt in [("p225", "001"), ("p225", "002"), ("p280", "001")]:
        d = flac_root / speaker
        d.mkdir(parents=True, exist_ok=True)
        s = _signal(sr // 2, seed=hash((speaker, utt)) % 1000)
        blob = encode_flac(s, sr, mode="fixed2", blocksize=4096)
        (d / f"{speaker}_{utt}_mic1.flac").write_bytes(blob)
        rows.append(f"{speaker}_{utt} 0.1 0.3\n")
    labels.write_text("".join(rows))

    dst = tmp_path / "wav"
    n = convert_flac_corpus(str(flac_root), str(dst), str(labels))
    assert n == 2  # p280 excluded (reference data_loaders.py:193-195)
    wav, got_sr = load_wav(str(dst / "p225" / "p225_001.wav"))
    assert got_sr == sr
    # trimmed to the [0.1, 0.3] s window
    assert wav.shape[-1] == int(0.3 * sr) - int(0.1 * sr)
    # idempotent: second run writes nothing
    assert convert_flac_corpus(str(flac_root), str(dst), str(labels)) == 0


def test_fuzz_no_crash():
    # Malformed streams must fail with an error code, never crash the
    # process (the decoder is bounds-checked throughout).
    rng = np.random.default_rng(0)
    good = encode_flac(_signal(400), 48000, mode="fixed2")
    for i in range(200):
        blob = bytearray(good)
        n_flips = rng.integers(1, 20)
        for _ in range(n_flips):
            blob[rng.integers(4, len(blob))] ^= int(rng.integers(1, 256))
        try:
            native.decode_flac(bytes(blob))
        except ValueError:
            pass  # rejected — fine
    for i in range(50):
        junk = rng.integers(0, 256, size=rng.integers(1, 4000), dtype=np.uint8)
        try:
            native.decode_flac(junk.tobytes())
        except ValueError:
            pass
