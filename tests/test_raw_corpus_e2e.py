"""Full raw-corpus readiness drill (VERDICT r03 item 6): miniature
VCTK-0.92-shaped flac tree → auto flac→wav conversion (decode → silence-trim
→ speaker split) → CLI train 1 epoch → CLI eval → results CSV.

This is the exact path a user with the real corpus exercises; the reference
does the conversion inside CustomVCTK_092.__init__ (data_loaders.py:95-103,
151-246). The flac encoder is the pure-Python golden implementation from
tests/flac_ref.py; decoding runs through the framework's own native C++
decoder.
"""

import csv
import os

import numpy as np
import pytest

from vm_asr_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (native/build.sh)"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 48000


def _build_corpus(tmp_path, rng):
    from tests.flac_ref import encode_flac

    data_path = tmp_path / "data"
    flac_root = data_path / "VCTK-Corpus-0.92" / "wav48_silence_trimmed"
    rows = []
    for spk in ("p225", "p226", "p227"):
        d = flac_root / spk
        d.mkdir(parents=True)
        for u in (1, 2):
            t = np.arange(int(SR * 0.7)) / SR
            f0 = 150.0 + 37.0 * (u + hash(spk) % 5)
            sig = np.zeros_like(t)
            for k in range(1, 60):
                if f0 * k >= SR / 2:
                    break
                sig += np.sin(2 * np.pi * f0 * k * t + k) / k
            sig += 0.05 * rng.standard_normal(t.shape)
            wav = (sig / np.abs(sig).max() * 12000).astype(np.int64)
            blob = encode_flac(wav[None, :], SR, mode="fixed1", blocksize=4096)
            (d / f"{spk}_{u:03d}_mic1.flac").write_bytes(blob)
            rows.append(f"{spk}_{u:03d} 0.05 0.65\n")
    labels = tmp_path / "vctk-silences.0.92.txt"
    labels.write_text("".join(rows))
    return str(data_path) + "/", str(labels)


def _common_opts(data_path, labels):
    return [
        "MODEL.VSSM.DIMS", "4",
        "MODEL.VSSM.DEPTHS", "[1,1,1,1]",
        "DATA.DATA_PATH", data_path,
        "DATA.FLAC2WAV.TIMESTAMPS", labels,
        "DATA.TRAIN_SPLIT", "[2,1]",
        "DATA.USE_QUANTITY", "1.0",
        "DATA.SEGMENT", "0.315",  # 15120 samples → 64 frames at hop 240
        "DATA.STFT.N_FFT", "128",
        "DATA.STFT.WIN_LENGTH", "128",
        "DATA.BATCH_SIZE", "2",
        "DATA.NUM_WORKERS", "1",
        "DATA.VALID_SPLIT", "0.5",
        "TENSORBOARD.ENABLE", "False",
        "AMP_ENABLE", "False",
    ]


def test_raw_corpus_train_then_eval(tmp_path, rng):
    from vm_asr_tpu.cli import main

    data_path, labels = _build_corpus(tmp_path, rng)
    out = str(tmp_path / "out")
    cfg = os.path.join(REPO, "configs/vm_asr_48k.yaml")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = main([
            "--cfg", cfg, "--tag", "rawsmoke", "--output", out,
            "--opts", "TRAIN.EPOCHS", "1",
            "TRAIN.ADVERSARIAL.ENABLE", "False",
            *_common_opts(data_path, labels),
        ])
        assert rc == 0
        # the auto-conversion materialised the trimmed wav tree
        wav_root = os.path.join(
            data_path, "VCTK-Corpus-0.92", "wav48_silence_trimmed_wav")
        assert os.path.isdir(os.path.join(wav_root, "p225"))
        w = os.listdir(os.path.join(wav_root, "p225"))
        assert sorted(w) == ["p225_001.wav", "p225_002.wav"]

        run_dir = os.path.join(out, "DualStreamInteractiveMambaUNet",
                               "rawsmoke")
        assert os.path.isdir(run_dir)

        rc = main([
            "--cfg", cfg, "--eval", "--tag", "8000_48000",
            "--output", out, "--resume", run_dir,
            "--opts",
            "TRAIN.ADVERSARIAL.ENABLE", "False",
            "TEST.RESULTS_DIR", str(tmp_path / "results"),
            *_common_opts(data_path, labels),
        ])
        assert rc == 0
    finally:
        os.chdir(cwd)

    with open(tmp_path / "results_48kHz.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    # eval ran on the held-out speaker's real (decoded+trimmed) audio
    assert float(rows[0]["LSD"]) > 0 and np.isfinite(float(rows[0]["LSD"]))
    assert int(float(rows[0]["SAMPLE_RATE"])) == 8000
