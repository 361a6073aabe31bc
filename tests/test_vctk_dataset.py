"""VCTKDataset corpus discovery / caching / silence labels (no compiles)."""

import json
import os

import numpy as np
import pytest

from vm_asr_tpu.data import (
    VCTKDataset,
    load_wav,
    parse_silence_labels,
    save_wav,
    trim_silence,
)


@pytest.fixture
def corpus(tmp_path, rng):
    """Fake silence-trimmed corpus: 5 speakers × 3 utterances × 2 mics."""
    root = tmp_path / "wav48_silence_trimmed_wav"
    for s in range(5):
        spk = f"p{225 + s}"
        d = root / spk
        d.mkdir(parents=True)
        for u in range(3):
            for mic in ("mic1", "mic2"):
                wav = rng.standard_normal(1600).astype(np.float32) * 0.1
                save_wav(str(d / f"{spk}_{u:03d}_{mic}.wav"), wav, 16000)
    return str(root)


def test_speaker_split_and_mic_filter(corpus):
    train = VCTKDataset(corpus, training=True, mic_id="mic1",
                        train_split=(3, 2))
    test = VCTKDataset(corpus, training=False, mic_id="mic1",
                       train_split=(3, 2))
    assert len(train) == 3 * 3   # 3 speakers × 3 utterances, mic1 only
    assert len(test) == 2 * 3
    train_speakers = {s.speaker_id for s in train.samples}
    test_speakers = {s.speaker_id for s in test.samples}
    assert train_speakers.isdisjoint(test_speakers)

    audio, sr, name = train.load(0)
    assert sr == 16000 and audio.ndim == 1 and name.endswith(".wav")


def test_use_quantity_subsampling(corpus):
    full = VCTKDataset(corpus, training=True, train_split=(5, 0))
    half = VCTKDataset(corpus, training=True, train_split=(5, 0),
                       use_quantity=0.5)
    assert len(half) == len(full) // 2
    # deterministic for a fixed seed
    half2 = VCTKDataset(corpus, training=True, train_split=(5, 0),
                        use_quantity=0.5)
    assert [s.path for s in half.samples] == [s.path for s in half2.samples]


def test_sample_id_cache(corpus, tmp_path):
    cache = str(tmp_path / "ids.json")
    d1 = VCTKDataset(corpus, training=True, train_split=(3, 2),
                     cache_path=cache)
    assert os.path.exists(cache)
    with open(cache) as f:
        payload = json.load(f)
    assert "train_mic1" in payload
    d2 = VCTKDataset(corpus, training=True, train_split=(3, 2),
                     cache_path=cache)
    assert [s.path for s in d1.samples] == [s.path for s in d2.samples]


def test_missing_corpus_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="zero-egress"):
        VCTKDataset(str(tmp_path / "nope"))


def test_silence_labels_and_trim(tmp_path, rng):
    labels = tmp_path / "silences.txt"
    labels.write_text("p225_001 0.125 0.5\np226_002 0.0 0.25\n")
    table = parse_silence_labels(str(labels))
    assert table["p225_001"] == (0.125, 0.5)

    audio = rng.standard_normal(16000).astype(np.float32)
    trimmed = trim_silence(audio, 16000, table["p225_001"])
    assert trimmed.shape[-1] == int(0.5 * 16000) - int(0.125 * 16000)
    np.testing.assert_array_equal(trimmed, audio[2000:8000])
    # no bounds → passthrough
    np.testing.assert_array_equal(trim_silence(audio, 16000, None), audio)


def test_wav_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 4000).astype(np.float32)
    p = str(tmp_path / "x.wav")
    save_wav(p, x, 48000)
    y, sr = load_wav(p)
    assert sr == 48000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_cli_parse_option():
    from vm_asr_tpu.cli import parse_option

    args = parse_option([
        "--cfg", "configs/vm_asr_48k_MPD.yaml", "--tag", "16000_48000",
        "--eval", "--resume", "/tmp/run", "--batch_size", "4",
        "--opts", "TRAIN.EPOCHS", "2",
    ])
    assert args.cfg.endswith("vm_asr_48k_MPD.yaml")
    assert args.eval and not args.inference
    assert args.batch_size == 4
    assert args.opts == ["TRAIN.EPOCHS", "2"]
