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


def test_real_corpus_layout_end_to_end(tmp_path, rng):
    """Real-corpus dry-run hardening: reconstruct the EXACT VCTK 0.92 layout
    the reference's own code produces and parses — raw flac tree
    `wav48_silence_trimmed/{spk}/{spk}_{utt}_mic{N}.flac` (incl. the odd
    's5' speaker and the excluded p280/p315), the vctk-silences.0.92.txt
    timestamp format, utterances missing from the labels file (saved
    untrimmed, data_loaders.py:211-213), and mic2-only files — then drive
    convert_flac_corpus → VCTKDataset → get_loaders end-to-end. The
    converted tree has NO mic suffix in filenames (data_loaders.py:197,499:
    `{speaker}_{utterance_id}.wav`), which the dataset must accept."""
    from tests.flac_ref import encode_flac
    from vm_asr_tpu.core import default_config
    from vm_asr_tpu.data import get_loaders, native
    from vm_asr_tpu.data.vctk import convert_flac_corpus

    if not native.available():
        pytest.skip("native lib not built (native/build.sh)")

    sr = 48000
    data_path = tmp_path / "data"
    flac_root = data_path / "VCTK-Corpus-0.92" / "wav48_silence_trimmed"
    # 3 kept speakers (incl. the non-'pNNN' s5) + both excluded ones
    speakers = ["p225", "p226", "s5", "p280", "p315"]
    rows = []
    for spk in speakers:
        d = flac_root / spk
        d.mkdir(parents=True)
        for u in (1, 2):
            wav = (rng.standard_normal(sr // 2) * 3000).astype(np.int64)
            blob = encode_flac(wav[None, :], sr, mode="fixed1",
                               blocksize=4096)
            (d / f"{spk}_{u:03d}_mic1.flac").write_bytes(blob)
            if u == 1:  # mic2 exists only sometimes, like the real corpus
                (d / f"{spk}_{u:03d}_mic2.flac").write_bytes(blob)
        # utterance 002 deliberately missing from the labels file
        rows.append(f"{spk}_001 0.1 0.4\n")
    labels = tmp_path / "vctk-silences.0.92.txt"
    labels.write_text("".join(rows))

    dst = data_path / "VCTK-Corpus-0.92" / "wav48_silence_trimmed_wav"
    n = convert_flac_corpus(str(flac_root), str(dst), str(labels))
    assert n == 3 * 2  # p280/p315 skipped, mic1 only
    # converted names carry NO mic tag
    assert sorted(os.listdir(dst / "p225")) == ["p225_001.wav",
                                                "p225_002.wav"]
    # labelled utterance trimmed to its window; unlabelled kept whole
    w1, _ = load_wav(str(dst / "p225" / "p225_001.wav"))
    w2, _ = load_wav(str(dst / "p225" / "p225_002.wav"))
    assert w1.shape[-1] == int(0.4 * sr) - int(0.1 * sr)
    assert w2.shape[-1] == sr // 2

    # dataset discovery over the converted tree (the production path)
    train = VCTKDataset(str(dst), training=True, mic_id="mic1",
                        train_split=(2, 1))
    test = VCTKDataset(str(dst), training=False, mic_id="mic1",
                       train_split=(2, 1))
    assert len(train) == 2 * 2 and len(test) == 1 * 2
    assert {s.speaker_id for s in train.samples} == {"p225", "p226"}
    assert {s.speaker_id for s in test.samples} == {"s5"}
    audio, got_sr, name = train.load(0)
    assert got_sr == sr and name == "p225_001.wav"

    # full loader-factory drive: degradation pipeline over the real layout
    c = default_config()
    c.DATA.DATA_PATH = str(data_path) + "/"
    c.DATA.FLAC2WAV.DST_PATH = "VCTK-Corpus-0.92/wav48_silence_trimmed_wav"
    c.DATA.TARGET_SR = 48000
    c.DATA.SEGMENT = 0.126
    c.DATA.STFT.N_FFT = 128
    c.DATA.RANDOM_RESAMPLE = [8000, 48000]
    c.DATA.TRAIN_SPLIT = [2, 1]
    c.DATA.USE_QUANTITY = 1.0  # default 0.1 would floor 4 samples to 0
    c.DATA.BATCH_SIZE = 2
    c.DATA.NUM_WORKERS = 0
    c.DATA.VALID_SPLIT = 0.5
    c.EVAL_MODE = False
    tr, va = get_loaders(c)
    b = next(iter(tr))
    assert b.wave_input.shape == b.wave_target.shape
    assert np.isfinite(b.wave_input).all()
    assert not np.allclose(b.wave_input, b.wave_target)
