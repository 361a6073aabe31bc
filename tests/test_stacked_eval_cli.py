"""End-to-end --eval through the CLI with MODEL.VSSM.STACKED_EXECUTION:
checkpoint load (random init fallback) → to_stacked conversion → Tester's
bucketed chunked forward → results CSV."""

import os


def test_cli_eval_stacked(tmp_path):
    from vm_asr_tpu.cli import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = main([
            "--cfg", os.path.join(repo, "configs/vm_asr_16k_woGAN.yaml"),
            "--eval", "--tag", "8000_16000", "--synthetic_data",
            "--synthetic_n", "2",
            "--output", str(tmp_path / "run"),
            "--opts",
            "MODEL.VSSM.DIMS", "4",
            "MODEL.VSSM.DEPTHS", "[1,1,1,1]",
            "MODEL.VSSM.STACKED_EXECUTION", "True",
            # HOP is derived (80 at 16 kHz): 5040/80+1 = 64 frames
            "DATA.SEGMENT", "0.315",
            "DATA.STFT.N_FFT", "128",
            "DATA.STFT.WIN_LENGTH", "128",
            "TEST.RESULTS_DIR", str(tmp_path / "results"),
            "TENSORBOARD.ENABLE", "False",
            "AMP_ENABLE", "False",
        ])
    finally:
        os.chdir(cwd)
    assert rc == 0
    csvs = []
    for root, _, files in os.walk(tmp_path):
        csvs += [f for f in files if f.endswith(".csv")]
    assert csvs, "eval should write a results CSV"
