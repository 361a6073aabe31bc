"""CLI --throughput mode (reference main.py:83 left it a TODO; here it is
a real measurement path and must keep working on any backend)."""

import os


def test_cli_throughput_mode(tmp_path):
    from vm_asr_tpu.cli import main

    cwd = os.getcwd()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    try:
        rc = main([
            "--cfg", "configs/vm_asr_16k_woGAN.yaml",
            "--throughput", "--tag", "8000_16000", "--synthetic_data",
            "--batch_size", "2",
            "--output", str(tmp_path),
            "--opts",
            "MODEL.VSSM.DIMS", "4",
            "MODEL.VSSM.DEPTHS", "[1,1,1,1]",
            # HOP_LENGTH is derived (forced to 80 at 16 kHz, reference
            # config.py:313-320) — pick SEGMENT so 5040/80+1 = 64 frames:
            # a 64x64 spectral image after the DC-bin drop.
            "DATA.SEGMENT", "0.315",
            "DATA.STFT.N_FFT", "128",
            "DATA.STFT.WIN_LENGTH", "128",
            "TENSORBOARD.ENABLE", "False",
            "AMP_ENABLE", "False",
        ])
    finally:
        os.chdir(cwd)
    assert rc == 0
