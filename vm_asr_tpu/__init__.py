"""VM-ASR/TPU — a TPU-native audio super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of VM-ASR
(Dual-Stream Interactive Mamba U-Net for speech bandwidth extension):

- ``vm_asr_tpu.core``     config / logging / checkpointing / metric tracking
- ``vm_asr_tpu.dsp``      STFT/iSTFT, resampling, low-pass filters, overlap-add
- ``vm_asr_tpu.ops``      selective-scan (jnp reference + Pallas TPU kernels),
                          cross-scan/merge layout ops
- ``vm_asr_tpu.models``   flax model zoo: SS2D, VSSBlock, MambaUNet,
                          DualStreamInteractiveMambaUNet, MPD/MSD discriminators
- ``vm_asr_tpu.losses``   waveform / multi-resolution-STFT / HiFi-GAN losses
- ``vm_asr_tpu.metrics``  SNR / LSD / LSD-HF / LSD-LF
- ``vm_asr_tpu.data``     VCTK host data pipeline with on-the-fly degradation
- ``vm_asr_tpu.parallel`` device mesh + sharding helpers (DP over ICI)
- ``vm_asr_tpu.train``    jitted train/eval/infer engines

The reference implementation (PyTorch/CUDA/Triton) is ghnmqdtg/VM-ASR; file:line
citations in docstrings point into that tree for behavioural parity checks.
"""

__version__ = "0.1.0"
