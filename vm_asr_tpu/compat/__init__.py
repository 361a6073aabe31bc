"""Interoperability with the reference PyTorch VM-ASR implementation.

Two user-facing capabilities:

- ``torch_port.state_dict_to_flax`` converts a reference checkpoint's
  ``state_dict`` (torch ``.pth``, reference base/base_trainer.py:130-179
  layout) into this framework's flax parameter tree, so published
  reference checkpoints can be evaluated/fine-tuned on TPU.
- ``ref_loader.build_reference_model`` instantiates the *reference*
  PyTorch model on CPU (its CUDA/Triton kernels substituted with pure
  torch equivalents) for forward-equivalence parity testing.

Everything here is CPU/torch-only tooling; nothing imports into the TPU
compute path.
"""

from .torch_port import state_dict_to_flax  # noqa: F401
