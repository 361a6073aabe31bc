"""MambaUNet and DualStreamInteractiveMambaUNet (flax, NHWC, TPU-native).

Reference: model/model.py:119-1552. The U-Net operates on the STFT
log2-magnitude / phase "images": waveform → STFT (513×F) → drop the DC bin
(512×F) → patch embed (4× down) → 4 encoder stages with PatchMerging → 4
decoder stages with PatchExpanding + skips → output head (v1/v2/v3) →
+ residual magnitude → re-attach DC → iSTFT.

The dual-stream variant runs separate magnitude and phase streams whose
features interact additively after every stage (modes: dual / p2m / m2p /
single — reference model.py:1103-1552).

Shape walk for the 48 kHz production config (SURVEY.md §3.4): 122640 samples →
mag 513×512 → 512×512×1 → embed 128×128×16 → 64×64×32 → 32×32×64 → 16×16×128
→ (mirror) → 512×512×1.

Architectural notes (deliberate parity decisions):
- The first decoder stage (reference i_layer=4) receives an *empty*
  drop-path slice (model.py:367-369 with sum(depths)==len(dpr)), i.e. zero
  blocks + identity sampler: a pass-through. Preserved.
- In the concat-skip branch of the dual/p2m/m2p forwards, the reference routes
  the phase stream through the *magnitude* decoder (model.py:1148, 1270,
  1386). The shipped configs set CONCAT_SKIP=True, so published checkpoints
  have this behaviour. It is preserved by default; set
  ``phase_decoder_fix=True`` (MODEL.VSSM.PHASE_DECODER_FIX) for the corrected
  routing.
- Low-frequency replacement copies input bins [0, hf) into the output
  (model.py:447-451) — implemented as a vectorised mask instead of a Python
  loop over the batch.
- Width caveat (inherent to the architecture, identical in the reference):
  the v3 output head's PatchExpanding LayerNorms act over dims[0]/2 and
  dims[0]/4 channels; at dims[0] < 16 those collapse toward sign()/constant
  behaviour (LayerNorm over 1 channel emits exactly its bias), severing the
  trunk's influence on the output. Production width (16) is healthy — every
  parameter group verified live by perturbation probing.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..dsp import spectro2wav, wav2spectro
from .layers import PatchEmbed, _gelu_exact as gelu_exact, torch_bias_init, torch_linear_init
from .vss import VSSLayer


def resolve_dims(dims, num_layers: int) -> List[int]:
    if isinstance(dims, int):
        return [dims * 2**i for i in range(num_layers)]
    return list(dims)


class UNetCore(nn.Module):
    """One U-Net stream: patch embed + encoders + decoders + output head.

    Exposes per-stage methods so the dual-stream model can interleave two
    streams with interactions; ``__call__`` runs the whole single stream.
    """

    in_chans: int = 1
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Any = 16
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    patchembed_version: str = "v2"
    output_version: str = "v3"
    concat_skip: bool = True
    use_checkpoint: bool = False
    scan_impl: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        num_layers = len(self.depths)
        dims = resolve_dims(self.dims, num_layers)
        if len(dims) not in (num_layers, num_layers + 1):
            raise ValueError(
                f"dims must have {num_layers} entries (standard U-Net) or "
                f"{num_layers + 1} (latent variant, reference "
                f"model.py:299-332); got {len(dims)}"
            )
        # len(dims) == num_layers + 1: the reference's "5-dim" layout — every
        # encoder stage downsamples (into dims[n]), a latent VSSLayer sits at
        # the bottleneck, and every decoder stage (and the output head)
        # consumes a skip connection.
        self._has_latent = len(dims) == num_layers + 1
        self._dims = dims
        dpr = list(np.linspace(0.0, self.drop_path_rate, sum(self.depths)))

        self.patch_embed = PatchEmbed(
            embed_dim=dims[0],
            patch_size=self.patch_size,
            version=self.patchembed_version,
            patch_norm=self.patch_norm,
            dtype=self.dtype,
        )

        common = dict(
            ssm_d_state=self.ssm_d_state,
            ssm_ratio=self.ssm_ratio,
            ssm_dt_rank=self.ssm_dt_rank,
            ssm_act=self.ssm_act,
            ssm_conv=self.ssm_conv,
            ssm_conv_bias=self.ssm_conv_bias,
            ssm_drop_rate=self.ssm_drop_rate,
            mlp_ratio=self.mlp_ratio,
            mlp_act=self.mlp_act,
            mlp_drop_rate=self.mlp_drop_rate,
            gmlp=self.gmlp,
            use_checkpoint=self.use_checkpoint,
            scan_impl=self.scan_impl,
            dtype=self.dtype,
        )

        # Encoders: blocks at dims[i]; downsample at stage end except the
        # last stage of the standard layout (reference model.py:247-297).
        encoders = []
        for i in range(num_layers):
            down = self._has_latent or i < num_layers - 1
            encoders.append(
                VSSLayer(
                    dim=dims[i],
                    drop_path=dpr[
                        sum(self.depths[:i]) : sum(self.depths[: i + 1])
                    ],
                    sampler=("merge", dims[i + 1]) if down else None,
                    concat_skip=False,
                    **common,
                )
            )
        self.encoders = encoders

        # Bottleneck layer of the latent variant (reference model.py:299-332).
        if self._has_latent:
            self.latent = VSSLayer(
                dim=dims[num_layers],
                drop_path=dpr[
                    sum(self.depths[: num_layers - 1]) : sum(
                        self.depths[:num_layers]
                    )
                ],
                sampler=None,
                concat_skip=False,
                **common,
            )

        # Decoders for i_layer = num_layers .. 1 (reference model.py:338-394).
        decoders = []
        for i_layer in range(num_layers, 0, -1):
            if self._has_latent:
                dim = dims[i_layer]
                sampler = ("expand", True)
                cskip = self.concat_skip
            else:
                dim = (
                    dims[i_layer]
                    if i_layer < num_layers - 1
                    else dims[num_layers - 1]
                )
                sampler = ("expand", True) if i_layer < num_layers else None
                cskip = self.concat_skip if i_layer < num_layers else False
            decoders.append(
                VSSLayer(
                    dim=dim,
                    drop_path=dpr[
                        sum(self.depths[:i_layer]) : sum(self.depths[: i_layer + 1])
                    ],
                    sampler=sampler,
                    concat_skip=cskip,
                    **common,
                )
            )
        self.decoders = decoders

        # Output head.
        dim0 = dims[0]
        if self.output_version == "v3":
            # VSS(dim0, identity norm, concat skip, expand+LN) → VSS(dim0/2,
            # LN, expand+LN) → 1×1 conv → VSS(in_chans, identity norm)
            # (reference model.py:773-887).
            self.out_vss1 = VSSLayer(
                dim=dim0, drop_path=dpr[-1:], use_norm=False,
                sampler=("expand", True), concat_skip=self.concat_skip, **common,
            )
            self.out_vss2 = VSSLayer(
                dim=dim0 // 2, drop_path=dpr[-1:], use_norm=True,
                sampler=("expand", True), concat_skip=False, **common,
            )
            self.out_conv = nn.Dense(
                self.in_chans,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(dim0 // 4),
                dtype=self.dtype,
            )
            self.out_vss3 = VSSLayer(
                dim=self.in_chans, drop_path=dpr[-1:], use_norm=False,
                sampler=None, concat_skip=False, **common,
            )
        elif self.output_version == "v2":
            head_dpr = dpr[sum(self.depths[:-1]) : sum(self.depths)]
            self.out_vss1 = VSSLayer(
                dim=dim0, drop_path=head_dpr, use_norm=True,
                sampler=("expand", False), concat_skip=self.concat_skip, **common,
            )
            self.out_vss2 = VSSLayer(
                dim=dim0 // 2, drop_path=head_dpr, use_norm=True,
                sampler=("expand", False), concat_skip=False, **common,
            )
            if dim0 // 4 != self.in_chans:
                self.out_conv = nn.Dense(
                    self.in_chans,
                    kernel_init=torch_linear_init,
                    bias_init=torch_bias_init(dim0 // 4),
                    dtype=self.dtype,
                )
            else:
                self.out_conv = None
        elif self.output_version == "v1":
            if self.concat_skip:
                self.out_skip_conv = nn.Dense(
                    dim0,
                    kernel_init=torch_linear_init,
                    bias_init=torch_bias_init(2 * dim0),
                    dtype=self.dtype,
                )
            self.out_convt1 = nn.ConvTranspose(
                dim0 // 2, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                kernel_init=torch_linear_init, dtype=self.dtype,
            )
            self.out_convt2 = nn.ConvTranspose(
                self.in_chans, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                kernel_init=torch_linear_init, dtype=self.dtype,
            )
        else:
            raise ValueError(f"Unknown output version {self.output_version}")

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    # -- stage methods (used directly by the dual-stream orchestration) ------
    def embed(self, x, deterministic: bool = True):
        return self.patch_embed(x)

    def encode(self, i: int, x, deterministic: bool = True):
        return self.encoders[i](x, deterministic)

    def run_latent(self, x, deterministic: bool = True):
        return self.latent(x, deterministic)

    def decode(self, i: int, x, deterministic: bool = True):
        return self.decoders[i](x, deterministic)

    def output(self, x, deterministic: bool = True):
        if self.output_version in ("v2", "v3"):
            x = self.out_vss1(x, deterministic)
            x = self.out_vss2(x, deterministic)
            if getattr(self, "out_conv", None) is not None:
                x = self.out_conv(x)
            if self.output_version == "v3":
                x = self.out_vss3(x, deterministic)
            return x
        # v1
        if self.concat_skip:
            x = self.out_skip_conv(x)
        x = gelu_exact(x)
        x = self.out_convt1(x)
        x = gelu_exact(x)
        x = self.out_convt2(x)
        return x

    def __call__(self, x, deterministic: bool = True):
        """Single-stream forward over an NHWC image, including skips
        (reference model.py:459-565: 4-dim and latent branches)."""
        n = self.num_layers

        def fuse(x, s):
            return jnp.concatenate([x, s], axis=-1) if self.concat_skip else x + s

        x = self.embed(x, deterministic)
        skips = [x]
        if self._has_latent:
            for i in range(n):
                x = self.encode(i, x, deterministic)
                skips.append(x)
            x = self.run_latent(x, deterministic)
            for i in range(n):
                x = self.decode(i, fuse(x, skips.pop()), deterministic)
            return self.output(fuse(x, skips.pop()), deterministic)
        for i in range(n):
            x = self.encode(i, x, deterministic)
            if i < n - 1:
                skips.append(x)
        for i in range(n):
            if i != 0:
                x = fuse(x, skips.pop())
            x = self.decode(i, x, deterministic)
        return self.output(fuse(x, skips.pop()), deterministic)


def _low_band_mask(out, hf):
    freqs = out.shape[-2]
    return jnp.arange(freqs)[None, :, None] < hf[:, None, None]


def _low_freq_replacement(out, orig, hf):
    """Copy input bins [0, hf_b) into the output, vectorised over the batch.
    This is the *intended* reading of reference model.py:441-451 ("Replace
    the output low frequency band with the input's") — see ``lfr_mode``."""
    return jnp.where(_low_band_mask(out, hf), orig, out)


def _low_freq_replacement_torch_2d(out, orig, hf):
    """What reference `_low_freq_replacement(x=out, y=orig)` *actually does*
    on channel-less (B, F, T) tensors: mutates the **input** spectrogram's
    low band with the model's and returns it — model low band + input high
    band (model.py:441-446: ``y[i, :hf[i]] = x[i, :hf[i]]; return y``)."""
    return jnp.where(_low_band_mask(out, hf), out, orig)


class MambaUNet(nn.Module):
    """Single-stream magnitude U-Net (reference model.py:119-577): predicts a
    magnitude correction; phase passes through."""

    in_chans: int = 1
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Any = 16
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    patchembed_version: str = "v2"
    output_version: str = "v3"
    concat_skip: bool = True
    n_fft: int = 1024
    hop_length: int = 240
    win_length: int = 1024
    spectro_scale: str = "log2"
    low_freq_replacement: bool = False
    # How LOW_FREQ_REPLACEMENT behaves when enabled:
    #   "torch": byte-faithful to the reference, whose per-sample loop
    #     (model.py:441-451) indexes dim 1 — the CHANNEL axis for the
    #     (B, 1, T) inputs every reference trainer/tester path feeds, making
    #     the feature an exact NO-OP in production (verified empirically:
    #     on/off outputs are bit-identical for 3-dim inputs). For 2-dim
    #     (B, T) inputs it keeps the *input's* high band and the model's low
    #     band. Published checkpoints/LSD numbers were produced under the
    #     no-op, so this is the default.
    #   "fixed": the intended semantics — input low band copied into the
    #     model output (opt-in, TRAIN.LFR_MODE).
    lfr_mode: str = "torch"
    use_checkpoint: bool = False
    scan_impl: Optional[str] = None
    dtype: Any = jnp.float32

    def _core_kwargs(self):
        return dict(
            in_chans=self.in_chans,
            patch_size=self.patch_size,
            depths=self.depths,
            dims=self.dims,
            ssm_d_state=self.ssm_d_state,
            ssm_ratio=self.ssm_ratio,
            ssm_dt_rank=self.ssm_dt_rank,
            ssm_act=self.ssm_act,
            ssm_conv=self.ssm_conv,
            ssm_conv_bias=self.ssm_conv_bias,
            ssm_drop_rate=self.ssm_drop_rate,
            mlp_ratio=self.mlp_ratio,
            mlp_act=self.mlp_act,
            mlp_drop_rate=self.mlp_drop_rate,
            gmlp=self.gmlp,
            drop_path_rate=self.drop_path_rate,
            patch_norm=self.patch_norm,
            patchembed_version=self.patchembed_version,
            output_version=self.output_version,
            concat_skip=self.concat_skip,
            use_checkpoint=self.use_checkpoint,
            scan_impl=self.scan_impl,
            dtype=self.dtype,
        )

    def setup(self):
        self.core = UNetCore(**self._core_kwargs())

    def _mag_phase(self, x):
        hop = self.hop_length
        if x.shape[-1] % hop:
            x = jnp.pad(x, ((0, 0), (0, hop - x.shape[-1] % hop)))
        return wav2spectro(x, self.n_fft, hop, self.win_length, self.spectro_scale)

    def _i_mag_phase(self, mag, phase):
        return spectro2wav(
            mag, phase, self.n_fft, self.hop_length, self.win_length,
            self.spectro_scale,
        )

    def _apply_lfr(self, mag, phase, x, hf, chan: bool):
        """Low-frequency replacement per ``lfr_mode`` (see field docs).
        ``chan``: whether the caller received a (B, 1, T) input — the rank
        that makes the reference implementation a no-op."""
        if not self.low_freq_replacement or hf is None:
            return mag, phase
        if self.lfr_mode == "torch" and chan:
            return mag, phase  # reference production behaviour: no-op
        mag_org, phase_org = self._mag_phase(x)
        fn = (
            _low_freq_replacement_torch_2d
            if self.lfr_mode == "torch"
            else _low_freq_replacement
        )
        mag = fn(mag, mag_org, hf)
        if phase is not None:
            phase = fn(phase, phase_org, hf)
        return mag, phase

    def __call__(self, x, hf=None, deterministic: bool = True):
        """x: (B, T) or (B, 1, T) waveform; hf: (B,) highcut bin indices."""
        chan = x.ndim == 3
        if chan:
            x = x[:, 0, :]
        length = x.shape[-1]

        mag, phase = self._mag_phase(x)  # (B, F, T')
        mag_dc, phase_dc = mag[:, :1], phase[:, :1]
        mag, phase = mag[:, 1:], phase[:, 1:]

        # Per-sample standardisation (reference model.py:453-457; std is the
        # unbiased estimator to match torch.Tensor.std).
        mean = jnp.mean(mag, axis=(-2, -1), keepdims=True)
        std = jnp.std(mag, axis=(-2, -1), keepdims=True, ddof=1)
        magn = (mag - mean) / (1e-5 + std)
        residual = magn

        out = self.core(magn[..., None].astype(self.dtype), deterministic)
        out = out[..., 0].astype(jnp.float32)

        mag = (out + residual) * std + mean
        mag = jnp.concatenate([mag_dc, mag], axis=-2)
        phase = jnp.concatenate([phase_dc, phase], axis=-2)

        mag, phase = self._apply_lfr(mag, phase, x, hf, chan)

        wav = self._i_mag_phase(mag, phase)[..., :length]
        return wav[:, None, :] if chan else wav


class DualStreamInteractiveMambaUNet(MambaUNet):
    """Dual magnitude/phase streams with additive interactions
    (reference model.py:1006-1552). ``interact``: dual | p2m | m2p | single."""

    interact: str = "dual"
    phase_decoder_fix: bool = False
    # TPU dispatch optimization: the production path (phase_decoder_fix
    # False) routes BOTH streams through core_mag's decoder (reference
    # model.py:1148) — i.e. same weights, two calls. With fuse_streams the
    # two calls batch into one along the batch axis (identical per-sample
    # math: no op in the decoder mixes batch elements), halving the
    # decoder's op/dispatch count. A TPU core runs independent small ops
    # sequentially, so fewer, larger ops cut latency directly. In training
    # mode the fused call draws one dropout/DropPath rng stream for the
    # stacked batch instead of two — same distribution, different draws.
    fuse_streams: bool = False

    def setup(self):
        kwargs = self._core_kwargs()
        self.core_mag = UNetCore(**kwargs)
        if self.interact != "single":
            self.core_phase = UNetCore(**kwargs)

    def _interact(self, m, p):
        if self.interact == "dual":
            # Sequential adds — the second uses the updated mag
            # (reference model.py:1174-1176).
            m = m + p
            p = p + m
        elif self.interact == "p2m":
            m = m + p
        elif self.interact == "m2p":
            p = p + m
        return m, p

    def __call__(self, x, hf=None, deterministic: bool = True):
        if self.interact == "single":
            return self._forward_single(x, hf, deterministic)
        chan = x.ndim == 3
        if chan:
            x = x[:, 0, :]
        length = x.shape[-1]
        n = len(self.depths)

        mag, phase = self._mag_phase(x)
        mag_dc, phase_dc = mag[:, :1], phase[:, :1]
        mag, phase = mag[:, 1:], phase[:, 1:]
        residual_mag = mag  # (dual-stream forward skips normalisation,
        #                      reference model.py:1113-1116)

        m = mag[..., None].astype(self.dtype)
        p = phase[..., None].astype(self.dtype)
        m = self.core_mag.embed(m, deterministic)
        p = self.core_phase.embed(p, deterministic)
        skips = [(m, p)]

        has_latent = not isinstance(self.dims, int) and len(self.dims) == n + 1

        for i in range(n):
            m = self.core_mag.encode(i, m, deterministic)
            p = self.core_phase.encode(i, p, deterministic)
            if has_latent or i < n - 1:
                skips.append((m, p))
            m, p = self._interact(m, p)

        if has_latent:
            # Bottleneck: no stream interaction (reference model.py:1133-1139)
            m = self.core_mag.run_latent(m, deterministic)
            p = self.core_phase.run_latent(p, deterministic)

        fuse = self.fuse_streams and not self.phase_decoder_fix
        for i in range(n):
            if has_latent or i != 0:
                ms, ps = skips.pop()
                if self.concat_skip:
                    m_in = jnp.concatenate([m, ms], axis=-1)
                    p_in = jnp.concatenate([p, ps], axis=-1)
                    if fuse:
                        both = self.core_mag.decode(
                            i, jnp.concatenate([m_in, p_in], axis=0),
                            deterministic,
                        )
                        m, p = jnp.split(both, 2, axis=0)
                    else:
                        m = self.core_mag.decode(i, m_in, deterministic)
                        # Reference routes phase through the mag decoder here
                        # (model.py:1148/1270/1386); see module docstring.
                        phase_core = (
                            self.core_phase if self.phase_decoder_fix
                            else self.core_mag
                        )
                        p = phase_core.decode(i, p_in, deterministic)
                else:
                    m = self.core_mag.decode(i, m + ms, deterministic)
                    p = self.core_phase.decode(i, p + ps, deterministic)
            else:
                # Per-stream decoders here in the reference — not fusable.
                m = self.core_mag.decode(i, m, deterministic)
                p = self.core_phase.decode(i, p, deterministic)
            m, p = self._interact(m, p)

        ms, ps = skips.pop()
        if self.concat_skip:
            m = self.core_mag.output(
                jnp.concatenate([m, ms], axis=-1), deterministic
            )
            p = self.core_phase.output(
                jnp.concatenate([p, ps], axis=-1), deterministic
            )
        else:
            m = self.core_mag.output(m + ms, deterministic)
            p = self.core_phase.output(p + ps, deterministic)

        mag = m[..., 0].astype(jnp.float32) + residual_mag
        phase = p[..., 0].astype(jnp.float32)
        mag = jnp.concatenate([mag_dc, mag], axis=-2)
        phase = jnp.concatenate([phase_dc, phase], axis=-2)

        mag, phase = self._apply_lfr(mag, phase, x, hf, chan)

        wav = self._i_mag_phase(mag, phase)[..., :length]
        return wav[:, None, :] if chan else wav

    def _forward_single(self, x, hf, deterministic):
        """Magnitude-only stream; phase passthrough (reference
        model.py:1461-1542)."""
        chan = x.ndim == 3
        if chan:
            x = x[:, 0, :]
        length = x.shape[-1]

        mag, phase = self._mag_phase(x)
        mag_dc = mag[:, :1]
        magc = mag[:, 1:]
        residual_mag = magc

        out = self.core_mag(magc[..., None].astype(self.dtype), deterministic)
        magc = out[..., 0].astype(jnp.float32) + residual_mag
        mag = jnp.concatenate([mag_dc, magc], axis=-2)

        mag, _ = self._apply_lfr(mag, None, x, hf, chan)

        wav = self._i_mag_phase(mag, phase)[..., :length]
        return wav[:, None, :] if chan else wav


# ---------------------------------------------------------------------------
# Stacked dual-stream execution (TPU serving optimization)
#
# The dual-stream model runs two same-architecture cores (different weights)
# alternately, so the traced program is ~2x the op count of one core — and a
# TPU core executes independent small ops SEQUENTIALLY, so each tiny matmul
# pays its own overhead. Stacking the two streams into one leading axis and
# the two cores' weights into stacked parameters turns every pair of ops
# into ONE batched op (nn.vmap over the stream axis) at identical per-sample
# math. The reference has no counterpart (its CUDA streams could overlap; a
# TPU core cannot) — this is the idiomatic TPU answer to the dual-stream
# architecture of reference model.py:1006-1552.


def _stacked_core_cls():
    per = dict(
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        axis_size=2,
        out_axes=0,
    )
    return nn.vmap(
        UNetCore,
        methods={
            "embed": dict(in_axes=(0, None), **per),
            "encode": dict(in_axes=(None, 0, None), **per),
            "decode": dict(in_axes=(None, 0, None), **per),
            "run_latent": dict(in_axes=(0, None), **per),
            "output": dict(in_axes=(0, None), **per),
        },
    )


class DualStreamStackedMambaUNet(MambaUNet):
    """Execution-equivalent re-layout of DualStreamInteractiveMambaUNet:
    the magnitude/phase streams run as one stacked (2, B, ...) tensor
    through a stream-vmapped core whose parameters carry a leading
    stream axis. Convert trained dual-stream weights with
    :func:`stack_dual_params`; outputs match the unstacked model
    (equivalence-tested). The reference's phase-through-mag-decoder quirk
    (model.py:1148, PHASE_DECODER_FIX False) is encoded at CONVERSION
    time by stacking those decoder stages as [mag, mag]."""

    interact: str = "dual"
    phase_decoder_fix: bool = False

    def setup(self):
        if self.interact == "single":
            raise ValueError(
                "interact='single' has one stream — use MambaUNet or "
                "DualStreamInteractiveMambaUNet"
            )
        self.core = _stacked_core_cls()(**self._core_kwargs())

    def _interact_stacked(self, s):
        m, p = s[0], s[1]
        if self.interact == "dual":
            # Sequential adds — the second uses the updated mag
            # (reference model.py:1174-1176).
            m = m + p
            p = p + m
        elif self.interact == "p2m":
            m = m + p
        elif self.interact == "m2p":
            p = p + m
        return jnp.stack([m, p])

    def __call__(self, x, hf=None, deterministic: bool = True):
        chan = x.ndim == 3
        if chan:
            x = x[:, 0, :]
        length = x.shape[-1]
        n = len(self.depths)

        mag, phase = self._mag_phase(x)
        mag_dc, phase_dc = mag[:, :1], phase[:, :1]
        mag, phase = mag[:, 1:], phase[:, 1:]
        residual_mag = mag

        s = jnp.stack([mag, phase])[..., None].astype(self.dtype)
        s = self.core.embed(s, deterministic)
        skips = [s]

        has_latent = not isinstance(self.dims, int) and len(self.dims) == n + 1

        for i in range(n):
            s = self.core.encode(i, s, deterministic)
            if has_latent or i < n - 1:
                skips.append(s)
            s = self._interact_stacked(s)

        if has_latent:
            s = self.core.run_latent(s, deterministic)

        for i in range(n):
            if has_latent or i != 0:
                sk = skips.pop()
                if self.concat_skip:
                    s = self.core.decode(
                        i, jnp.concatenate([s, sk], axis=-1), deterministic
                    )
                else:
                    s = self.core.decode(i, s + sk, deterministic)
            else:
                s = self.core.decode(i, s, deterministic)
            s = self._interact_stacked(s)

        sk = skips.pop()
        if self.concat_skip:
            s = self.core.output(
                jnp.concatenate([s, sk], axis=-1), deterministic
            )
        else:
            s = self.core.output(s + sk, deterministic)

        m, p = s[0], s[1]
        mag = m[..., 0].astype(jnp.float32) + residual_mag
        phase = p[..., 0].astype(jnp.float32)
        mag = jnp.concatenate([mag_dc, mag], axis=-2)
        phase = jnp.concatenate([phase_dc, phase], axis=-2)

        mag, phase = self._apply_lfr(mag, phase, x, hf, chan)

        wav = self._i_mag_phase(mag, phase)[..., :length]
        return wav[:, None, :] if chan else wav


def stack_dual_params(params, *, concat_skip: bool = True,
                      has_latent: bool = False,
                      phase_decoder_fix: bool = False):
    """Convert DualStreamInteractiveMambaUNet params ({core_mag, core_phase})
    into DualStreamStackedMambaUNet params ({core} with a leading stream
    axis on every leaf).

    Weight-selection rules mirror the unstacked orchestration exactly:
    decoder stages where the reference routes BOTH streams through the mag
    decoder (concat-skip stages past the innermost one, model.py:1148,
    when ``phase_decoder_fix`` is off) stack as [mag, mag]; everything
    else stacks as [mag, phase].
    """
    import jax as _jax

    m, p = params["core_mag"], params["core_phase"]

    def both(sub_m, sub_p):
        return _jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]), sub_m, sub_p
        )

    def mag_only(sub_m):
        return _jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), sub_m)

    out = {}
    for key in m:
        use_quirk = False
        if key.startswith("decoders_") and concat_skip and not phase_decoder_fix:
            idx = int(key.rsplit("_", 1)[1])
            use_quirk = has_latent or idx != 0
        out[key] = mag_only(m[key]) if use_quirk else both(m[key], p[key])
    return {"core": out}
