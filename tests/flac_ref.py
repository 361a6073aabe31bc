"""Minimal FLAC *encoder* used to generate test vectors for the native
decoder (native/src/flac_decoder.cpp). Correctness over compression: every
choice of subframe type / rice parameter / partition order below produces a
spec-valid stream, which is all the decoder tests need. CRCs are written as
zeros (the decoder parses past them by design)."""

from __future__ import annotations

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class BitWriter:
    def __init__(self):
        self.bits: list = []

    def write(self, value: int, n: int):
        value = int(value) & ((1 << n) - 1) if n < 64 else int(value)
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def _rice_write(bw: BitWriter, residual, param: int):
    for e in residual:
        # zigzag: non-negative → 2e, negative → -2e-1
        u = (2 * int(e)) if e >= 0 else (-2 * int(e) - 1)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _write_residual(bw: BitWriter, residual, order: int, blocksize: int,
                    param: int, partition_order: int, escape: bool):
    bw.write(0, 2)  # method 0: 4-bit rice
    bw.write(partition_order, 4)
    n_parts = 1 << partition_order
    idx = 0
    for p in range(n_parts):
        count = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = residual[idx: idx + count]
        idx += count
        if escape and p == 0:
            raw_bits = max(2, int(np.abs(part).max()).bit_length() + 1) if len(part) else 2
            bw.write(0xF, 4)
            bw.write(raw_bits, 5)
            for e in part:
                bw.write(int(e), raw_bits)
        else:
            bw.write(param, 4)
            _rice_write(bw, part, param)


def _write_subframe(bw: BitWriter, s: np.ndarray, bps: int, mode: str,
                    rice_param: int = 4, partition_order: int = 0,
                    escape: bool = False):
    s = s.astype(np.int64)
    n = len(s)
    bw.write(0, 1)  # pad
    if mode == "constant":
        assert (s == s[0]).all()
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(s[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[5:])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(int(v), bps)
        coef = FIXED_COEFFS[order]
        res = [
            int(s[i]) - sum(c * int(s[i - 1 - j]) for j, c in enumerate(coef))
            for i in range(order, n)
        ]
        _write_residual(bw, np.asarray(res), order, n, rice_param,
                        partition_order, escape)
    elif mode.startswith("lpc"):
        order = int(mode[3:])
        precision, shift = 12, 5
        rng = np.random.default_rng(order)
        coef = rng.integers(-(1 << 10), 1 << 10, size=order)
        bw.write(32 + (order - 1), 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coef:
            bw.write(int(c), precision)
        res = [
            int(s[i]) - (sum(int(c) * int(s[i - 1 - j])
                             for j, c in enumerate(coef)) >> shift)
            for i in range(order, n)
        ]
        _write_residual(bw, np.asarray(res), order, n, rice_param,
                        partition_order, escape)
    else:
        raise ValueError(mode)


def encode_flac(
    samples: np.ndarray,  # (channels, n) int
    sample_rate: int,
    bps: int = 16,
    blocksize: int = 256,
    mode: str = "verbatim",
    channel_mode: str = "independent",  # | left_side | mid_side
    rice_param: int = 4,
    partition_order: int = 0,
    escape: bool = False,
) -> bytes:
    samples = np.atleast_2d(np.asarray(samples, np.int64))
    channels, n = samples.shape

    bw = BitWriter()
    bw.write(int.from_bytes(b"fLaC", "big"), 32)
    # STREAMINFO (last metadata block)
    bw.write(0x80, 8)
    bw.write(34, 24)
    bw.write(blocksize, 16)
    bw.write(blocksize, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)

    ch_code = {"independent": channels - 1, "left_side": 8, "mid_side": 10}[
        channel_mode
    ]
    n_blocks = -(-n // blocksize)
    for fi in range(n_blocks):
        blk = samples[:, fi * blocksize: (fi + 1) * blocksize]
        bs = blk.shape[1]
        if bs < blocksize:  # pad the tail block (then rely on total_samples)
            blk = np.pad(blk, ((0, 0), (0, blocksize - bs)))
            bs = blocksize
        bw.align()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(ch_code, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)  # reserved
        assert fi < 128
        bw.write(fi, 8)  # UTF-8 coded frame number (single byte)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 (unchecked)

        if channel_mode == "independent":
            subs = [(blk[c], bps) for c in range(channels)]
        elif channel_mode == "left_side":
            assert channels == 2
            subs = [(blk[0], bps), (blk[0] - blk[1], bps + 1)]
        else:  # mid_side
            assert channels == 2
            side = blk[0] - blk[1]
            mid = (blk[0] + blk[1]) >> 1
            subs = [(mid, bps), (side, bps + 1)]
        for s, sub_bps in subs:
            _write_subframe(bw, s, sub_bps, mode, rice_param,
                            partition_order, escape)
        bw.align()
        bw.write(0, 16)  # CRC-16 (unchecked)

    return bw.tobytes()
