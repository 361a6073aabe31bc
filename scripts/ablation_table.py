#!/usr/bin/env python
"""Epoch-matched GAN-on vs GAN-off comparison table (VERDICT r04 item 3).

Usage:
    python scripts/ablation_table.py GAN_CURVE.csv NOGAN_CURVE.csv [--md]

Both inputs are extract_curve.py outputs. Prints one row per epoch present
in BOTH curves: valid LSD / SNR / multi-res STFT for each arm plus the
LSD delta (negative = GAN arm better). The GAN arm's extra columns
(disc_gap, adversarial losses) ride along so the adversarial health is
visible next to the quality delta.
"""

import argparse
import csv


def load(path):
    with open(path) as fh:
        return {int(r["epoch"]): r for r in csv.DictReader(fh)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gan_csv")
    ap.add_argument("nogan_csv")
    ap.add_argument("--md", action="store_true", help="markdown table")
    args = ap.parse_args()

    gan, nogan = load(args.gan_csv), load(args.nogan_csv)
    epochs = sorted(set(gan) & set(nogan))
    if not epochs:
        raise SystemExit("no overlapping epochs")

    cols = ("epoch", "lsd_gan", "lsd_nogan", "lsd_delta",
            "snr_gan", "snr_nogan", "stft_gan", "stft_nogan",
            "disc_gap", "adv_mpd")
    sep = " | " if args.md else ","
    if args.md:
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
    else:
        print(",".join(cols))
    for e in epochs:
        g, n = gan[e], nogan[e]
        row = [
            str(e),
            g["lsd_valid"], n["lsd_valid"],
            f"{float(g['lsd_valid']) - float(n['lsd_valid']):+.4f}",
            g["snr_valid"], n["snr_valid"],
            g["generator/multi_resolution_stft_valid"],
            n["generator/multi_resolution_stft_valid"],
            g.get("disc_gap/mpd_train", ""),
            g.get("generator/adversarial_mpd_train", ""),
        ]
        line = sep.join(row)
        print(f"| {line} |" if args.md else line)

    import statistics
    deltas = [float(gan[e]["lsd_valid"]) - float(nogan[e]["lsd_valid"])
              for e in epochs]
    tail = deltas[len(deltas) // 2:]
    print(f"# epochs={len(epochs)} mean_lsd_delta={statistics.mean(deltas):+.4f} "
          f"tail_mean={statistics.mean(tail):+.4f} "
          f"(negative = adversarial arm better)")


if __name__ == "__main__":
    main()
