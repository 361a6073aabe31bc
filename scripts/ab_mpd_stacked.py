"""A/B the stacked MPD execution on real TPU (VERDICT r04 item 6): the full
48 kHz GAN train step with TRAIN.ADVERSARIAL.MPD_STACKED off/on (and group
variants), plus the no-GAN step so the MPD's marginal ms is isolated by
subtraction. Honest differential D2H-anchored timing (bench._train_step_dt).

Usage: python scripts/ab_mpd_stacked.py [--iters N] [--batch N]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config
    from bench import _train_step_dt

    def cfg(gan=True, stacked=False, groups=()):
        c = _flagship_config(batch_size=args.batch, gan=gan)
        c.OUTPUT = "/tmp/vm_asr_tpu_ab_mpd"
        c.MODEL.VSSM.FUSE_STREAMS = True
        c.TRAIN.ADVERSARIAL.MPD_STACKED = stacked
        c.TRAIN.ADVERSARIAL.MPD_STACK_GROUPS = [list(g) for g in groups]
        return c

    variants = [
        ("no_gan", cfg(gan=False)),
        ("mpd_sequential", cfg()),
        ("mpd_stacked_1group", cfg(stacked=True)),
        ("mpd_stacked_2groups", cfg(stacked=True,
                                    groups=((2, 3), (5, 7, 11)))),
        ("mpd_stacked_3groups", cfg(stacked=True,
                                    groups=((2, 3), (5, 7), (11,)))),
    ]
    results = {}
    for name, c in variants:
        try:
            dt = _train_step_dt(c, args.batch, iters=args.iters)
        except Exception as e:  # keep the sweep alive per-variant
            print(json.dumps({"variant": name, "error": str(e)[-300:]}),
                  flush=True)
            continue
        results[name] = dt
        rec = {"variant": name, "ms_per_step": round(dt * 1e3, 1)}
        if "no_gan" in results and name != "no_gan":
            rec["mpd_marginal_ms"] = round(
                (dt - results["no_gan"]) * 1e3, 1)
        print(json.dumps(rec), flush=True)

    if "mpd_sequential" in results:
        base = results["mpd_sequential"]
        for name, dt in results.items():
            if name.startswith("mpd_stacked"):
                print(json.dumps({
                    "speedup_vs_sequential": name,
                    "step": round(base / dt, 3),
                }))


if __name__ == "__main__":
    main()
