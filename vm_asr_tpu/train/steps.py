"""Jitted train / eval step factories.

Reference execution semantics (trainer/trainer.py:98-438): one generator
forward per batch; generator losses (L1/L2/multi-res STFT + adversarial +
feature-matching), discriminator losses on the detached fake; two optimizers
stepped per batch. On TPU this is a single jitted function — the generator
update, discriminator update, and all metrics fuse into one XLA program, with
bf16 compute / fp32 params replacing CUDA AMP + GradScaler (no loss scaling
needed: bf16 has fp32's exponent range).

Data parallelism: callers shard the batch's leading axis over the mesh's
``dp`` axis and replicate states; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import losses as L
from ..metrics import get_metrics


def build_gen_loss_terms(config) -> Tuple[Any, ...]:
    gen_losses = tuple(config.TRAIN.LOSSES.GEN)
    adv = config.TRAIN.ADVERSARIAL
    stft_kwargs = dict(
        factor_sc=adv.STFT_LOSS.SC_FACTOR,
        factor_mag=adv.STFT_LOSS.MAG_FACTOR,
        emphasize_high_freq=adv.STFT_LOSS.EMPHASIZE_HIGH_FREQ,
    )
    return gen_losses, stft_kwargs


def make_train_step(
    config,
    generator,
    discriminators: Dict[str, Any],
    metric_names=None,
) -> Callable:
    """Returns train_step(gen_state, disc_states, batch, rng) →
    (gen_state, disc_states, metrics_dict)."""
    gen_losses, stft_kwargs = build_gen_loss_terms(config)
    adv_cfg = config.TRAIN.ADVERSARIAL
    gan = bool(adv_cfg.ENABLE) and len(discriminators) > 0
    gan_type = adv_cfg.GAN_LOSS_TYPE
    feat_lambda = adv_cfg.FEATURE_LOSS_LAMBDA
    only_feat = adv_cfg.ONLY_FEATURE_LOSS
    only_adv = adv_cfg.ONLY_ADVERSARIAL_LOSS
    metric_fns = get_metrics(metric_names or config.TRAIN.METRICS)
    disc_names = tuple(sorted(discriminators.keys()))
    # Input gain for every D pass (TRAIN.ADVERSARIAL.DISC_INPUT_GAIN; 1.0 =
    # reference-faithful). See the config definition for why audio-scale
    # inputs leave the MPD blind at the LSGAN equilibrium.
    disc_gain = float(getattr(adv_cfg, "DISC_INPUT_GAIN", 1.0))

    def disc_forward(name, variables, real, fake, update_stats):
        model = discriminators[name]
        if disc_gain != 1.0:
            real = real * disc_gain
            fake = None if fake is None else fake * disc_gain
        out = model.apply(
            variables, real, fake,
            update_stats=update_stats,
            mutable=["batch_stats"] if update_stats else False,
        )
        if update_stats:
            (y_r, y_g, f_r, f_g), mut = out
            return y_r, y_g, f_r, f_g, mut["batch_stats"]
        y_r, y_g, f_r, f_g = out
        return y_r, y_g, f_r, f_g, None

    def gen_loss_fn(params, disc_states, x, y, hf, rng):
        wave_out = generator.apply(
            {"params": params}, x, hf,
            deterministic=False, rngs={"dropout": rng},
        )
        terms = {}
        if "l1" in gen_losses:
            terms["l1"] = L.mae_loss(wave_out, y)
        if "l2" in gen_losses:
            terms["l2"] = L.mse_loss(wave_out, y)
        if "multi_resolution_stft" in gen_losses:
            sc, mag = L.multi_resolution_stft_loss(
                wave_out[:, 0, :], y[:, 0, :], **stft_kwargs
            )
            terms["multi_resolution_stft"] = sc + mag
        if gan:
            for name in disc_names:
                ds = disc_states[name]
                variables = {"params": ds.params, "batch_stats": ds.batch_stats}
                _, y_g, f_r, f_g, _ = disc_forward(
                    name, variables, y, wave_out, update_stats=False
                )
                if not only_feat:
                    terms[f"adversarial_{name}"] = L.generator_adversarial_loss(
                        y_g, gan_type
                    )
                if not only_adv:
                    terms[f"features_{name}"] = feat_lambda * L.feature_matching_loss(
                        f_r, f_g
                    )
        total = sum(terms.values())
        return total, (wave_out, terms)

    def disc_loss_fn(disc_params, name, batch_stats, y, fake, gp_rng):
        variables = {"params": disc_params, "batch_stats": batch_stats}
        y_r, y_g, _, _, new_stats = disc_forward(
            name, variables, y, fake, update_stats=True
        )
        # Adversarial-health signal: mean D(real) − D(fake) per sub-D. A
        # discriminator pinned at the blind LSGAN equilibrium (score 0.5 for
        # everything, loss exactly 2.5/sub-D·5) shows gap ≈ 0 — the r03
        # conv48 run's failure signature (VERDICT r03 weak #1).
        gaps = jnp.stack([
            jnp.mean(dr.astype(jnp.float32)) - jnp.mean(dg.astype(jnp.float32))
            for dr, dg in zip(y_r, y_g)
        ])
        loss = L.discriminator_loss(y_r, y_g, gan_type)
        if gan_type == "wgan-gp":
            # Gradient penalty on interpolates (reference trainer.py:374-378 +
            # loss.py:237-260). The penalty is taken w.r.t. D's ACTUAL input
            # space: with DISC_INPUT_GAIN != 1 the endpoints are pre-scaled
            # so the unit-gradient-norm target constrains D itself, not
            # D∘gain (which would silently rescale GP_LAMBDA's Lipschitz
            # target by the gain).
            def scores(x):
                out = discriminators[name].apply(variables, x, None,
                                                 update_stats=False)
                return out[0]

            loss = loss + L.gradient_penalty(
                scores, y * disc_gain, fake * disc_gain, gp_rng,
                gp_weight=adv_cfg.GP_LAMBDA,
            )
        return loss, (new_stats, gaps)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(gen_state, disc_states, batch, rng):
        x, y, hf = batch["wave_input"], batch["wave_target"], batch["highcut"]
        (g_total, (wave_out, g_terms)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(gen_state.params, disc_states, x, y, hf, rng)
        gen_state = gen_state.apply_gradients(g_grads)

        metrics = {"total_loss": g_total}
        metrics.update({f"generator/{k}": v for k, v in g_terms.items()})

        if gan:
            fake = jax.lax.stop_gradient(wave_out)
            d_total = 0.0
            new_disc_states = dict(disc_states)
            for di, name in enumerate(disc_names):
                ds = disc_states[name]
                # Stable fold index (Python's str hash is PYTHONHASHSEED-
                # randomised → irreproducible wgan-gp runs across processes).
                gp_rng = jax.random.fold_in(rng, di)
                (d_loss, (new_stats, gaps)), d_grads = jax.value_and_grad(
                    disc_loss_fn, has_aux=True
                )(ds.params, name, ds.batch_stats, y, fake, gp_rng)
                new_disc_states[name] = ds.apply_gradients(d_grads, new_stats)
                metrics[f"discriminator/{name}"] = d_loss
                metrics[f"disc_gap/{name}"] = jnp.mean(gaps)
                metrics[f"disc_gap/{name}_max"] = jnp.max(jnp.abs(gaps))
                d_total = d_total + d_loss
            disc_states = new_disc_states
            metrics["total_disc_loss"] = d_total

        out_flat, y_flat = wave_out[:, 0, :], y[:, 0, :]
        for mname, fn in metric_fns.items():
            metrics[mname] = fn(out_flat, y_flat, hf=hf)
        return gen_state, disc_states, metrics

    # Exposed for equivalence harnesses (dryrun_multichip's dp-vs-mp phase
    # compares raw generator gradients — post-optimizer params are not
    # comparable where a gradient is numerically ~0, because AdamW
    # amplifies noise sign into a full ±lr step).
    train_step.gen_loss_fn = gen_loss_fn
    return train_step


def make_eval_step(config, generator, discriminators=None, metric_names=None
                   ) -> Callable:
    """Validation step: forward + losses + metrics, no updates
    (reference trainer.py:224-316)."""
    gen_losses, stft_kwargs = build_gen_loss_terms(config)
    metric_fns = get_metrics(metric_names or config.TRAIN.METRICS)

    @jax.jit
    def eval_step(gen_params, batch):
        x, y, hf = batch["wave_input"], batch["wave_target"], batch["highcut"]
        wave_out = generator.apply({"params": gen_params}, x, hf,
                                   deterministic=True)
        metrics = {}
        total = 0.0
        if "l1" in gen_losses:
            metrics["generator/l1"] = L.mae_loss(wave_out, y)
            total = total + metrics["generator/l1"]
        if "l2" in gen_losses:
            metrics["generator/l2"] = L.mse_loss(wave_out, y)
            total = total + metrics["generator/l2"]
        if "multi_resolution_stft" in gen_losses:
            sc, mag = L.multi_resolution_stft_loss(
                wave_out[:, 0, :], y[:, 0, :], **stft_kwargs
            )
            metrics["generator/multi_resolution_stft"] = sc + mag
            total = total + sc + mag
        metrics["total_loss"] = total
        out_flat, y_flat = wave_out[:, 0, :], y[:, 0, :]
        for mname, fn in metric_fns.items():
            metrics[mname] = fn(out_flat, y_flat, hf=hf)
        return wave_out, metrics

    return eval_step


def make_forward_fn(generator) -> Callable:
    """Jitted inference forward (used by the tester/inferencer/bench)."""

    @jax.jit
    def forward(params, x, hf):
        return generator.apply({"params": params}, x, hf, deterministic=True)

    return forward


# Segment-batch bucket sizes for variable-length inference. XLA compiles one
# program per input shape, and a real eval set (VCTK: 824 files) has hundreds
# of distinct clip lengths ⇒ distinct segment counts S — compiling per S
# would make evaluation compile-bound. The reference evaluates arbitrary
# lengths with no recompilation because it loops per segment
# (reference tester.py:106-140); here segments run in batch-8 chunks with the
# tail padded up to the next bucket, so AT MOST len(_SEG_BUCKETS) programs
# cover every possible clip length.
_SEG_BUCKETS = (1, 2, 4, 8)


def segment_bucket_counts(num_segments: int):
    """How many chunks of each bucket size a `num_segments`-segment clip
    runs through (mirrors bucketed_forward's chunking exactly)."""
    counts, i = {}, 0
    while i < num_segments:
        rem = min(num_segments - i, _SEG_BUCKETS[-1])
        b = next(x for x in _SEG_BUCKETS if x >= rem)
        counts[b] = counts.get(b, 0) + 1
        i += rem
    return counts


def segment_buckets(num_segments: int):
    """The bucket sizes a `num_segments`-segment clip runs through."""
    return set(segment_bucket_counts(num_segments))


def bucketed_forward(forward, params, seg_batch, hf_batch) -> Any:
    """Run S segments through at most ``len(_SEG_BUCKETS)`` XLA programs.

    seg_batch: (S, 1, seg_len); hf_batch: (S,). Tail chunks are zero-padded
    up to the bucket size (hf edge-padded) and the padded outputs dropped.
    """
    import jax.numpy as jnp

    s = seg_batch.shape[0]
    outs = []
    i = 0
    while i < s:
        rem = min(s - i, _SEG_BUCKETS[-1])
        b = next(x for x in _SEG_BUCKETS if x >= rem)
        chunk = seg_batch[i:i + rem]
        hfc = hf_batch[i:i + rem]
        if rem < b:
            chunk = jnp.pad(chunk, ((0, b - rem), (0, 0), (0, 0)))
            hfc = jnp.pad(hfc, ((0, b - rem),), mode="edge")
        outs.append(forward(params, chunk, hfc)[:rem])
        i += rem
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
