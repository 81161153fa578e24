"""Trainer adapters: every baseline behind the one pluggable interface.

The reference ships a separate driver script per baseline
(code/baselines/*_baseline.py), each re-implementing the same epoch loop.
Here one Trainer runs them all: each adapter maps the canonical batch
contract — apply(params, src [T,B,2F], static, times [T,B], lengths,
train, rng) -> (logits, aux) — onto the baseline's native inputs.

Loss conventions: CrossEntropy on n_classes logits for all models. The
reference's GRU-D P12 path uses scalar sigmoid + BCELoss
(GRU-D_baseline.py:289); the 'grud_bce' adapter reproduces that objective
exactly via the [0, z] logit embedding, while plain 'grud' keeps the
uniform CE head (DEVIATIONS.md #3). IP-Net adds its autoencoder
reconstruction as `aux`, weighted into the loss by
TrainConfig.aux_loss_weight (the reference trains main+aux jointly,
IP_Net_baseline.py:97-118).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.config import RaindropConfig


def make_baseline(name: str, cfg: RaindropConfig, hp: dict = None
                  ) -> Tuple[Callable, Callable]:
    """(init_fn, apply_fn) for Trainer(cfg, tcfg, init_fn=..., apply_fn=...).

    hp: per-family hyperparameters, keyed by the reference drivers' own
    flag names (underscored). Defaults below are the reference drivers'
    published values — mTAND `mTAND_baseline.py:21-52` (rec-hidden 32,
    embed-time 128, num-heads 1), MTGNN `MTGNN_baseline.py:281-289`
    (conv 16 / residual 16 / skip 32 / end 64, 5 layers, dilation 2,
    gcn_depth 2, subgraph 20), DGM2 `DGM2_baseline.py:74-84,305-308`
    (cluster_num 20, latent 10, ode units 10), IP-Net
    `IP_Net_baseline.py` (192 ref points, hid 100, 48 h). run.py exposes
    every knob as grouped `--<family>-<flag>` arguments.
    """
    hp = dict(hp or {})
    F = cfg.d_inp

    def pop(key, default):
        return hp.pop(key, default)

    def done():
        if hp:
            raise ValueError(
                f"unknown hyperparameters for baseline {name!r}: "
                f"{sorted(hp)}")

    if name == "transformer":
        done()
        from raindrop_tpu.baselines.transformer import (
            transformer2_apply, transformer2_init)
        return (lambda key: transformer2_init(key, cfg),
                lambda p, src, st, tm, ln, train, rng:
                transformer2_apply(p, cfg, src, st, tm, ln,
                                   train=train, rng=rng))

    if name == "transformer_ctx":
        done()
        from raindrop_tpu.baselines.transformer_ctx import (
            transformer_ctx_apply, transformer_ctx_init)
        return (lambda key: transformer_ctx_init(key, cfg),
                lambda p, src, st, tm, ln, train, rng:
                transformer_ctx_apply(p, cfg, src, st, tm, ln,
                                      train=train, rng=rng))

    if name == "transformer_moe":
        done()
        from raindrop_tpu.baselines.transformer_moe import (
            transformer_moe_apply, transformer_moe_init)
        return (lambda key: transformer_moe_init(key, cfg),
                lambda p, src, st, tm, ln, train, rng:
                transformer_moe_apply(p, cfg, src, st, tm, ln,
                                      train=train, rng=rng))

    if name == "seft":
        done()
        from raindrop_tpu.baselines.seft import seft_apply, seft_init
        return (lambda key: seft_init(key, cfg),
                lambda p, src, st, tm, ln, train, rng:
                seft_apply(p, cfg, src, st, tm, ln, train=train, rng=rng))

    if name == "raindrop_v1":
        done()
        from raindrop_tpu.models.raindrop_v1 import (
            raindrop_v1_apply, raindrop_v1_init)
        return (lambda key: raindrop_v1_init(key, cfg),
                lambda p, src, st, tm, ln, train, rng:
                raindrop_v1_apply(p, cfg, src, st, tm, ln,
                                  train=train, rng=rng))

    if name in ("grud", "grud_bce"):
        done()
        from raindrop_tpu.baselines.grud import (
            build_delta, grud_apply, grud_init)

        # 'grud_bce' reproduces the reference's P12/P19 objective EXACTLY:
        # a single sigmoid output trained with BCELoss
        # (code/baselines/GRU-D_baseline.py:289). The scalar logit z is
        # emitted as the 2-class vector [0, z], for which the Trainer's
        # softmax CE equals BCE-with-logits on z (softmax([0,z])[1] ==
        # sigmoid(z)) — same gradients, same trained function, and every
        # downstream metric path works unchanged. Plain 'grud' keeps the
        # uniform n-class CE head used across all baselines (DEVIATIONS.md
        # #3).
        bce = name == "grud_bce"
        if bce and cfg.n_classes != 2:
            raise ValueError(
                f"grud_bce is the binary sigmoid+BCE objective; "
                f"{cfg.n_classes}-class datasets need --model grud")

        def init(key):
            return grud_init(key, F, 1 if bce else cfg.n_classes)

        def apply(p, src, st, tm, ln, train, rng):
            x = src[:, :, :F].transpose(1, 0, 2)        # [B, T, F]
            m = src[:, :, F:2 * F].transpose(1, 0, 2)
            delta = build_delta(m, tm.transpose(1, 0))
            out, _ = grud_apply(p, x, m, delta,
                                dropout_rate=cfg.dropout,
                                train=train, rng=rng)
            if bce:
                out = jnp.concatenate([jnp.zeros_like(out), out], axis=-1)
            return out, jnp.zeros(())

        return init, apply

    if name == "mtand":
        from raindrop_tpu.baselines.mtand import mtand_apply, mtand_init

        nhidden = pop("rec_hidden", 32)
        embed_time = pop("embed_time", 128)
        num_heads = pop("num_heads", 1)
        n_ref = pop("num_ref_points", 128)
        done()

        def init(key):
            return mtand_init(key, 2 * F, nhidden=nhidden,
                              embed_time=embed_time, num_heads=num_heads,
                              n_ref=n_ref, n_classes=cfg.n_classes)

        def apply(p, src, st, tm, ln, train, rng):
            x = src.transpose(1, 0, 2)                  # [B, T, 2F]
            # mTAND normalizes timelines to [0, 1] by the 48h max
            # (reference mTAND/utils.py:516-518)
            t01 = tm.transpose(1, 0) / 48.0
            return mtand_apply(p, x, t01, num_heads=num_heads,
                               train=train, rng=rng)

        return init, apply

    if name == "mtgnn":
        from raindrop_tpu.baselines.mtgnn import mtgnn_apply, mtgnn_init

        mt_kw = {k: pop(k, d) for k, d in (
            ("gcn_depth", 2), ("conv_channels", 16),
            ("residual_channels", 16), ("skip_channels", 32),
            ("end_channels", 64), ("layers", 5),
            ("dilation_exponential", 2), ("subgraph_size", 20),
            ("tanhalpha", 3.0), ("propalpha", 0.05))}
        done()

        def init(key):
            return mtgnn_init(key, F, cfg.max_len, cfg.n_classes,
                              d_static=cfg.d_static if cfg.static else 0,
                              **mt_kw)

        def apply(p, src, st, tm, ln, train, rng):
            vals = src[:, :, :F].transpose(1, 0, 2)     # [B, T, F]
            return mtgnn_apply(p, vals, st if cfg.static else None,
                               dropout_rate=cfg.dropout,
                               train=train, rng=rng)

        return init, apply

    if name == "dgm2":
        from raindrop_tpu.baselines.dgm2 import dgm2_apply, dgm2_init

        dg_kw = {k: pop(k, d) for k, d in (
            ("latent_dim", 10), ("cluster_num", 20), ("ode_units", 10))}
        done()

        def init(key):
            return dgm2_init(key, F, cfg.max_len, cfg.n_classes,
                             d_static=cfg.d_static if cfg.static else 0,
                             **dg_kw)

        def apply(p, src, st, tm, ln, train, rng):
            vals = src[:, :, :F].transpose(1, 0, 2)
            # shared uniform timeline like evaluate_DGM2
            # (reference code/baselines/utils_phy12.py:480-482)
            timeline = jnp.linspace(0.0, float(cfg.max_len), cfg.max_len)
            logits, _ = dgm2_apply(p, vals, timeline,
                                   st if cfg.static else None,
                                   train=train, rng=rng)
            return logits, jnp.zeros(())

        return init, apply

    if name == "ipnet":
        from raindrop_tpu.baselines.ipnet import (
            ipnet_apply, ipnet_init, ipnet_reconstruction_loss)

        ip_kw = {k: pop(k, d) for k, d in (
            ("ref_points", 192), ("hid", 100),
            ("hours_look_ahead", 48.0))}
        done()

        def init(key):
            return ipnet_init(key, F, n_classes=cfg.n_classes, **ip_kw)

        def apply(p, src, st, tm, ln, train, rng):
            vals = src[:, :, :F].transpose(1, 0, 2).transpose(0, 2, 1)
            mask = src[:, :, F:2 * F].transpose(1, 0, 2).transpose(0, 2, 1)
            ts = jnp.broadcast_to(tm.transpose(1, 0)[:, None, :], mask.shape)
            holdout = jnp.zeros_like(mask)   # no held-out set at train time
            x4 = jnp.concatenate([vals, mask, ts, holdout], axis=1)
            logits, reconst = ipnet_apply(p, x4, train=train, rng=rng)
            # reconstruction of OBSERVED entries as the aux objective
            # (the reference holds out 20% — IP_Net_baseline.py:156-162;
            # with holdout=0 the masked loss covers all observed entries)
            aux = ipnet_reconstruction_loss(
                x4.at[:, 3 * F:].set(0.0), reconst, jnp.ones((F,)))
            return logits, aux

        return init, apply

    raise ValueError(f"unknown baseline {name!r}")


BASELINES = ("transformer", "transformer_ctx", "transformer_moe", "seft",
             "raindrop_v1", "grud", "mtand", "mtgnn", "dgm2", "ipnet")
