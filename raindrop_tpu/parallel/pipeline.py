"""Pipeline parallelism (GPipe-style) over a named 'pipe' mesh axis.

The reference has no model parallelism of any kind (SURVEY.md §2.5); this is
the TPU-native pipeline slot. Layers are placed round-robin-free — stage s
holds layer s — with microbatches streamed through the stages:

  * stage parameters are stacked on a leading axis and sharded over 'pipe',
    so each device materializes only its own stage's weights;
  * activations move stage-to-stage with `jax.lax.ppermute` (ICI
    neighbor-to-neighbor traffic — the cheapest collective on a TPU torus);
  * the schedule is the classic GPipe fill/steady/drain loop: M microbatches
    through S stages in M + S - 1 ticks, expressed as one `lax.scan` so the
    whole pipeline stays inside a single jit region and is reverse-mode
    differentiable (backprop replays the scan — GPipe training, not just
    inference).

For Raindrop's temporal transformer the natural staging is one encoder layer
per stage (`pipeline_transformer_encoder`), which matches the reference's
nlayers=2 (code/Raindrop.py:131) on a 2-stage pipe.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map


def stack_stage_params(stage_list):
    """Stack per-stage parameter pytrees on a new leading 'stage' axis.

    All stages must share one tree structure and leaf shapes (true for
    uniform encoder layers). The result is shard-able with P('pipe').
    """
    return jax.tree.map(lambda *ls: jnp.stack(ls), *stage_list)


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable,
    stage_params,
    xs,
    axis: str = "pipe",
):
    """Run microbatches through an S-stage pipeline.

    Args:
      mesh: mesh containing `axis` with size S == number of stages.
      stage_fn: (params_for_one_stage, microbatch_pytree) -> same-structure
        pytree. Must be shape-preserving (stage output feeds the next stage).
      stage_params: pytree with leading stage axis S on every leaf.
      xs: pytree of microbatched inputs, leaves [M, microbatch, ...].

    Returns the pytree of outputs, leaves [M, microbatch, ...].
    """
    S = mesh.shape[axis]
    leaves = jax.tree.leaves(xs)
    M = leaves[0].shape[0]
    param_specs = jax.tree.map(lambda _: P(axis), stage_params)
    data_specs = jax.tree.map(lambda _: P(), xs)

    @partial(shard_map, mesh=mesh,
             in_specs=(param_specs, data_specs), out_specs=data_specs,
             check_vma=False)
    def run(params, xs):
        # each device holds exactly its stage's slice (leading dim 1)
        params = jax.tree.map(lambda a: jnp.squeeze(a, 0), params)
        stage = jax.lax.axis_index(axis)
        perm = [(i, i + 1) for i in range(S - 1)]

        state = jax.tree.map(lambda a: jnp.zeros(a.shape[1:], a.dtype), xs)
        outputs = jax.tree.map(jnp.zeros_like, xs)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clamped; garbage fed after the
            # last microbatch never reaches the drain — see `valid` below)
            t_in = jnp.clip(t, 0, M - 1)
            inp = jax.tree.map(
                lambda xall, s: jnp.where(
                    stage == 0, jax.lax.dynamic_index_in_dim(
                        xall, t_in, 0, keepdims=False), s),
                xs, state)
            out = stage_fn(params, inp)
            # the last stage finishes microbatch t-(S-1) at tick t
            j = jnp.clip(t - (S - 1), 0, M - 1)
            valid = (stage == S - 1) & (t >= S - 1)
            outputs = jax.tree.map(
                lambda acc, o: jax.lax.dynamic_update_index_in_dim(
                    acc, jnp.where(
                        valid, o,
                        jax.lax.dynamic_index_in_dim(acc, j, 0, keepdims=False)),
                    j, 0),
                outputs, out)
            if perm:
                state = jax.tree.map(
                    lambda o: jax.lax.ppermute(o, axis, perm), out)
            else:
                state = out
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(M + S - 1))
        # results live on the last stage; broadcast so out_specs can be
        # replicated (masked psum == select-from-last-stage)
        outputs = jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(stage == S - 1, o, jnp.zeros_like(o)), axis),
            outputs)
        return outputs

    return run(stage_params, xs)


def pipeline_transformer_encoder(
    mesh: Mesh,
    params,                         # transformer_encoder_init pytree
    x: jnp.ndarray,                 # [B, T, d]
    key_padding_mask: Optional[jnp.ndarray],  # [B, T] True = padded
    nhead: int,
    n_microbatches: int,
    axis: str = "pipe",
    backend: str = "dense",
    dropout_rate: float = 0.0,
    rng=None,
    train: bool = False,
) -> jnp.ndarray:
    """The temporal transformer (nn/transformer.py) as a layer-per-stage
    pipeline. Numerically identical to transformer_encoder_apply in eval
    mode / at dropout 0; under training dropout each (stage, microbatch)
    derives its own fold_in key — a self-consistent stream that differs
    from the single-device backends' (the usual cross-backend dropout
    convention).
    """
    from raindrop_tpu.nn.transformer import transformer_encoder_layer_apply

    L = len(params)
    if mesh.shape[axis] != L:
        raise ValueError(
            f"need one pipeline stage per layer: mesh '{axis}'="
            f"{mesh.shape[axis]} but encoder has {L} layers")
    B, T, d = x.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    stacked = stack_stage_params([params[f"layer{i}"] for i in range(L)])
    xs = x.reshape(M, B // M, T, d)
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, T), bool)
    ms = key_padding_mask.reshape(M, B // M, T)
    drop = train and rng is not None and dropout_rate > 0.0
    # per-microbatch keys ride the pipeline as a data leaf (shard_map
    # closures cannot capture traced values); stages fold in their index
    keys = (jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(M))
            if drop else jnp.zeros((M, 2), jnp.uint32))

    def stage_fn(p, inp):
        h, m, key = inp
        rngs = None
        if drop:
            stage_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            rngs = jax.random.split(stage_key, 4)
        h = transformer_encoder_layer_apply(
            p, h, m, nhead, dropout_rate, rngs, drop, backend=backend)
        return (h, m, key)

    out, _, _ = pipeline_apply(mesh, stage_fn, stacked, (xs, ms, keys),
                               axis=axis)
    return out.reshape(B, T, d)
