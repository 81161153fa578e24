"""Baseline model families (reference code/baselines/, SURVEY.md §2.3).

Every baseline exposes (init_fn, apply_fn) with the Trainer's pluggable
interface: apply(params, src, static, times, lengths, train, rng) ->
(logits, aux) — so all of them reuse the same data pipeline, balanced
sampler, metrics, and 5-split protocol as the flagship model.
"""

from raindrop_tpu.baselines.transformer import (  # noqa: F401
    transformer2_init,
    transformer2_apply,
)
from raindrop_tpu.baselines.seft import seft_init, seft_apply  # noqa: F401
from raindrop_tpu.baselines.grud import grud_init, grud_apply  # noqa: F401
from raindrop_tpu.baselines.mtand import mtand_init, mtand_apply  # noqa: F401
from raindrop_tpu.baselines.mtgnn import mtgnn_init, mtgnn_apply  # noqa: F401
from raindrop_tpu.baselines.dgm2 import dgm2_init, dgm2_apply  # noqa: F401
from raindrop_tpu.baselines.ipnet import (  # noqa: F401
    ipnet_init,
    ipnet_apply,
    ipnet_reconstruction_loss,
)
