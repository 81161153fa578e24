from raindrop_tpu.parallel.elastic import (  # noqa: F401
    FaultInjector,
    Heartbeat,
    HeartbeatMonitor,
    SimulatedFailure,
    run_elastic,
)
from raindrop_tpu.parallel.expert import (  # noqa: F401
    moe_ffn_apply,
    moe_ffn_init,
    shard_moe_params,
)
from raindrop_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    shard_batch_spec,
    shard_batch,
)
from raindrop_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_transformer_encoder,
    stack_stage_params,
)
