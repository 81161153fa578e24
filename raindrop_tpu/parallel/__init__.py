from raindrop_tpu.parallel.elastic import (  # noqa: F401
    FaultInjector,
    Heartbeat,
    HeartbeatMonitor,
    SimulatedFailure,
    run_elastic,
)
from raindrop_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    shard_batch_spec,
    shard_batch,
)
