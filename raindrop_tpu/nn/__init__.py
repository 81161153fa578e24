from raindrop_tpu.nn.linear import linear_init, linear_apply, mlp_init, mlp_apply  # noqa: F401
from raindrop_tpu.nn.transformer import (  # noqa: F401
    transformer_encoder_init,
    transformer_encoder_apply,
)
from raindrop_tpu.nn.aggregate import masked_mean_pool, sensor_wise_pool  # noqa: F401
