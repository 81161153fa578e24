from raindrop_tpu.models.raindrop import raindrop_init, raindrop_apply  # noqa: F401
