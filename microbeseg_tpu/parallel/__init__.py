from microbeseg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    pad_batch_to_devices,
    replicated_sharding,
)
