from stringwars_tpu.parallel.mesh import (  # noqa: F401
    DeviceScope,
    available_chips,
    make_mesh,
    scope_variants,
)
from stringwars_tpu.parallel.sharding import (  # noqa: F401
    shard_bytes,
    shard_tokens,
    replicate,
)
