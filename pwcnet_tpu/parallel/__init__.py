from pwcnet_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    SPATIAL_AXIS,
    MeshConfig,
    batch_sharding,
    batch_spatial_sharding,
    initialize_distributed,
    local_batch_size,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from pwcnet_tpu.parallel.halo import (  # noqa: F401
    exchange_halo,
    warp_corr_spatial,
)
from pwcnet_tpu.parallel.spatial import (  # noqa: F401
    pad_for_spatial,
    spatial_forward,
    spatial_image_sharding,
)
