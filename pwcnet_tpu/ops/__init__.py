from pwcnet_tpu.ops.warp import warp_bilinear  # noqa: F401
from pwcnet_tpu.ops.cost_volume import cost_volume, cost_volume_lax  # noqa: F401
from pwcnet_tpu.ops.pallas.warp_corr_kernel import warp_corr_fused  # noqa: F401
