from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas  # noqa: F401
