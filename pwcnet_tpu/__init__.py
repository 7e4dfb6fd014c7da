"""pwcnet_tpu — a TPU-native dense optical-flow engine.

A brand-new JAX/XLA/Pallas implementation of the PWC-Net pipeline
(feature pyramid, per-level backward warping, local cost-volume
correlation, coarse-to-fine estimators, dilated context refinement),
designed TPU-first:

- channels-last (NHWC) layouts everywhere, bf16 compute / f32 accumulation
- the whole coarse-to-fine forward is ONE jitted XLA computation
- the correlation (cost-volume) layer is a hand-written Pallas kernel with a
  custom VJP (replacing the reference's CUDA ``correlation_package``;
  see reference ``correlation_package/correlation_cuda_kernel.cu``)
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding, gradient
  ``psum`` over ICI; spatial (H) sharding with ring halo exchange for
  full-resolution inference
- Orbax checkpointing of the full train state; on-device augmentation.

Reference capability map: daigo0927/PWC-Net_pytorch (see SURVEY.md).
"""

__version__ = "0.1.0"

from pwcnet_tpu import io  # noqa: F401
