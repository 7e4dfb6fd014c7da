from pwcnet_tpu.models.pwcnet import (  # noqa: F401
    PWCNet,
    FeaturePyramidExtractor,
    OpticalFlowEstimator,
    ContextNetwork,
    upsample2x,
    resize_to,
)
