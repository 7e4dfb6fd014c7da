from pwcnet_tpu.data.base import (  # noqa: F401
    FlowDataset,
    SampleRecord,
    available_datasets,
    get_dataset,
    read_image,
    register_dataset,
)
import pwcnet_tpu.data.datasets  # noqa: F401  (registers the benchmark datasets)
import pwcnet_tpu.data.synthetic  # noqa: F401  (registers the synthetic dataset)
from pwcnet_tpu.data.augment import AugmentConfig, augment_batch  # noqa: F401
from pwcnet_tpu.data.pipeline import Loader, eval_batches  # noqa: F401
