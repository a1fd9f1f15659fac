from lidog_tpu.data.collate import collate_padded  # noqa: F401
from lidog_tpu.data.synthetic import SyntheticLidarDataset  # noqa: F401
