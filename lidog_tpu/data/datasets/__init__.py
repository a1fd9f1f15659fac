from lidog_tpu.data.datasets.factory import get_dataset  # noqa: F401
