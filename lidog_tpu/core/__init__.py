from lidog_tpu.core.sparse import SparseTensor  # noqa: F401
