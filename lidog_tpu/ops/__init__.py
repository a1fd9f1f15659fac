from lidog_tpu.ops.sparse_conv import sparse_conv  # noqa: F401
