from lidog_tpu.models.minkunet import MinkUNet34  # noqa: F401
