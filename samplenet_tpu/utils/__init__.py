from samplenet_tpu.utils.logging import Logger  # noqa: F401
