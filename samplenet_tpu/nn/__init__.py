from samplenet_tpu.nn.layers import PointMLP, MLPHead, mlp_stack  # noqa: F401
