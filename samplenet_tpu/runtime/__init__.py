from samplenet_tpu.runtime.loader import (  # noqa: F401
    NativeLoader,
    native_available,
    load_ply_native,
)
