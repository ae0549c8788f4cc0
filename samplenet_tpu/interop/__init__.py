"""Interop: import/export reference (torch) checkpoints.

Lets a user of the reference repo (itailang/SampleNet) bring trained
weights into this framework — and take ours back — without retraining.
See `torch_import` for the registration-track torch surface
(SP-PCRNet `model_best.pth` files, registration/main.py:196-218).
"""

from samplenet_tpu.interop.torch_import import (  # noqa: F401
    infer_samplenet_config,
    load_torch_checkpoint,
    pcrnet_from_torch,
    pcrnet_to_torch,
    samplenet_from_torch,
    samplenet_to_torch,
    sp_pcrnet_from_torch,
)
