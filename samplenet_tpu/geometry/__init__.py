from samplenet_tpu.geometry.quaternion import (  # noqa: F401
    qmul,
    qrot,
    qinv,
    qeuler,
    qfix,
    expmap_to_quaternion,
    euler_to_quaternion,
    quaternion_to_rotation_matrix,
)
from samplenet_tpu.geometry.transforms import (  # noqa: F401
    QuaternionTransform,
    create_random_transform,
    deg_to_rad,
    rad_to_deg,
)
