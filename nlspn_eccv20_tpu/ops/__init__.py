"""TPU-native op library for NLSPN.

Public surface:
  * affinity:  normalize_affinity, insert_center_affinity, insert_center_offset
  * propagate: propagate_local, propagate_deformable, propagate_step
  * pallas:    fused TPU kernels behind the same signatures
"""

from nlspn_eccv20_tpu.ops.affinity import (  # noqa: F401
    normalize_affinity,
    insert_center_affinity,
    insert_center_offset,
)
from nlspn_eccv20_tpu.ops.propagate import (  # noqa: F401
    propagate_local,
    propagate_local_planar,
    propagate_deformable,
    propagate_step,
)
from nlspn_eccv20_tpu.ops.deform_conv import (  # noqa: F401
    deform_conv,
    deformable_im2col,
    modulated_deform_conv,
)
from nlspn_eccv20_tpu.ops.deform_psroi_pooling import (  # noqa: F401
    deform_psroi_pooling,
)
from nlspn_eccv20_tpu.ops.modules import (  # noqa: F401
    DeformConv,
    DeformConvPack,
    DeformRoIPooling,
    DeformRoIPoolingPack,
    ModulatedDeformConv,
    ModulatedDeformConvPack,
)
