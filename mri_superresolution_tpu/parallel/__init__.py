from mri_superresolution_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    zero1_shardings,
)
from mri_superresolution_tpu.parallel.spatial import (  # noqa: F401
    build_spatial_calib_forward_raw,
    build_spatial_forward,
    build_spatial_int8_forward_raw,
    build_spatial_loss,
    make_spatial_mesh,
)
