"""mri_superresolution_tpu — TPU-native MRI super-resolution framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of the
rdd0582/mri_superresolution reference (PyTorch/NumPy/OpenCV), designed
TPU-first:

- All compute-path ops (resize, normalization, k-space low-field simulation,
  SSIM, losses, augmentation) are pure jittable ``jnp`` functions.
- Resampling is expressed as two matrix multiplies (separable row/column
  weight matrices) so it lowers onto the MXU instead of gathers.
- The U-Net runs NHWC in bfloat16 with fp32 master parameters.
- Training and batched inference are data-parallel over a
  ``jax.sharding.Mesh`` via ``jax.jit`` + ``NamedSharding``.

Reference parity targets are cited per-module as ``file:line`` into the
reference tree (see SURVEY.md).
"""

__version__ = "0.1.0"

from mri_superresolution_tpu import config  # noqa: F401
