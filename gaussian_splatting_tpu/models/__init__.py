from gaussian_splatting_tpu.models.gaussians import (  # noqa: F401
    GaussianParams,
    GaussianAux,
    GaussianModel,
    create_from_pcd,
)
