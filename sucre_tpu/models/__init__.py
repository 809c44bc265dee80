"""Model families: the SUCRe underwater image-formation model (direct and
closed-form variants, optional artificial-light model)."""

from sucre_tpu.models.sucre import (  # noqa: F401
    SucreParams,
    init_params,
    compute_l_z,
    formation_forward,
    residual_loss,
    closed_form_J,
    restored_image_nan,
)
