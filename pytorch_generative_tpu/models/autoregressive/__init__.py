from pytorch_generative_tpu.models.autoregressive import (  # noqa: F401
    fvbn,
    gated_pixel_cnn,
    image_gpt,
    image_gpt_moe,
    made,
    nade,
    pixel_cnn,
    pixel_snail,
)
