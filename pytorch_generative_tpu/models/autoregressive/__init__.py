from pytorch_generative_tpu.models.autoregressive import (  # noqa: F401
    fvbn,
    gated_pixel_cnn,
    image_gpt,
    made,
    nade,
    pixel_cnn,
    pixel_snail,
)
