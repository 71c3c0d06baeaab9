from pytorch_generative_tpu.models.vae import (  # noqa: F401
    beta_vae,
    vae,
    vaes,
    vd_vae,
    vq_vae,
    vq_vae_2,
)
