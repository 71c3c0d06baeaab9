from pytorch_generative_tpu.models.flow import nice  # noqa: F401
