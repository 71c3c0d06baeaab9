from pytorch_generative_tpu.utils import checkpoint, metrics  # noqa: F401
