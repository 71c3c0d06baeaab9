"""Model zoo: autoregressive, VAE, flow families + nonparametric estimators.

Re-exports every model class like
/root/reference/pytorch_generative/models/__init__.py:1-25 (plus
GaussianProcess, which the reference forgot to export — SURVEY.md section 2.6).
"""

from pytorch_generative_tpu.models import base  # noqa: F401
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
from pytorch_generative_tpu.models.autoregressive.fvbn import (  # noqa: F401
    FullyVisibleBeliefNetwork,
)
from pytorch_generative_tpu.models.autoregressive.gated_pixel_cnn import (  # noqa: F401
    GatedPixelCNN,
)
from pytorch_generative_tpu.models.autoregressive.image_gpt import (  # noqa: F401
    ImageGPT,
)
from pytorch_generative_tpu.models.autoregressive.image_gpt_moe import (  # noqa: F401
    ImageGPTMoE,
)
from pytorch_generative_tpu.models.autoregressive.made import MADE  # noqa: F401
from pytorch_generative_tpu.models.autoregressive.nade import NADE  # noqa: F401
from pytorch_generative_tpu.models.autoregressive.pixel_cnn import (  # noqa: F401
    PixelCNN,
)
from pytorch_generative_tpu.models.autoregressive.pixel_snail import (  # noqa: F401
    PixelSNAIL,
)
from pytorch_generative_tpu.models.flow import nice  # noqa: F401
from pytorch_generative_tpu.models.flow.nice import NICE  # noqa: F401
from pytorch_generative_tpu.models.gaussian_process import (  # noqa: F401
    GaussianProcess,
)
from pytorch_generative_tpu.models.kde import (  # noqa: F401
    GaussianKernel,
    KernelDensityEstimator,
    ParzenWindowKernel,
)
from pytorch_generative_tpu.models.mixture_models import (  # noqa: F401
    BernoulliMixtureModel,
    GaussianMixtureModel,
)
from pytorch_generative_tpu.models.vae import (  # noqa: F401
    beta_vae,
    vae,
    vaes,
    vd_vae,
    vq_vae,
    vq_vae_2,
)
from pytorch_generative_tpu.models.vae.beta_vae import BetaVAE  # noqa: F401
from pytorch_generative_tpu.models.vae.vae import VAE  # noqa: F401
from pytorch_generative_tpu.models.vae.vd_vae import VeryDeepVAE  # noqa: F401
from pytorch_generative_tpu.models.vae.vq_vae import (  # noqa: F401
    VectorQuantizedVAE,
)
from pytorch_generative_tpu.models.vae.vq_vae_2 import (  # noqa: F401
    VectorQuantizedVAE2,
)

__all__ = [
    "BernoulliMixtureModel",
    "BetaVAE",
    "FullyVisibleBeliefNetwork",
    "GatedPixelCNN",
    "GaussianKernel",
    "GaussianMixtureModel",
    "GaussianProcess",
    "ImageGPT",
    "ImageGPTMoE",
    "KernelDensityEstimator",
    "MADE",
    "NADE",
    "NICE",
    "ParzenWindowKernel",
    "PixelCNN",
    "PixelSNAIL",
    "VAE",
    "VectorQuantizedVAE",
    "VectorQuantizedVAE2",
    "VeryDeepVAE",
]
