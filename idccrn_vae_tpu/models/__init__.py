"""Model zoo: one configurable DCCRN/VAE family spans the reference's
~18 near-duplicate classes (SURVEY.md §2.3) via flags on a frozen config."""

from idccrn_vae_tpu.models.config import (  # noqa: F401
    StftConfig,
    DccrnConfig,
    encoder_plan,
    decoder_plan,
    bottleneck_dims,
)
from idccrn_vae_tpu.models.reparam import CGauss, reparameterize  # noqa: F401
from idccrn_vae_tpu.models.vae import VaeEncoder, VaeDecoder  # noqa: F401
from idccrn_vae_tpu.models.nsvae import NsvaeEncoder  # noqa: F401
from idccrn_vae_tpu.models.dccrn import SupervisedDccrn  # noqa: F401
from idccrn_vae_tpu.models.discriminator import Discriminator  # noqa: F401
