"""Loss library: each mathematical object implemented exactly once.

The reference duplicates cal_gaussian_prob / cal_kl_arbi_prior / si_snr /
multiple_recon_loss across >=6 classes (SURVEY.md §2.4); here they live
in complex_gaussian.py / recon.py and the loss classes compose them.
"""

from idccrn_vae_tpu.losses.complex_gaussian import (  # noqa: F401
    complex_gaussian_log_prob,
    complex_kl_divergence,
    standard_prior_like,
)
from idccrn_vae_tpu.losses.recon import (  # noqa: F401
    si_snr_loss,
    multiple_recon_loss,
    prob_recon_loss,
)
from idccrn_vae_tpu.losses.vae_loss import (  # noqa: F401
    kl_annealing_schedule,
    PretrainVaeLoss,
)
from idccrn_vae_tpu.losses.nsvae_loss import NsvaeTrueKlLoss  # noqa: F401
from idccrn_vae_tpu.losses.phase2 import (  # noqa: F401
    TwoPhaseLoss,
    AdversarialPhase2Loss,
    EteTrainSeLoss,
)
