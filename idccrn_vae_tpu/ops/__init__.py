"""TPU-first primitive ops for complex-valued spectrogram networks."""

from idccrn_vae_tpu.ops.complex import (  # noqa: F401
    cpack,
    creal,
    cimag,
    csplit,
    pair_to_cpack,
    cpack_to_pair,
)
from idccrn_vae_tpu.ops.stft import stft, istft, hann_window  # noqa: F401
from idccrn_vae_tpu.ops.conv import (  # noqa: F401
    complex_conv2d,
    complex_conv_transpose2d,
    init_complex_conv2d,
    init_complex_conv_transpose2d,
)
from idccrn_vae_tpu.ops.dense import complex_dense, init_complex_dense  # noqa: F401
from idccrn_vae_tpu.ops.lstm import (  # noqa: F401
    lstm,
    complex_lstm,
    init_lstm,
    init_complex_lstm,
)
from idccrn_vae_tpu.ops.batchnorm import (  # noqa: F401
    complex_batch_norm,
    init_cbn_params,
    init_cbn_stats,
)
