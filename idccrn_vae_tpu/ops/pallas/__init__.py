"""Pallas TPU kernels for the hot ops."""

from idccrn_vae_tpu.ops.pallas.lstm_kernel import (  # noqa: F401
    stacked_lstm_layer,
    pallas_lstm_available,
)
