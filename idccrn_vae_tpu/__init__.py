"""I-DCCRN-VAE-TPU: TPU-native complex-spectrogram speech-enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
iris1997jiatong/I-DCCRN-VAE reference (complex-valued DCCRN VAEs for
speech enhancement): CVAE/NVAE pretraining, NSVAE posterior matching,
phase-2 decoder fine-tuning (classical + adversarial), supervised DCCRN
baseline, batched enhancement + metrics.

Design stance (vs the PyTorch reference):
  * One configurable encoder/decoder family spans the reference's ~18
    near-duplicate nn.Module classes (skip modes, latent heads, channel
    modes are flags on a frozen config).
  * Complex tensors are packed channel-last as ``(..., 2*C)`` with the
    first C lanes real and the last C lanes imaginary ("cpack" layout),
    so convs/matmuls land on the MXU with wide lane dimensions instead
    of a trailing dim of size 2.
  * Every mathematical object (complex Gaussian log-prob, closed-form
    KL, SI-SNR, reconstruction losses) is implemented exactly once.
  * Training scales with a 1-D data-parallel `jax.sharding.Mesh`;
    everything compiles under `jit` with static shapes.
"""

__version__ = "0.1.0"
