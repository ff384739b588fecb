"""Flax model families: mixed-input VQ-VAE and the FRL representation model."""

from forest_tpu.models.vqvae import VQVAE, VQVAEOutput  # noqa: F401
