"""forest-tpu: TPU-native geospatial representation learning framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the FoR-EST
reference (nnnagle/vq-vae): a Zarr-cube data pipeline, a mixed-input VQ-VAE
with a Pallas-fused vector-quantization core, and a dual-pathway contrastive
representation learner (z_type / z_phase), designed TPU-first:

- compute path: jit-compiled XLA graphs, bf16-friendly, Pallas kernels for the
  VQ hot core, data-parallel via ``jax.sharding.Mesh`` + ``shard_map`` with
  codebook EMA statistics psum'd across replicas;
- host path: a threaded Zarr chunk prefetcher (ctypes -> libblosc, optional C++
  decode ring) that only decodes and slices -- all per-pixel math (whitening,
  normalization, feature assembly) lives in the XLA graph.

Layout (mirrors SURVEY.md §2's component inventory):
  ops/       Pallas + XLA kernels (VQ quantize/EMA, segment ops, whitening, kNN)
  models/    Flax modules (VQVAE, RepresentationModel, TCN, FiLM, heads)
  losses/    pure-function losses (InfoNCE, VICReg, phase family, EVT, recon)
  data/      zarr-lite IO, checkerboard split, samplers, schema, feature builder
  training/  train loops, schedulers, annealers, checkpointing, curricula
  parallel/  mesh construction + data-parallel step builders
  eval/      codebook export, location embedding, linear probes, GMM tools
"""

__version__ = "0.1.0"
