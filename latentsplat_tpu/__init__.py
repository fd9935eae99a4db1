"""latentsplat_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of latentSplat (ECCV 2024, reference: Chrixtar/latentsplat).

Given posed context images of a scene, an epipolar-transformer encoder emits
per-pixel variational 3D Gaussians (color SH + variational feature SH); a
differentiable tile rasterizer splats them to target views (color, latent
features, alpha, depth); a VAE decoder with zero-init skip connections
upsamples the sampled latent map to the final image. Training is a VAE-GAN.

Design notes (TPU-first, not a port):
  * All compute-path code is pure-functional JAX; models are flax.linen.
  * The rasterizer is a Pallas TPU kernel (tile binning in XLA, per-tile
    front-to-back compositing on MXU/VPU with a custom VJP), with a dense
    jnp oracle for testing (`ops.rasterize.dense`).
  * Batch/view parallelism is expressed with jax.sharding over a Mesh; the
    reference's DDP (src/main.py:93-105) becomes batch sharding + XLA
    collectives.
  * Step-gated losses (reference src/loss/loss.py:44-56) become static-graph
    masks so the pjit'd train step compiles once.
"""

__version__ = "0.1.0"
