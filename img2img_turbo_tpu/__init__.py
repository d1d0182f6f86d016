"""img2img-turbo-tpu: a TPU-native (JAX/XLA/Pallas) one-step image translation framework.

Re-implements the full capability surface of GaParmar/img2img-turbo (one-step
SD-Turbo-based pix2pix-turbo and CycleGAN-Turbo generators, LoRA adaptation,
adversarial training, eval metrics) as an idiomatic JAX framework:

- explicit functional dataflow (no monkey-patched forwards: the VAE encoder
  *returns* its skip activations, the decoder *takes* them as arguments),
- NHWC layouts, bf16 compute on the MXU, fp32 master params,
- LoRA as a parameter-tree transformation (merged for serving, factored +
  runtime-scaled for the stochastic path and training),
- Pallas flash attention for the UNet hot loop,
- pjit/shard_map data/tensor parallelism over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
