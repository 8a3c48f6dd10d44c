"""FairyGen-TPU: a TPU-native JAX/XLA/Pallas framework for storied cartoon
video generation from a single child-drawn character image.

Rebuilds the capabilities of CloudEngineHub/FairyGen (dual pipeline:
SDXL Style-DoRA + BrushNet stylization, and Wan2.2-TI2V-5B DiT animation)
as an idiomatic JAX stack: functional models over parameter pytrees,
SPMD parallelism via jax.sharding meshes, and Pallas kernels on the hot
paths.

Subpackages
-----------
core        dtype policy, mesh helpers, checkpoint IO, hash registry, imaging
ops         attention / RoPE / norm kernels (Pallas + XLA reference paths)
models      wan (DiT, causal 3D VAE, UMT5) and sdxl (UNet, VAE, CLIP, BrushNet)
diffusion   schedulers (flow-match, DDPM, DPM-Solver++) and training losses
pipelines   inference orchestration (units-as-pure-functions)
parallel    device-mesh shardings, Ulysses sequence parallelism
training    adapter (LoRA/DoRA) finetuning loops, checkpointing
data        composable data-operator DSL + UnifiedDataset
utils       video IO, LoRA merge tools, TeaCache
"""

__version__ = "0.1.0"
