"""porous_cfd_tpu — a TPU-native (JAX/XLA/Pallas) framework for physics-informed
point-cloud surrogates of steady incompressible flow through mixed fluid-porous domains
(Navier-Stokes-Darcy with Darcy-Forchheimer penalization).

Re-designed TPU-first with the capabilities of the reference implementation
(Gallinator/porous-cfd): dataset generation/parsing, PIPN / PIPN++ / PI-GANO /
PI-GANO++ model families, composite PDE-residual + boundary + observation losses,
training/inference/evaluation/comparison pipelines and 2D/3D visualization.

Design stance (vs. the torch reference):
  * pure functions + pytree params (flax.linen modules), jit-compiled epoch scans
  * fused forward-over-reverse derivatives instead of D+D^2 autograd graph replays
  * fixed-shape padded/masked point sets (static shapes for XLA)
  * jax.sharding.Mesh + NamedSharding data/point parallelism over ICI
  * Pallas kernels for neighbor search hot loops
"""

__version__ = "0.1.0"

SEED = 8421  # the reference's global seed (common/training.py:61 et al.)
