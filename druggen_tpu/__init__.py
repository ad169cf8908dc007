"""druggen_tpu — a TPU-native molecular-graph GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HUBioDataLab/DrugGEN (graph-transformer WGAN-GP for de novo drug design):

- ``druggen_tpu.chem``     — self-contained chemistry runtime (SMILES codec,
  valence model, fingerprints, descriptors).  Replaces the reference's RDKit
  dependency (reference ``src/data/dataset.py:13``) with our own kernel; an
  optional C++ fast path lives in ``druggen_tpu/native``.
- ``druggen_tpu.data``     — dense fixed-shape dataset pipeline (replaces the
  PyG sparse Data/collate detour of reference ``src/data/dataset.py:280-317``).
- ``druggen_tpu.models``   — flax graph-transformer Generator/Discriminator
  (reference ``src/model/models.py``), with the exact edge-modulated
  attention math of ``src/model/layers.py:108-137``.
- ``druggen_tpu.ops``      — XLA + Pallas kernels for the hot ops.
- ``druggen_tpu.train``    — single-jit WGAN-GP train step (double-backward
  gradient penalty), optimizers, checkpointing, logging.
- ``druggen_tpu.infer``    — generator sampling loop + metric report
  (reference ``inference.py``), SMILES corrector.
- ``druggen_tpu.metrics``  — MOSES-style molecular metrics (validity,
  uniqueness, novelty, SNN/IntDiv Tanimoto matmuls, Fréchet distance).
- ``druggen_tpu.parallel`` — device-mesh sharding (DP / edge-partitioned
  paths) via ``jax.sharding`` + ``shard_map``.
"""

__version__ = "0.1.0"
