"""exemplar_vae_tpu — a TPU-native JAX/Pallas framework with the capabilities
of sajadn/Exemplar-VAE (NeurIPS 2020, arXiv:2004.04795).

Not a port: the compute path is JAX/XLA/Pallas/pjit designed for TPU
(MXU-shaped pairwise exemplar-prior kernel, mesh-sharded exemplar bank,
jit-fused on-device preprocessing). See SURVEY.md for the behavioral
contract of the reference this rebuilds.

Reference provenance: the read-only reference mount was empty at build time
(SURVEY.md header); citations use ``file.py::symbol [U]`` pointers per the
survey's convention.
"""

__version__ = "0.1.0"

from exemplar_vae_tpu.config import Config  # noqa: F401
