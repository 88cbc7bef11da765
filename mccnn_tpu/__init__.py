"""mccnn_tpu — a TPU-native framework for deep learning on non-uniformly
sampled point clouds, with the capabilities of viscom-ulm/MCCNN (Monte Carlo
convolutions, Hermosilla et al., SIGGRAPH Asia 2018), built from scratch on
JAX/XLA/Pallas. See SURVEY.md for the reference analysis."""

__version__ = "0.1.0"
