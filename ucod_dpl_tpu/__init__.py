"""UCOD-DPL TPU — a TPU-native (JAX/XLA/Pallas) framework for unsupervised
camouflaged object detection via dynamic pseudo-label learning (UCOD-DPL,
CVPR 2025) and adaptive pseudo-label learning with dynamic local refinement
(CORAL).

This is a ground-up rebuild of the capabilities of the PyTorch reference
implementation (Heartfirey/UCOD-DPL) designed TPU-first: pure jitted step
functions over explicit state pytrees, Pallas kernels for the attention hot
path, GSPMD sharding over device meshes, and host-side NumPy only where the
algorithm is inherently sequential (connected components, streaming metrics).
"""

__version__ = "0.1.0"
