"""SalUn-TPU: a TPU-native machine-unlearning framework.

Re-implements the capabilities of OPTML-Group/Unlearn-Saliency (SalUn,
ICLR'24) as a single JAX/XLA/pjit/Pallas framework:

- ``salun.core``      — the SalUn algorithm over parameter pytrees
                        (saliency masks, masked optimizers, 17 unlearning
                        methods) shared by every workload.
- ``salun.models``    — flax image classifiers (ResNet/VGG families).
- ``salun.diffusion`` — DDPM schedules/losses/samplers + CFG U-Net.
- ``salun.sd``        — Stable-Diffusion (latent diffusion) stack.
- ``salun.data``      — self-contained dataset pipelines w/ forget/retain
                        splitting.
- ``salun.evalx``     — accuracy, MIA, FID/IS, classifier evals.
- ``salun.dist``      — device-mesh sharding + distributed top-k.
- ``salun.kernels``   — Pallas TPU kernels for the hot ops.
- ``salun.ckpt``      — orbax store + torch-checkpoint importers.

Unlike the reference (three copy-pasted PyTorch pipelines), the algorithm
layer here is written once over pytrees and jit-compiled per workload.
"""

__version__ = "0.1.0"
