"""odise_tpu: TPU-native open-vocabulary panoptic segmentation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of NVlabs/ODISE
(reference mounted at /root/reference): a frozen Stable Diffusion UNet used as
a one-step feature extractor, a Mask2Former-style mask generator, and CLIP
text-embedding classification over arbitrary vocabularies.
"""

__version__ = "0.1.0"
