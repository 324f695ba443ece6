"""rlobjectdetection_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch rebuild of the capabilities of jbr97/RLObjectDetection:
  * multi-image-batch Faster R-CNN (VGG-16 / ResNet-101) with RPN + RCNN heads
  * three RoI feature extractors (pool / align / crop) as fixed-shape TPU ops
  * VOC / COCO / ImageNet / Visual Genome data pipelines + evaluation
  * RL bounding-box refinement (56-action action-value network on ΔIoU labels)
  * SPMD data parallelism over a jax.sharding.Mesh (replaces nn.DataParallel)

Everything on the compute path is fixed-shape and jittable; dynamic box sets are
represented as padded arrays + validity masks.
"""

__version__ = "0.1.0"
