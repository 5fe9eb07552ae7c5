"""caffe_rtpose_tpu — a TPU-native realtime multi-person pose framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CMU-Perceptual-Computing-Lab/caffe_rtpose (Caffe fork + CPM/PAF realtime
pose demo): prototxt/caffemodel interop, a jit-compiled graph runtime in
place of Caffe's Net, fused ImResize/NMS post-processing, PAF limb assembly,
the realtime frame pipeline, and pjit-based multi-chip training/inference.
"""

__version__ = "0.1.0"
