"""caffe_rtpose_tpu — a TPU-native realtime multi-person pose framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CMU-Perceptual-Computing-Lab/caffe_rtpose (Caffe fork + CPM/PAF realtime
pose demo): prototxt/caffemodel interop, a jit-compiled graph runtime in
place of Caffe's Net, fused ImResize/NMS post-processing, PAF limb assembly,
the realtime frame pipeline, and pjit-based multi-chip training/inference.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """Cache compiled XLA executables across processes (big win when the
    backend is a remote TPU where a cold VGG19+postproc compile takes
    minutes).  Safe no-op if jax is too old or the dir is unwritable."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "CRT_JAX_CACHE", os.path.expanduser("~/.cache/caffe_rtpose_tpu_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # only cache expensive programs: tiny CPU executables reload with
        # noisy machine-feature warnings and save nothing
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_enable_persistent_compilation_cache()
