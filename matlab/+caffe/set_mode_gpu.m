function set_mode_gpu()
  % Accelerator mode: let JAX pick the TPU/accelerator backend.
  py.jax.config.update('jax_platforms', '');
end
