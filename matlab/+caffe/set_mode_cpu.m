function set_mode_cpu()
  % Pin JAX to the CPU backend (reference caffe.set_mode_cpu).
  py.jax.config.update('jax_platforms', 'cpu');
end
