function set_device(device_id) %#ok<INUSD>
  % Device pinning is handled by jax.device_put placement in the runtime;
  % retained for reference API compatibility (caffe.set_device).
end
