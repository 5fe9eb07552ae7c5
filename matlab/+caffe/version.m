function v = version()
  pkg = py.importlib.import_module('caffe_rtpose_tpu');
  v = char(pkg.("__version__"));
end
