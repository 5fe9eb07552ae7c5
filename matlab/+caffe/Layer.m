classdef Layer < handle
  % caffe.Layer - reference matlab/+caffe/Layer.m surface: access a
  % layer's param blobs and type (delegates through the Python engine).

  properties (Access = private)
    pylayer
  end
  properties (SetAccess = private)
    params
  end

  methods
    function self = Layer(pylayer)
      self.pylayer = pylayer;
      n = double(py.len(self.pylayer.blobs));
      self.params = caffe.Blob.empty();
      for i = 1:n
        self.params(i) = caffe.Blob(self.pylayer.blobs{i});
      end
    end

    function t = type(self)
      t = char(self.pylayer.type);
    end
  end
end
