classdef Net < handle
  % caffe.Net - same surface as reference matlab/+caffe/Net.m, delegating to
  % caffe_rtpose_tpu.api.Net through MATLAB's Python engine.
  %
  %   net = caffe.Net(model_file, phase)
  %   net = caffe.Net(model_file, weights_file, phase)
  %
  % Blob data uses matcaffe's W x H x C x N layout with BGR channels; the
  % bridge permutes to/from the runtime's N x C x H x W.

  properties (Access = private)
    pynet
  end
  properties (SetAccess = private)
    inputs
    outputs
  end

  methods
    function self = Net(model_file, arg2, arg3)
      if nargin == 2
        phase = arg2; weights = '';
      else
        weights = arg2; phase = arg3;
      end
      api = py.importlib.import_module('caffe_rtpose_tpu.api');
      if isempty(weights)
        self.pynet = api.Net(model_file, upper(phase));
      else
        self.pynet = api.Net(model_file, weights, upper(phase));
      end
      self.inputs = cellfun(@char, cell(self.pynet.inputs), 'UniformOutput', false);
      self.outputs = cellfun(@char, cell(self.pynet.outputs), 'UniformOutput', false);
    end

    function res = forward(self, input_data)
      % input_data: cell array of W x H x C x N arrays, one per input blob
      kw = py.dict();
      for i = 1:numel(self.inputs)
        nd = double(py.len(self.pynet.blobs{self.inputs{i}}.shape));
        kw{self.inputs{i}} = caffe.private.mat2py(input_data{i}, nd);
      end
      out = self.pynet.forward_dict(kw);
      res = cell(1, numel(self.outputs));
      for i = 1:numel(self.outputs)
        res{i} = caffe.private.py2mat(out{self.outputs{i}});
      end
    end

    function res = forward_prefilled(self)
      out = self.pynet.forward();
      res = cell(1, numel(self.outputs));
      for i = 1:numel(self.outputs)
        res{i} = caffe.private.py2mat(out{self.outputs{i}});
      end
    end

    function data = blob_data(self, name)
      data = caffe.private.py2mat(self.pynet.blobs{name}.data);
    end

    function b = blob(self, name)
      b = caffe.Blob(self.pynet.blobs{name});
    end

    function l = layer(self, name)
      names = cellfun(@char, cell(py.getattr(self.pynet, '_layer_names')), ...
                      'UniformOutput', false);
      idx = find(strcmp(names, name), 1);
      assert(~isempty(idx), ['unknown layer ' name]);
      l = caffe.Layer(self.pynet.layers{int32(idx)});
    end

    function copy_from(self, weights_file)
      self.pynet.copy_from(weights_file);
    end

    function save(self, path)
      self.pynet.save(path);
    end

    function reshape(self)
      % shapes are static under XLA; kept for API compatibility
    end
  end
end
