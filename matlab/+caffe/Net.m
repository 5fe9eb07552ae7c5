classdef Net < handle
  % caffe.Net - the reference matcaffe Net surface (matlab/+caffe/Net.m
  % there), delegating to caffe_rtpose_tpu.api.Net through the Python
  % engine instead of the caffe_ MEX.
  %
  %   net = caffe.Net(model_file, phase)
  %   net = caffe.Net(model_file, weights_file, phase)
  %   net = caffe.Net(py_api_net)        % facade over an existing api.Net
  %                                      % (the Solver exposes its nets so)
  %
  % Blob data uses matcaffe's W x H x C x N layout with BGR channels; the
  % bridge permutes to/from the runtime's N x C x H x W.

  properties (Access = private)
    pynet
  end
  properties (SetAccess = private)
    layer_vec
    blob_vec
    inputs
    outputs
    name2layer_index
    name2blob_index
    layer_names
    blob_names
  end

  methods
    function self = Net(model_file, arg2, arg3)
      if nargin == 1 && ~ischar(model_file)
        % construct from an existing python api.Net (handle-path analog)
        self.pynet = model_file;
      else
        api = py.importlib.import_module('caffe_rtpose_tpu.api');
        if nargin == 2
          phase = arg2; weights = '';
        else
          weights = arg2; phase = arg3;
        end
        if isempty(weights)
          self.pynet = api.Net(model_file, upper(phase));
        else
          self.pynet = api.Net(model_file, weights, upper(phase));
        end
      end

      % layer_vec / blob_vec over ALL layers and blobs, in net order
      self.layer_names = cellfun(@char, ...
        cell(py.list(py.getattr(self.pynet, '_layer_names'))), ...
        'UniformOutput', false);
      self.blob_names = cellfun(@char, ...
        cell(py.list(self.pynet.blobs.keys())), 'UniformOutput', false);

      self.layer_vec = caffe.Layer.empty();
      for n = 1:numel(self.layer_names)
        self.layer_vec(n) = caffe.Layer(self.pynet.layers{int32(n)});
      end
      self.blob_vec = caffe.Blob.empty();
      for n = 1:numel(self.blob_names)
        self.blob_vec(n) = caffe.Blob(self.pynet.blobs{self.blob_names{n}});
      end

      self.inputs = cellfun(@char, cell(py.list(self.pynet.inputs)), ...
        'UniformOutput', false);
      self.outputs = cellfun(@char, cell(py.list(self.pynet.outputs)), ...
        'UniformOutput', false);

      self.name2layer_index = containers.Map(self.layer_names, ...
        1:numel(self.layer_names));
      self.name2blob_index = containers.Map(self.blob_names, ...
        1:numel(self.blob_names));
    end

    function layer = layers(self, layer_name)
      caffe.private.CHECK(ischar(layer_name), 'layer_name must be a string');
      layer = self.layer_vec(self.name2layer_index(layer_name));
    end

    function blob = blobs(self, blob_name)
      caffe.private.CHECK(ischar(blob_name), 'blob_name must be a string');
      blob = self.blob_vec(self.name2blob_index(blob_name));
    end

    function blob = params(self, layer_name, blob_index)
      caffe.private.CHECK(ischar(layer_name), 'layer_name must be a string');
      blob = self.layer_vec(self.name2layer_index(layer_name)).params(blob_index);
    end

    function forward_prefilled(self)
      % forward from current blob contents (inputs read from the facades)
      self.pynet.forward_dict(py.dict());
    end

    function backward_prefilled(self)
      % backward from the diffs currently set on the output blobs
      kw = py.dict();
      for n = 1:numel(self.outputs)
        kw{self.outputs{n}} = self.pynet.blobs{self.outputs{n}}.diff;
      end
      py.getattr(self.pynet, 'backward_dict')(kw);
    end

    function res = forward(self, input_data)
      caffe.private.CHECK(iscell(input_data), 'input_data must be a cell array');
      for n = 1:numel(self.inputs)
        self.blobs(self.inputs{n}).set_data(input_data{n});
      end
      self.forward_prefilled();
      res = cell(1, numel(self.outputs));
      for n = 1:numel(self.outputs)
        res{n} = self.blobs(self.outputs{n}).get_data();
      end
    end

    function res = backward(self, output_diff)
      caffe.private.CHECK(iscell(output_diff), 'output_diff must be a cell array');
      for n = 1:numel(self.outputs)
        self.blobs(self.outputs{n}).set_diff(output_diff{n});
      end
      self.backward_prefilled();
      res = cell(1, numel(self.inputs));
      for n = 1:numel(self.inputs)
        res{n} = self.blobs(self.inputs{n}).get_diff();
      end
    end

    function copy_from(self, weights_file)
      caffe.private.CHECK(ischar(weights_file), 'weights_file must be a string');
      caffe.private.CHECK_FILE_EXIST(weights_file);
      self.pynet.copy_from(weights_file);
    end

    function reshape(self)
      self.pynet.reshape();
    end

    function save(self, weights_file)
      caffe.private.CHECK(ischar(weights_file), 'weights_file must be a string');
      self.pynet.save(weights_file);
    end
  end
end
