classdef Blob < handle
  % caffe.Blob - reference matlab/+caffe/Blob.m surface over an
  % api._Blob facade (delegates through the Python engine).  Data uses
  % matcaffe's W x H x C x N layout; the bridge permutes to/from the
  % runtime's caffe N x C x H x W.

  properties (Access = private)
    pyblob
  end

  methods
    function self = Blob(pyblob)
      self.pyblob = pyblob;
    end

    function s = shape(self)
      s = double(py.array.array('q', self.pyblob.shape));
      s = fliplr(s);  % caffe N-C-H-W -> matcaffe W-H-C-N
    end

    function reshape(self, shape)
      % matcaffe shape (W-H-C-N row vector) -> caffe N-C-H-W
      caffe.private.CHECK(isnumeric(shape), 'shape must be numeric');
      self.pyblob.reshape_dims(fliplr(double(shape)));
    end

    function data = get_data(self)
      data = caffe.private.py2mat(self.pyblob.data);
    end

    function set_data(self, data)
      caffe.private.CHECK(isnumeric(data), 'data must be numeric');
      nd = double(py.len(self.pyblob.shape));
      self.pyblob.data = caffe.private.mat2py(single(data), nd);
    end

    function diff = get_diff(self)
      diff = caffe.private.py2mat(self.pyblob.diff);
    end

    function set_diff(self, diff)
      caffe.private.CHECK(isnumeric(diff), 'diff must be numeric');
      nd = double(py.len(self.pyblob.shape));
      self.pyblob.diff = caffe.private.mat2py(single(diff), nd);
    end
  end
end
