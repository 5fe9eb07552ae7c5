classdef io
  % caffe.io - image / mean loading and saving (reference matlab/+caffe/io.m).
  methods (Static)
    function im_data = load_image(file)
      api = py.importlib.import_module('caffe_rtpose_tpu.api');
      np_img = api.load_image(file);           % H x W x C RGB [0,1]
      im = single(np_img);
      im = im(:, :, [3 2 1]);                  % RGB -> BGR
      im_data = permute(im, [2 1 3]) * 255;    % -> W x H x C, [0,255]
    end

    function mean_data = read_mean(file)
      dl = py.importlib.import_module('caffe_rtpose_tpu.core.data_layers');
      m = single(dl.read_mean_binaryproto(file));  % C x H x W
      mean_data = permute(m, [3 2 1]);             % W x H x C
    end

    function write_mean(mean_data, file)
      % mean_data: W x H x C single (matcaffe layout) -> .binaryproto
      caffe.private.CHECK(isnumeric(mean_data), 'mean_data must be numeric');
      dl = py.importlib.import_module('caffe_rtpose_tpu.core.data_layers');
      % mat2py reverses dims: W x H x C matlab -> (C, H, W) numpy, the
      % exact inverse of read_mean's single()+permute
      dl.write_mean_binaryproto(file, caffe.private.mat2py(single(mean_data), 3));
    end
  end
end
