classdef test_net < matlab.unittest.TestCase
  % Clean-room port of the reference matcaffe net test coverage
  % (matlab/+caffe/+test/test_net.m there): blob get/set/reshape, layer and
  % param access, forward/backward, inputs/outputs, save + copy_from.
  % The fixture differs: this framework feeds data host-side, so the net
  % takes a declared input instead of poking a DummyData top.

  properties
    num_output
    model_file
    net
  end

  methods (Static)
    function model_file = simple_net_file(num_output)
      model_file = tempname();
      fid = fopen(model_file, 'w');
      fprintf(fid, 'name: "testnet"\ninput: "data"\n');
      fprintf(fid, 'input_shape { dim: 5 dim: 2 dim: 3 dim: 4 }\n');
      fprintf(fid, 'layer { type: "Convolution" name: "conv" bottom: "data" top: "conv"\n');
      fprintf(fid, '  convolution_param { num_output: 11 kernel_size: 2 pad: 3\n');
      fprintf(fid, '    weight_filler { type: "gaussian" std: 1 }\n');
      fprintf(fid, '    bias_filler { type: "constant" value: 2 } } }\n');
      fprintf(fid, 'layer { type: "InnerProduct" name: "ip" bottom: "conv" top: "ip"\n');
      fprintf(fid, '  inner_product_param { num_output: %d\n', num_output);
      fprintf(fid, '    weight_filler { type: "gaussian" std: 2.5 }\n');
      fprintf(fid, '    bias_filler { type: "constant" value: -3 } } }\n');
      fprintf(fid, 'layer { type: "Softmax" name: "prob" bottom: "ip" top: "prob" }\n');
      fclose(fid);
    end
  end

  methods
    function self = test_net()
      self.num_output = 13;
      self.model_file = caffe.test.test_net.simple_net_file(self.num_output);
      self.net = caffe.Net(self.model_file, 'test');
      % also make sure get_net runs
      caffe.get_net(self.model_file, 'test');
      delete(self.model_file);
    end
  end

  methods (Test)
    function test_blob(self)
      self.net.blobs('data').set_data(10 * ones(self.net.blobs('data').shape));
      self.verifyEqual(self.net.blobs('data').get_data(), ...
        10 * ones(self.net.blobs('data').shape, 'single'));
      self.net.blobs('data').set_diff(0 - 2 * ones(self.net.blobs('data').shape));
      self.verifyEqual(self.net.blobs('data').get_diff(), ...
        0 - 2 * ones(self.net.blobs('data').shape, 'single'));
    end

    function test_layer(self)
      % conv weights: matcaffe W x H x C x N = 2 x 2 x 2 x 11
      self.verifyEqual(self.net.params('conv', 1).shape, [2 2 2 11]);
      self.verifyEqual(self.net.layers('conv').params(2).shape, 11);
      self.verifyEqual(self.net.layers('conv').type(), 'Convolution');
    end

    function test_forward_backward(self)
      self.net.blobs('data').set_data(rand(self.net.blobs('data').shape));
      self.net.forward_prefilled();
      prob = self.net.blobs('prob').get_data();
      self.verifyEqual(size(prob), [13 5]);
      self.net.blobs('prob').set_diff(ones(self.net.blobs('prob').shape));
      self.net.backward_prefilled();
      d = self.net.blobs('data').get_diff();
      self.verifyEqual(size(d), [4 3 2 5]);
    end

    function test_inputs_outputs(self)
      self.verifyEqual(self.net.inputs, {'data'});
      self.verifyEqual(self.net.outputs, {'prob'});
    end

    function test_save_and_read(self)
      weights_file = tempname();
      self.net.save(weights_file);
      model_file2 = caffe.test.test_net.simple_net_file(self.num_output);
      net2 = caffe.Net(model_file2, 'test');
      net2.copy_from(weights_file);
      net3 = caffe.Net(model_file2, weights_file, 'test');
      delete(model_file2);
      delete(weights_file);
      for l = 1:numel(self.net.layer_vec)
        for i = 1:numel(self.net.layer_vec(l).params)
          self.verifyEqual(self.net.layer_vec(l).params(i).get_data(), ...
            net2.layer_vec(l).params(i).get_data());
          self.verifyEqual(self.net.layer_vec(l).params(i).get_data(), ...
            net3.layer_vec(l).params(i).get_data());
        end
      end
    end
  end
end
