classdef test_io < matlab.unittest.TestCase
  % Clean-room port of the reference matcaffe io test
  % (matlab/+caffe/+test/test_io.m there): write_mean/read_mean round-trip.
  methods (Test)
    function test_read_write_mean(self)
      width = 20;
      height = 30;
      channels = 3;
      mean_data_write = 255 * rand(width, height, channels);
      mean_data_write = single(mean_data_write);
      mean_proto_file = tempname();
      caffe.io.write_mean(mean_data_write, mean_proto_file);
      mean_data_read = caffe.io.read_mean(mean_proto_file);
      self.verifyEqual(mean_data_write, mean_data_read);
      delete(mean_proto_file);
    end
  end
end
