function results = run_tests()
% results = run_tests()
%   Smoke the matcaffe bridge end-to-end (reference
%   matlab/+caffe/run_tests.m runs +test/*; here the Python test suite
%   tests/test_matlab_surface.py is the source of truth — this entry
%   exercises the live MATLAB->Python path).

caffe.set_mode_cpu();
fprintf('caffe version %s\n', caffe.version());

model = tempname;
fid = fopen(model, 'w');
fprintf(fid, ['name: "m"\ninput: "x"\n' ...
  'input_shape { dim: 1 dim: 2 dim: 4 dim: 4 }\n' ...
  'layer { name: "c" type: "Convolution" bottom: "x" top: "y"\n' ...
  '  convolution_param { num_output: 3 kernel_size: 3 pad: 1 } }\n']);
fclose(fid);

net = caffe.get_net(model, 'test');
out = net.forward({single(rand(4, 4, 2, 1))});
assert(isequal(size(out{1}), [4 4 3]) || isequal(size(out{1}), [4 4 3 1]));
delete(model);
results = 'matcaffe bridge OK';
fprintf('%s\n', results);

end
