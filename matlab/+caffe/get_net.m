function net = get_net(varargin)
% net = get_net(model_file, phase_name) or
% net = get_net(model_file, weights_file, phase_name)
%   Construct a net from model_file, optionally loading weights
%   (reference matlab/+caffe/get_net.m surface; phase_name is 'train' or
%   'test').

assert(nargin == 2 || nargin == 3, ['usage: ' ...
  'net = get_net(model_file, phase_name) or ' ...
  'net = get_net(model_file, weights_file, phase_name)']);
if nargin == 3
  model_file = varargin{1};
  weights_file = varargin{2};
  phase_name = varargin{3};
else
  model_file = varargin{1};
  phase_name = varargin{2};
end
assert(ischar(model_file), 'model_file must be a string');
assert(ischar(phase_name), 'phase_name must be a string');
assert(exist(model_file, 'file') == 2, 'file does not exist');
assert(strcmp(phase_name, 'train') || strcmp(phase_name, 'test'), ...
  'phase_name can only be ''train'' or ''test''');

if nargin == 3
  assert(ischar(weights_file), 'weights_file must be a string');
  assert(exist(weights_file, 'file') == 2, 'file does not exist');
  net = caffe.Net(model_file, weights_file, phase_name);
else
  net = caffe.Net(model_file, phase_name);
end

end
