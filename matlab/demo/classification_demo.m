function [scores, maxlabel] = classification_demo(im, use_gpu)
% [scores, maxlabel] = classification_demo(im, use_gpu)
%
% ILSVRC image classification through matcaffe with BVLC CaffeNet —
% the reference matlab/demo/classification_demo.m surface (same name,
% arguments, outputs and crop protocol; body rewritten for the tpu port,
% where the net executes via caffe_rtpose_tpu.api instead of the MEX).
%
% input
%   im       color image as uint8 HxWx3 (RGB, as MATLAB's imread returns)
%   use_gpu  1 to run on the accelerator, 0 for CPU
%
% output
%   scores   1000-dim ILSVRC score vector (mean over 10 crops)
%   maxlabel index of the top-scoring class
%
% Layout conventions bridged here (same pitfalls as upstream matcaffe):
%   caffe memory is row-major N x C x H x W with BGR channels; MATLAB is
%   column-major, so blobs are handed over as W x H x C x N with the
%   channel order already flipped to BGR and the ImageNet mean subtracted.
%
% Run from caffe/matlab/demo.  Weights must be fetched from the Model Zoo
% into models/bvlc_reference_caffenet/ first.

% make the +caffe package reachable, as when run from matlab/demo
if exist('../+caffe', 'dir')
  addpath('..');
else
  error('Please run this demo from caffe/matlab/demo');
end

% device selection
if exist('use_gpu', 'var') && use_gpu
  caffe.set_mode_gpu();
  gpu_id = 0;  % first device
  caffe.set_device(gpu_id);
else
  caffe.set_mode_cpu();
end

% CaffeNet in deploy form; phase test keeps dropout out of the path
model_dir = '../../models/bvlc_reference_caffenet/';
net_model = [model_dir 'deploy.prototxt'];
net_weights = [model_dir 'bvlc_reference_caffenet.caffemodel'];
phase = 'test';
if ~exist(net_weights, 'file')
  error('Please download CaffeNet from Model Zoo before you run this demo');
end

net = caffe.Net(net_model, net_weights, phase);

if nargin < 1
  fprintf('using caffe/examples/images/cat.jpg as input image\n');
  im = imread('../../examples/images/cat.jpg');
end

% 10-crop oversampling -> W x H x C x 10 input blob
tic;
input_data = {prepare_image(im)};
toc;

% one forward pass; forward() takes/returns cell arrays of blob data
tic;
scores = net.forward(input_data);
toc;

scores = scores{1};
scores = mean(scores, 2);  % average the 10 crop predictions

[~, maxlabel] = max(scores);

caffe.reset_all();

% ------------------------------------------------------------------------
function crops_data = prepare_image(im)
% ------------------------------------------------------------------------
% RGB HxWx3 uint8 -> the W x H x C x 10 single blob CaffeNet expects:
% BGR, transposed, mean-subtracted, then oversampled as the 4 corner
% crops + center crop and their horizontal mirrors.
d = load('../+caffe/imagenet/ilsvrc_2012_mean.mat');
mean_data = d.mean_data;  % already W x H x C, BGR
IMAGE_DIM = 256;
CROPPED_DIM = 227;

im_data = im(:, :, [3, 2, 1]);              % RGB -> BGR
im_data = permute(im_data, [2, 1, 3]);      % HxW -> WxH (width fastest)
im_data = single(im_data);
im_data = imresize(im_data, [IMAGE_DIM IMAGE_DIM], 'bilinear');
im_data = im_data - mean_data;

crops_data = zeros(CROPPED_DIM, CROPPED_DIM, 3, 10, 'single');
indices = [0 IMAGE_DIM-CROPPED_DIM] + 1;
n = 1;
for i = indices
  for j = indices
    crops_data(:, :, :, n) = im_data(i:i+CROPPED_DIM-1, j:j+CROPPED_DIM-1, :);
    crops_data(:, :, :, n+5) = crops_data(end:-1:1, :, :, n);  % mirror
    n = n + 1;
  end
end
center = floor(indices(2) / 2) + 1;
crops_data(:,:,:,5) = ...
  im_data(center:center+CROPPED_DIM-1,center:center+CROPPED_DIM-1,:);
crops_data(:,:,:,10) = crops_data(end:-1:1, :, :, 5);
