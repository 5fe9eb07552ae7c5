function [curr_dat_sz, curr_lab_sz] = store2hdf5(filename, data, labels, create, startloc, chunksz)
% Batched writer for caffe-style HDF5 training shards.
% Reimplements the surface of the reference matlab/hdf5creation/store2hdf5.m
% (same name, arguments and on-disk result; body rewritten for the tpu port).
%
%   data    W*H*C*N image stack (normalize beforehand)
%   labels  D*N label matrix (D labels per sample)
%   create  1 = start a fresh file, 0 = append more samples (default 1)
%   startloc struct with .dat / .lab 1-based write offsets; defaulted from
%            the current dataset extent when omitted
%   chunksz HDF5 chunk length along the sample axis in create mode
%
% MATLAB stores column-major, so a W*H*C*N array lands on disk with the
% dimensions reversed — exactly the N x C x H x W record the framework's
% HDF5Data layer consumes (caffe_rtpose_tpu/core/data_layers.py).

  dat_dims = size(data);
  lab_dims = size(labels);
  num_samples = dat_dims(end);
  assert(lab_dims(end) == num_samples, ...
    'Number of samples should be matched between data and labels');

  if ~exist('create', 'var')
    create = true;
  end

  if create
    if ~exist('chunksz', 'var')
      chunksz = 1000;
    end
    if exist(filename, 'file')
      fprintf('Warning: replacing existing file %s \n', filename);
      delete(filename);
    end
    % unbounded sample axis (Inf) so later batches can extend the shard
    h5create(filename, '/data', [dat_dims(1:end-1) Inf], ...
      'Datatype', 'single', 'ChunkSize', [dat_dims(1:end-1) chunksz]);
    h5create(filename, '/label', [lab_dims(1:end-1) Inf], ...
      'Datatype', 'single', 'ChunkSize', [lab_dims(1:end-1) chunksz]);
    if ~exist('startloc', 'var')
      startloc.dat = [ones(1, length(dat_dims) - 1), 1];
      startloc.lab = [ones(1, length(lab_dims) - 1), 1];
    end
  else
    % append: default the write offset to one past the stored extent
    if ~exist('startloc', 'var')
      info = h5info(filename);
      prev_dat_sz = info.Datasets(1).Dataspace.Size;
      prev_lab_sz = info.Datasets(2).Dataspace.Size;
      assert(all(prev_dat_sz(1:end-1) == dat_dims(1:end-1)), ...
        'Data dimensions must match existing dimensions in dataset');
      assert(all(prev_lab_sz(1:end-1) == lab_dims(1:end-1)), ...
        'Label dimensions must match existing dimensions in dataset');
      startloc.dat = [ones(1, length(dat_dims) - 1), prev_dat_sz(end) + 1];
      startloc.lab = [ones(1, length(lab_dims) - 1), prev_lab_sz(end) + 1];
    end
  end

  if ~isempty(data)
    h5write(filename, '/data', single(data), startloc.dat, size(data));
    h5write(filename, '/label', single(labels), startloc.lab, size(labels));
  end

  if nargout
    info = h5info(filename);
    curr_dat_sz = info.Datasets(1).Dataspace.Size;
    curr_lab_sz = info.Datasets(2).Dataspace.Size;
  end
end
